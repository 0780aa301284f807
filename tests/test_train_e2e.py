"""End-to-end training tests: the full CLI on a tiny corpus over a simulated
2-device mesh — loss decreases, reference-format checkpoints, auto-resume,
and reference-code readability of what we save. Coverage the reference never
had (`SURVEY.md` §4)."""

import json
import os

import numpy as np
import pytest

import jax

from cpc2_tpu import train
from cpc2_tpu.io.torch_ckpt import load_torch_checkpoint


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory, mini_corpus_module):
    ckpt = tmp_path_factory.mktemp("ckpt")
    base = ['--pathDB', str(mini_corpus_module), '--file_extension', '.wav',
            '--pathCheckpoint', str(ckpt),
            '--hiddenEncoder', '32', '--hiddenGar', '32',
            '--nPredicts', '4', '--negativeSamplingExt', '8',
            '--sizeWindow', '4160', '--nGPU', '2', '--batchSizeGPU', '2',
            '--rnnMode', 'linear', '--arMode', 'GRU',
            '--samplingType', 'uniform', '--random_seed', '42',
            '--logging_step', '50', '--save_step', '1']
    train.main(base + ['--nEpoch', '2'])
    return ckpt, base


@pytest.fixture(scope="module")
def mini_corpus_module(tmp_path_factory):
    from cpc2_tpu.data.audio_io import save_wav
    root = tmp_path_factory.mktemp("db")
    rs = np.random.RandomState(0)
    for s, spk in enumerate(['s1', 's2', 's3']):
        d = root / spk / 'c1'
        d.mkdir(parents=True)
        for i in range(3):
            n = 30000 + 1000 * i
            t = np.arange(n) / 16000.0
            x = (0.3 * np.sin(2 * np.pi * (100 + 50 * i + 70 * s) * t)
                 + 0.05 * rs.randn(n)).astype(np.float32)
            save_wav(str(d / f'{spk}-c1-{i:04d}.wav'), x, 16000)
    return root


class TestTrainE2E:

    def test_checkpoint_layout(self, run_dir):
        ckpt, _ = run_dir
        files = sorted(os.listdir(ckpt))
        assert 'checkpoint_0.pt' in files
        assert 'checkpoint_1.pt' in files
        assert 'checkpoint_args.json' in files
        assert 'checkpoint_logs.json' in files

    def test_loss_decreases(self, run_dir):
        ckpt, _ = run_dir
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        losses = [np.mean(x) for x in logs['locLoss_train']]
        assert losses[-1] < losses[0]
        accs = [np.mean(x) for x in logs['locAcc_train']]
        assert accs[-1] > 1.0 / 9.0 * 0.5  # better than nothing

    def test_checkpoint_reference_format(self, run_dir):
        """The .pt must contain the reference's exact dict keys with torch
        tensors under reference state-dict names."""
        ckpt, _ = run_dir
        state = load_torch_checkpoint(str(ckpt / 'checkpoint_1.pt'))
        assert set(state.keys()) == {'gEncoder', 'cpcCriterion', 'optimizer',
                                     'best'}
        ge = state['gEncoder']
        assert 'gEncoder.conv0.weight' in ge
        assert ge['gEncoder.conv0.weight'].shape == (32, 1, 10)
        assert 'gEncoder.batchNorm0.weight' in ge
        assert tuple(ge['gEncoder.batchNorm0.weight'].shape) == (1, 32, 1)
        assert 'gAR.baseNet.weight_ih_l0' in ge
        crit = state['cpcCriterion']
        assert 'wPrediction.predictors.0.weight' in crit

    def test_checkpoint_loads_into_torch_modules(self, run_dir):
        """Strict-load the saved encoder into real torch modules."""
        torch = pytest.importorskip("torch")
        ckpt, _ = run_dir
        state = load_torch_checkpoint(str(ckpt / 'checkpoint_1.pt'))
        from tests.test_parity_torch import build_torch_encoder
        tenc = build_torch_encoder(32)
        enc_sd = {k[len('gEncoder.'):]: v
                  for k, v in state['gEncoder'].items()
                  if k.startswith('gEncoder.')}
        tenc.load_state_dict(enc_sd)
        tgru = torch.nn.GRU(32, 32, batch_first=True)
        gru_sd = {k[len('gAR.baseNet.'):]: v
                  for k, v in state['gEncoder'].items()
                  if k.startswith('gAR.baseNet.')}
        tgru.load_state_dict(gru_sd)

    def test_auto_resume(self, run_dir, capsys):
        ckpt, base = run_dir
        train.main(base + ['--nEpoch', '3'])
        out = capsys.readouterr().out
        assert 'Checkpoint detected' in out
        assert 'Starting epoch 2' in out
        assert 'checkpoint_2.pt' in os.listdir(ckpt)

    def test_roundtrip_through_load_model(self, run_dir):
        """Our own loadModel must rebuild the trained model from the
        checkpoint and produce identical features."""
        from cpc2_tpu import feature_loader as fl
        import jax.numpy as jnp
        ckpt, _ = run_dir
        bundle, hg, he = fl.loadModel([str(ckpt / 'checkpoint_2.pt')])
        assert (hg, he) == (32, 32)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 4160).astype(np.float32))
        c, e, _, _ = bundle.apply(x)
        assert c.shape == (1, 26, 32)
        assert np.isfinite(np.asarray(c)).all()


class TestStepsPerDispatch:
    """--steps_per_dispatch packs n optimizer steps into one program via
    lax.scan; the trajectory must match single-step dispatch to fp-fusion tolerance
    (spd=3 also exercises the tail flush, since the epoch's batch count is
    not a multiple of 3)."""

    def test_multi_dispatch_trajectory_matches_single(
            self, mini_corpus_module, tmp_path_factory):
        import torch

        ckpts = {}
        for spd in (1, 3):
            ckpt = tmp_path_factory.mktemp(f"spd{spd}")
            train.main([
                '--pathDB', str(mini_corpus_module),
                '--file_extension', '.wav', '--pathCheckpoint', str(ckpt),
                '--hiddenEncoder', '32', '--hiddenGar', '32',
                '--nPredicts', '4', '--negativeSamplingExt', '8',
                '--sizeWindow', '4160', '--nGPU', '2', '--batchSizeGPU', '2',
                '--rnnMode', 'linear', '--arMode', 'GRU',
                '--samplingType', 'uniform', '--random_seed', '7',
                '--logging_step', '50', '--save_step', '1', '--nEpoch', '1',
                '--steps_per_dispatch', str(spd)])
            ckpts[spd] = load_torch_checkpoint(str(ckpt / 'checkpoint_0.pt'))

        def flatten(d, prefix=""):
            out = {}
            for k, v in d.items():
                key = f"{prefix}.{k}" if prefix else str(k)
                if isinstance(v, dict):
                    out.update(flatten(v, key))
                elif isinstance(v, torch.Tensor):
                    out[key] = v.numpy()
            return out

        for section in ('gEncoder', 'cpcCriterion'):
            a = flatten(ckpts[1][section])
            b = flatten(ckpts[3][section])
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)


class TestTailBatches:

    def test_every_tail_batch_runs(self, tmp_path, capsys):
        """samespeaker sampling yields ragged per-speaker tail batches (the
        uniform sampler drops tails in the reference too,
        `dataset.py:362`). A speaker with 5 windows at global batch 4
        leaves a 1-window batch — NOT divisible by the 2-device mesh — and
        it must train through the single-device TailRunner program instead
        of being dropped (reference runs every batch,
        `cpc/train.py:145-187`)."""
        from cpc2_tpu.data.audio_io import save_wav
        root = tmp_path / 'db'
        rs = np.random.RandomState(5)
        # Window counts shrink by one whenever the random epoch offset is
        # positive (reference `dataset.py:719-721`): s1 has 6 raw windows
        # -> 5 effective -> batches [4, 1]; s2 has 5 -> 4 -> one exact
        # batch. The 1-window batch is indivisible by the 2-device mesh.
        spec = {'s1': 4160 * 6 + 2500, 's2': 4160 * 5 + 2500,
                's3': 4160 * 6 + 2500}
        for spk, n in spec.items():
            d = root / spk / 'c1'
            d.mkdir(parents=True)
            t = np.arange(n) / 16000.0
            x = (0.3 * np.sin(2 * np.pi * 180 * t)
                 + 0.05 * rs.randn(n)).astype(np.float32)
            save_wav(str(d / f'{spk}-0.wav'), x, 16000)
        train_list = tmp_path / 'train.txt'
        val_list = tmp_path / 'val.txt'
        train_list.write_text('s1-0\ns2-0\n')
        val_list.write_text('s3-0\n')
        ckpt = tmp_path / 'ck'
        train.main(['--pathDB', str(root), '--file_extension', '.wav',
                    '--pathTrain', str(train_list),
                    '--pathVal', str(val_list),
                    '--pathCheckpoint', str(ckpt),
                    '--hiddenEncoder', '16', '--hiddenGar', '16',
                    '--nPredicts', '2', '--negativeSamplingExt', '4',
                    '--sizeWindow', '4160', '--nGPU', '2',
                    '--batchSizeGPU', '2', '--rnnMode', 'linear',
                    '--arMode', 'GRU', '--samplingType', 'samespeaker',
                    '--nEpoch', '1', '--save_step', '1', '--random_seed',
                    '11', '--logging_step', '50'])
        out = capsys.readouterr().out
        assert '(dropped' not in out, out
        assert 'ragged tail batches' in out, out
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        assert np.isfinite(np.asarray(logs['locLoss_train'])).all()
        assert np.isfinite(np.asarray(logs['locLoss_val'])).all()


def test_staging_runs_on_prefetch_thread(tmp_path, monkeypatch):
    """Double-buffered device staging: the WireStager upload for full
    batches happens on the prefetch worker thread, not the dispatch
    thread (train_epoch's _prep transform)."""
    import threading
    from cpc2_tpu import train as train_mod
    from cpc2_tpu.data.audio_io import save_wav
    from cpc2_tpu.parallel.mesh import WireStager

    idents = []

    class RecordingStager(WireStager):
        def put(self, sequence):
            idents.append(threading.get_ident())
            return super().put(sequence)

    from cpc2_tpu import train_loop as train_loop_mod
    monkeypatch.setattr(train_loop_mod, 'WireStager', RecordingStager)

    root = tmp_path / 'db'
    d = root / 's1' / 'c1'
    d.mkdir(parents=True)
    rs = np.random.RandomState(2)
    for i in range(3):
        n = 4160 * 5
        t = np.arange(n) / 16000.0
        x = (0.3 * np.sin(2 * np.pi * (160 + 60 * i) * t)
             + 0.05 * rs.randn(n)).astype(np.float32)
        save_wav(str(d / f's1-{i}.wav'), x, 16000)
    train_mod.main(['--pathDB', str(root), '--file_extension', '.wav',
                    '--pathCheckpoint', str(tmp_path / 'ck'),
                    '--hiddenEncoder', '16', '--hiddenGar', '16',
                    '--nPredicts', '2', '--negativeSamplingExt', '4',
                    '--sizeWindow', '4160', '--nGPU', '2',
                    '--batchSizeGPU', '2', '--rnnMode', 'linear',
                    '--arMode', 'GRU', '--samplingType', 'uniform',
                    '--nEpoch', '1', '--save_step', '1',
                    '--logging_step', '20'])
    main_thread = threading.get_ident()
    staged_off_main = [t for t in idents if t != main_thread]
    assert staged_off_main, "no staging happened on the worker thread"


def test_profiler_trace_closes_on_short_epochs(tmp_path):
    """--profile_dir with epochs shorter than the 15-step trace window:
    the trace opened at step 5 must be closed at epoch end (not left
    open, where epoch 2's start_trace would raise 'trace already in
    progress'), and later epochs must not re-trace."""
    from cpc2_tpu import train as train_mod
    from cpc2_tpu.data.audio_io import save_wav
    root = tmp_path / 'db'
    d = root / 's1' / 'c1'
    d.mkdir(parents=True)
    rs = np.random.RandomState(3)
    # 3 train files (1 goes to the 95-5 val split) x 16 windows -> 12
    # full batches of 4 per epoch: past the step-5 trace start, short of
    # the step-15 stop
    for i in range(4):
        n = 4160 * 16
        t = np.arange(n) / 16000.0
        x = (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)
             + 0.05 * rs.randn(n)).astype(np.float32)
        save_wav(str(d / f's1-{i}.wav'), x, 16000)
    prof = tmp_path / 'prof'
    train_mod.main(['--pathDB', str(root), '--file_extension', '.wav',
                    '--pathCheckpoint', str(tmp_path / 'ck'),
                    '--hiddenEncoder', '16', '--hiddenGar', '16',
                    '--nPredicts', '2', '--negativeSamplingExt', '4',
                    '--sizeWindow', '4160', '--nGPU', '2',
                    '--batchSizeGPU', '2', '--rnnMode', 'linear',
                    '--arMode', 'GRU', '--samplingType', 'uniform',
                    '--nEpoch', '2', '--save_step', '2',
                    '--logging_step', '20',
                    '--profile_dir', str(prof)])
    assert prof.exists() and any(prof.rglob('*')), "no trace written"


def test_logging_window_means_do_not_decay(tmp_path, capsys):
    """Mid-epoch logging windows print the WINDOW mean (the reference
    divides the window delta by loggingStep, `cpc/train.py:160-164`).
    A regression divided by the cumulative step count instead, so window
    N read ~1/N of the true loss — assert successive windows of a
    near-constant-loss run stay on the same scale."""
    import re
    from cpc2_tpu.data.audio_io import save_wav

    root = tmp_path / 'db'
    d = root / 's1' / 'c1'
    d.mkdir(parents=True)
    rs = np.random.RandomState(5)
    for i in range(4):
        n = 4160 * 8
        t = np.arange(n) / 16000.0
        x = (0.3 * np.sin(2 * np.pi * (140 + 45 * i) * t)
             + 0.05 * rs.randn(n)).astype(np.float32)
        save_wav(str(d / f's1-{i}.wav'), x, 16000)
    train.main(['--pathDB', str(root), '--file_extension', '.wav',
                '--pathCheckpoint', str(tmp_path / 'ck'),
                '--hiddenEncoder', '16', '--hiddenGar', '16',
                '--nPredicts', '2', '--negativeSamplingExt', '4',
                '--sizeWindow', '4160', '--nGPU', '2',
                '--batchSizeGPU', '2', '--rnnMode', 'linear',
                '--arMode', 'GRU', '--samplingType', 'uniform',
                '--learningRate', '0', '--nEpoch', '1', '--save_step', '1',
                '--random_seed', '7', '--logging_step', '2'])
    out = capsys.readouterr().out
    window_means = [np.mean([float(v) for v in re.findall(r'[\d.]+', m)])
                    for m in re.findall(r'locLoss_train((?:\s+[\d.]+)+)',
                                        out)]
    assert len(window_means) >= 3, out
    # lr=0: every window sees the same params, so window means must match
    # (up to negative-sampling noise); under the 1/N bug window 3 reads
    # ~window1/3.
    first = window_means[0]
    for i, w in enumerate(window_means[1:-1], start=2):
        assert w > 0.55 * first, (i, window_means, out)


def test_logging_windows_fire_under_steps_per_dispatch(tmp_path, capsys):
    """With --steps_per_dispatch N, metrics land N steps at a time, so the
    logging window must trigger on the accounted optimizer-step count
    (`it`), not on `(item_index + 1) % logging_step`. The old check only
    fired when the index hit a common multiple of logging_step and N
    (LCM(5, 2) = 10 here > the 8-step epoch -> no window at all) and then
    divided elapsed by logging_step, inflating the printed ms/batch."""
    import re
    from cpc2_tpu.data.audio_io import save_wav

    root = tmp_path / 'db'
    d = root / 's1' / 'c1'
    d.mkdir(parents=True)
    rs = np.random.RandomState(9)
    for i in range(8):
        # 8 windows/file; 7 land in train after the 95-5 split -> ~12-14
        # steps/epoch at batch 4 (epoch offset trims a few), enough to
        # cross the logging threshold at it=6
        n = 4160 * 8
        x = (0.1 * rs.randn(n)).astype(np.float32)
        save_wav(str(d / f's1-{i}.wav'), x, 16000)
    train.main(['--pathDB', str(root), '--file_extension', '.wav',
                '--pathCheckpoint', str(tmp_path / 'ck'),
                '--hiddenEncoder', '16', '--hiddenGar', '16',
                '--nPredicts', '2', '--negativeSamplingExt', '4',
                '--sizeWindow', '4160', '--nGPU', '2',
                '--batchSizeGPU', '2', '--rnnMode', 'linear',
                '--arMode', 'GRU', '--samplingType', 'uniform',
                '--nEpoch', '2', '--save_step', '10',
                '--random_seed', '7', '--logging_step', '5',
                '--steps_per_dispatch', '2'])
    out = capsys.readouterr().out
    # window boundary = first dispatch at/after logging_step steps: it=6
    updates = [int(u) for u in re.findall(r'^Update (\d+)$', out, re.M)]
    assert updates.count(6) == 2, (updates, out)  # one per epoch
    assert re.search(r'ms per batch', out), out


def test_val_epoch_uses_distinct_rng_per_batch(monkeypatch):
    """The compiled val body folds rng with state.step, which never
    advances during validation — val_epoch must therefore hand every
    batch its own host-folded key, or the whole val set scores against
    one realization of the negative draws (the reference re-draws per
    batch from the global torch RNG)."""
    import argparse
    import jax
    from cpc2_tpu import train as train_mod
    from cpc2_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2)
    args = argparse.Namespace(cpc_mode='cpc', mask_prob=0.0, nPredicts=2,
                              _keep_hidden=False)
    keys = []

    def fake_val_step(state, batch, label, rng, mask_indices=None):
        keys.append(np.asarray(jax.random.key_data(rng)).tolist())
        return np.zeros((2, 2)), np.zeros((2, 2))

    frames = 26
    batches = [(np.zeros((4, 2, 1, 4160), np.float32),
                np.zeros(4, np.int64)) for _ in range(3)]
    train_mod.val_epoch(batches, None, fake_val_step, mesh, args,
                        jax.random.PRNGKey(7), frames, 4)
    assert len(keys) == 3
    assert len({tuple(k) for k in keys}) == 3, \
        f"val batches shared rng keys: {keys}"
