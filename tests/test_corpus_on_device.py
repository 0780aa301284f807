"""--corpus_on_device: the data pack lives in device memory and training
batches are gathered on-device from window offsets. The staged batches must
be bit-identical to the host path's (`parallel/mesh.py:DeviceCorpus`), so
the training trajectory matches exactly."""

import json

import numpy as np
import pytest

import jax

from cpc2_tpu import train
from cpc2_tpu.parallel.mesh import DeviceCorpus, WireStager, make_mesh


@pytest.fixture(scope="module")
def mini_corpus(tmp_path_factory):
    from cpc2_tpu.data.audio_io import save_wav
    root = tmp_path_factory.mktemp("db_cod")
    rs = np.random.RandomState(3)
    for s, spk in enumerate(['s1', 's2', 's3']):
        d = root / spk / 'c1'
        d.mkdir(parents=True)
        for i in range(3):
            n = 30000 + 1000 * i
            t = np.arange(n) / 16000.0
            x = (0.3 * np.sin(2 * np.pi * (90 + 40 * i + 60 * s) * t)
                 + 0.05 * rs.randn(n)).astype(np.float32)
            save_wav(str(d / f'{spk}-c1-{i:04d}.wav'), x, 16000)
    return root


BASE = ['--file_extension', '.wav',
        '--hiddenEncoder', '32', '--hiddenGar', '32',
        '--nPredicts', '4', '--negativeSamplingExt', '8',
        '--sizeWindow', '4160', '--nGPU', '2', '--batchSizeGPU', '2',
        '--rnnMode', 'linear', '--arMode', 'GRU',
        '--random_seed', '42', '--logging_step', '25',
        '--save_step', '1', '--nEpoch', '2']


def _run(corpus, ckpt, extra):
    train.main(['--pathDB', str(corpus), '--pathCheckpoint', str(ckpt)]
               + BASE + extra)
    with open(str(ckpt) + '/checkpoint_logs.json') as f:
        return json.load(f)


class TestTrajectoryEquivalence:

    @pytest.mark.parametrize('sampling', ['uniform', 'samespeaker'])
    def test_matches_host_path(self, mini_corpus, tmp_path, sampling):
        """Same seed, with/without --corpus_on_device: identical logs.
        samespeaker produces ragged tail batches, covering the host
        gather fallback too."""
        host = _run(mini_corpus, tmp_path / 'host',
                    ['--samplingType', sampling])
        dev = _run(mini_corpus, tmp_path / 'dev',
                   ['--samplingType', sampling, '--corpus_on_device'])
        for key in ('locLoss_train', 'locAcc_train', 'locLoss_val',
                    'locAcc_val'):
            np.testing.assert_allclose(
                np.asarray(host[key], np.float64),
                np.asarray(dev[key], np.float64), rtol=0, atol=0,
                err_msg=key)

    def test_sequential_hidden_carry(self, mini_corpus, tmp_path):
        """keepHidden (sequential sampling) composes with the device
        corpus: offsets flow, the carry stays device-side."""
        host = _run(mini_corpus, tmp_path / 'hostseq',
                    ['--samplingType', 'sequential'])
        dev = _run(mini_corpus, tmp_path / 'devseq',
                   ['--samplingType', 'sequential', '--corpus_on_device'])
        np.testing.assert_allclose(
            np.asarray(host['locLoss_train'], np.float64),
            np.asarray(dev['locLoss_train'], np.float64), rtol=0, atol=0)


class TestModelParallelComposition:

    def test_matches_host_path_on_2d_mesh(self, mini_corpus, tmp_path):
        """--corpus_on_device over the ('data','model') head-sharded mesh:
        the staged batch shards over 'data' exactly like the host path."""
        extra = ['--samplingType', 'uniform', '--nGPU', '4',
                 '--model_axis_size', '2']
        host = _run(mini_corpus, tmp_path / 'h2d', extra)
        dev = _run(mini_corpus, tmp_path / 'd2d',
                   extra + ['--corpus_on_device'])
        np.testing.assert_allclose(
            np.asarray(host['locLoss_train'], np.float64),
            np.asarray(dev['locLoss_train'], np.float64), rtol=0, atol=0)


class TestStepsPerDispatchComposition:

    def test_spd_matches_single_step(self, mini_corpus, tmp_path):
        """--corpus_on_device x --steps_per_dispatch: one (spd, B) int32
        offset dispatch drives spd scanned steps, each gathering its batch
        from the HBM-resident pack inside the program. Trajectory matches
        the single-step device-corpus path to fp-fusion tolerance. The
        small --max_size_loaded forces multiple packs, exercising the
        mid-group drain at pack boundaries (buffered offsets must index
        the pack they were drawn from)."""
        extra = ['--samplingType', 'uniform', '--corpus_on_device',
                 '--max_size_loaded', '500000']
        one = _run(mini_corpus, tmp_path / 'spd1', extra)
        three = _run(mini_corpus, tmp_path / 'spd3',
                     extra + ['--steps_per_dispatch', '3'])
        for key in ('locLoss_train', 'locAcc_train', 'locLoss_val',
                    'locAcc_val'):
            a = np.asarray(one[key], np.float64)
            b = np.asarray(three[key], np.float64)
            # Epoch 0 starts from identical state, so the fp-fusion
            # wobble (the scanned body fuses reductions differently) has
            # not been amplified yet: pin it TIGHT — this row is the real
            # regression guard for the spd composition. By epoch 1 Adam
            # has amplified the ~1e-7 logit wobble into the params
            # (step-level equality at 1e-6 is pinned in
            # tests/test_multi_step.py), and accuracies — means of
            # DISCRETE pos>=max(neg) comparisons, tie-dominated on this
            # stationary-tone corpus — flip in whole blocks, so later
            # epochs only guard gross divergence.
            tight = 2e-5 if 'Loss' in key else 2e-3
            loose = 1e-4 if 'Loss' in key else 0.05
            np.testing.assert_allclose(a[0], b[0], atol=tight,
                                       err_msg=f'{key} epoch 0')
            np.testing.assert_allclose(a, b, atol=loose, err_msg=key)


class TestGuards:

    def test_rejects_host_augmentation(self, mini_corpus, tmp_path):
        with pytest.raises(ValueError, match='clean host windows'):
            _run(mini_corpus, tmp_path / 'g1',
                 ['--samplingType', 'uniform', '--corpus_on_device',
                  '--augment_past', '--augment_type', 'pitch'])

    def test_accepts_device_augmentation(self, mini_corpus, tmp_path):
        logs = _run(mini_corpus, tmp_path / 'g2',
                    ['--samplingType', 'uniform', '--corpus_on_device',
                     '--augment_past', '--augment_type', 'bandreject',
                     '--augment_on_device'])
        assert np.isfinite(np.asarray(logs['locLoss_train'])).all()


class TestDeviceCorpusUnit:

    @pytest.mark.parametrize('on_grid', [True, False])
    def test_put_matches_wire_stager(self, on_grid):
        mesh = make_mesh(2)
        w = 256
        rs = np.random.RandomState(0)
        if on_grid:
            flat = (rs.randint(-32768, 32768, 5000)
                    .astype(np.float32) / 32768.0)
        else:
            flat = rs.randn(5000).astype(np.float32) * 0.1
        idx = np.array([0, 100, 1234, 4000])
        seq = np.stack([flat[i:i + w] for i in idx])[:, None, :]
        seq = np.stack([seq, seq], axis=1)          # (B, 2, 1, W)

        corpus = DeviceCorpus(mesh, w)
        corpus.ensure(flat)
        assert corpus._i16 == on_grid
        got = np.asarray(corpus.put(idx))
        want = np.asarray(WireStager(mesh).put(seq))
        np.testing.assert_array_equal(got, want)

    def test_pack_swap_reuploads(self):
        mesh = make_mesh(2)
        corpus = DeviceCorpus(mesh, 16)
        a = np.zeros(100, np.float32)
        b = np.ones(100, np.float32) * 0.25
        corpus.ensure(a)
        first = corpus._corpus
        corpus.ensure(a)
        assert corpus._corpus is first            # same pack: no re-upload
        corpus.ensure(b)
        out = np.asarray(corpus.put(np.array([0, 8])))
        np.testing.assert_allclose(out, 0.25)

    def test_pack_swap_with_recycled_id(self):
        # Residency must key on object identity via a STRONG reference, not
        # id(): after the loader frees pack A, the allocator can hand pack B
        # the same address, and an id() cache would gather stale audio.
        mesh = make_mesh(2)
        corpus = DeviceCorpus(mesh, 16)
        corpus.ensure(np.zeros(100, np.float32))
        # Each loop frees the previous pack and allocates a same-sized one;
        # an id() cache hits recycled addresses within a few iterations and
        # serves a stale pack's values.
        for i in range(50):
            b = np.full(100, 0.01 * (i + 1), np.float32)
            corpus.ensure(b)
            out = np.asarray(corpus.put(np.array([0, 8])))
            np.testing.assert_allclose(out, 0.01 * (i + 1), rtol=1e-6)
            del b
        assert corpus._host_data is not None


class TestGetBatchMeta:

    def test_quality_vectors_match_get_batch(self, tmp_path):
        """Signal-quality composition: get_batch_meta returns the same
        per-window quality slices the host gather path feeds the
        criterion's loss weighting."""
        torch = pytest.importorskip("torch")
        from cpc2_tpu.data.audio_io import save_wav
        from cpc2_tpu.data.corpus import find_all_seqs
        from cpc2_tpu.data.dataset import AudioBatchData
        root = tmp_path / 'qdb'
        qdir = tmp_path / 'quality'
        rs = np.random.RandomState(1)
        for spk in ['a', 'b']:
            (root / spk / 'c').mkdir(parents=True)
            (qdir / spk / 'c').mkdir(parents=True)
            n = 32000
            x = (0.2 * np.sin(np.arange(n) * 0.05)
                 + 0.02 * rs.randn(n)).astype(np.float32)
            save_wav(str(root / spk / 'c' / f'{spk}-0.wav'), x, 16000)
            est = n // 1600
            torch.save([torch.from_numpy(rs.uniform(0, 30, (est, 1))
                                         .astype(np.float32)),
                        torch.from_numpy(rs.uniform(0, 60, (est, 1))
                                         .astype(np.float32))],
                       str(qdir / spk / 'c' / f'{spk}-0.pt'))
        with open(qdir / 'min_max.csv', 'w') as f:
            f.write("min_snr,max_snr,min_c50,max_c50\n0,30,0,60\n")
        seqs, speakers = find_all_seqs(str(root), extension='.wav',
                                       loadCache=False)
        ds = AudioBatchData(str(root), 3200, seqs, None, len(speakers),
                            nProcessLoader=1,
                            signal_quality_path=str(qdir),
                            signal_quality_step=1600,
                            signal_quality_mode='snr')
        idx = [0, 3200, 40000]
        full = ds.get_batch(idx)
        meta = ds.get_batch_meta(idx)
        np.testing.assert_array_equal(np.asarray(full[1]),
                                      np.asarray(meta[0]))
        np.testing.assert_array_equal(np.asarray(full[2]),
                                      np.asarray(meta[1]))

    def test_matches_get_batch(self, mini_corpus):
        from cpc2_tpu.data.corpus import find_all_seqs
        from cpc2_tpu.data.dataset import AudioBatchData
        seqs, speakers = find_all_seqs(str(mini_corpus),
                                       extension='.wav')
        ds = AudioBatchData(str(mini_corpus), 4160, seqs, None,
                            len(speakers))
        idx = [0, 5000, 60000, 150000]
        full = ds.get_batch(idx)
        meta = ds.get_batch_meta(idx)
        np.testing.assert_array_equal(np.asarray(full[1]),
                                      np.asarray(meta[0]))
        wave = ds.gather_windows(idx)
        np.testing.assert_array_equal(wave, full[0])
