"""Head-sharded model parallelism (`training.build_steps_2d`).

The K InfoNCE prediction heads are independent networks, so they shard over
a ('data','model') mesh: each model rank holds K/m heads' params+moments and
computes their loss terms. These tests pin equivalence with the single-axis
data-parallel path on the simulated 8-CPU-device mesh:

* linear predictors (no dropout anywhere): multi-step training trajectory
  matches the 1-D path to fp tolerance;
* transformer predictors: deterministic val step matches exactly;
* the head param/moment leaves really are laid out over the model axis.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.losses import CPCUnsupervisedCriterion
from cpc2_tpu.parallel.mesh import make_mesh, make_mesh_2d, replicate, \
    shard_batch
from cpc2_tpu.train import get_criterion, init_criterion_vars
from cpc2_tpu.training import (build_steps, build_steps_2d,
                               create_train_state, head_shard_specs,
                               make_optimizer, shard_state_2d)


def _setup(rnn_mode, k=4, d_model=2):
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = k, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = rnn_mode, 'GRU'

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, criterion_vars, tx)

    crit_local = criterion.clone(n_predicts=k // d_model,
                                 head_axis='model', n_predicts_total=k)
    return args, bundle, criterion, crit_local, tx, state


def _batch(args, n_data):
    rs = np.random.RandomState(3)
    b = args.batchSizeGPU * n_data
    return (rs.randn(b, 2, 1, args.sizeWindow).astype(np.float32),
            np.zeros((b,), np.int32))


class TestHeadSharding:

    def test_train_trajectory_matches_dp(self):
        """2 data x 2 model vs 2 data: same batches, same rng, linear
        predictors (dropout-free) -> same losses and same replicated
        params to fp tolerance."""
        args, bundle, criterion, crit_local, tx, state0 = _setup('linear')
        bn, lab = _batch(args, n_data=2)

        mesh1 = make_mesh(2)
        ts1, _ = build_steps(bundle.module, criterion, tx, mesh1)
        s1 = replicate(mesh1, state0)
        b1, l1 = shard_batch(mesh1, bn, lab)

        mesh2 = make_mesh_2d(2, 2)
        # deep-copy: device_put aliases the device-0 buffer, and ts1's
        # donation would otherwise delete s2's shard
        s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
        ts2, _ = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2)
        b2 = shard_batch(mesh2, bn)

        key = jax.random.PRNGKey(0)
        for step in range(6):
            s1, losses1, accs1 = ts1(s1, b1, l1, key)
            s2, losses2, accs2 = ts2(s2, b2, key)
            np.testing.assert_allclose(np.asarray(losses1),
                                       np.asarray(losses2),
                                       rtol=0, atol=2e-5,
                                       err_msg=f"step {step}")
            np.testing.assert_array_equal(np.asarray(accs1),
                                          np.asarray(accs2))

        # replicated (encoder/AR) params end up the same (tree_leaves
        # order is deterministic and identical for identical structures)
        p1 = s1.params['model']
        p2 = s2.params['model']
        for v1, v2 in zip(jax.tree_util.tree_leaves(p1),
                          jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                       rtol=0, atol=2e-5)
        # head params: the 2-D state holds the same values, just sharded
        h1 = jax.tree_util.tree_leaves(s1.params['criterion'])
        h2 = jax.tree_util.tree_leaves(s2.params['criterion'])
        for v1, v2 in zip(h1, h2):
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                       rtol=0, atol=2e-5)

    def test_val_step_transformer_exact(self):
        """Deterministic val step (transformer heads, no dropout at eval):
        2-D output equals 1-D output."""
        args, bundle, criterion, crit_local, tx, state0 = _setup(
            'transformer')
        bn, lab = _batch(args, n_data=2)

        mesh1 = make_mesh(2)
        _, vs1 = build_steps(bundle.module, criterion, tx, mesh1)
        s1 = replicate(mesh1, state0)
        b1, l1 = shard_batch(mesh1, bn, lab)

        mesh2 = make_mesh_2d(2, 2)
        s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
        _, vs2 = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2)
        b2 = shard_batch(mesh2, bn)

        key = jax.random.PRNGKey(1)
        losses1, accs1 = vs1(s1, b1, l1, key)
        losses2, accs2 = vs2(s2, b2, key)
        np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses2),
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(accs1), np.asarray(accs2))

    def test_head_leaves_sharded_over_model_axis(self):
        args, bundle, criterion, crit_local, tx, state0 = _setup('linear')
        mesh2 = make_mesh_2d(2, 2)
        s2 = shard_state_2d(mesh2, state0)
        specs = head_shard_specs(s2)
        n_sharded = 0
        for (path, leaf), (_, spec) in zip(
                jax.tree_util.tree_leaves_with_path(s2),
                jax.tree_util.tree_leaves_with_path(specs)):
            pstr = jax.tree_util.keystr(path)
            if 'wPrediction' in pstr and leaf.ndim >= 1:
                n_sharded += 1
                assert spec[0] == 'model', pstr
                # each device holds 1/2 of the leading K axis
                shard_shape = leaf.sharding.shard_shape(leaf.shape)
                assert shard_shape[0] * 2 == leaf.shape[0], pstr
        # params + adam mu/nu for the head stack
        assert n_sharded >= 3

    def test_train_cli_with_model_axis(self, tmp_path):
        """The --model_axis_size flag drives a full CLI epoch: mesh (2,2),
        reference-format checkpoint written, finite losses logged."""
        import json
        from cpc2_tpu import train
        from cpc2_tpu.data.audio_io import save_wav
        root = tmp_path / 'db'
        rs = np.random.RandomState(0)
        for spk in ('s1', 's2'):
            d = root / spk / 'c1'
            d.mkdir(parents=True)
            for i in range(2):
                n = 30000
                t = np.arange(n) / 16000.0
                x = (0.3 * np.sin(2 * np.pi * (150 + 80 * i) * t)
                     + 0.05 * rs.randn(n)).astype(np.float32)
                save_wav(str(d / f'{spk}-{i}.wav'), x, 16000)
        ckpt = tmp_path / 'ck'
        train.main(['--pathDB', str(root), '--file_extension', '.wav',
                    '--pathCheckpoint', str(ckpt),
                    '--hiddenEncoder', '32', '--hiddenGar', '32',
                    '--nPredicts', '4', '--negativeSamplingExt', '8',
                    '--sizeWindow', '4160', '--nGPU', '4',
                    '--model_axis_size', '2', '--batchSizeGPU', '2',
                    '--rnnMode', 'transformer', '--arMode', 'GRU',
                    '--samplingType', 'uniform', '--nEpoch', '1',
                    '--save_step', '1', '--logging_step', '10'])
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        losses = np.asarray(logs['locLoss_train'])
        assert losses.shape[-1] == 4          # all K columns logged
        assert np.isfinite(losses).all()
        # checkpoint holds the FULL (unsharded) head stack in reference
        # format
        from cpc2_tpu.io.torch_ckpt import load_torch_checkpoint
        sd = load_torch_checkpoint(str(ckpt / 'checkpoint_0.pt'))
        wp = [k for k in sd['cpcCriterion'] if 'wPrediction' in k]
        assert wp, list(sd['cpcCriterion'])[:5]

    def test_ragged_tail_runs_on_main_mesh(self, tmp_path, capsys,
                                           monkeypatch):
        """A tail batch divisible by the DATA axis but not by the total
        device count must run through the main-mesh ragged program, not be
        diverted to the single-device TailRunner (whose state round-trip
        and 1-device negative pool are the fallback of last resort).
        Mesh (2 data x 2 model), samespeaker tail of 2."""
        import json
        from cpc2_tpu import train
        from cpc2_tpu.data.audio_io import save_wav
        root = tmp_path / 'db'
        rs = np.random.RandomState(7)
        # s1: 7 raw windows -> 6 effective after the random epoch offset
        # -> samespeaker batches [4, 2] at global batch 4; the 2-window
        # tail divides the data axis (2) but not devices.size (4).
        spec = {'s1': 4160 * 7 + 2500, 's2': 4160 * 5 + 2500,
                's3': 4160 * 5 + 2500}
        for spk, n in spec.items():
            d = root / spk / 'c1'
            d.mkdir(parents=True)
            t = np.arange(n) / 16000.0
            x = (0.3 * np.sin(2 * np.pi * 170 * t)
                 + 0.05 * rs.randn(n)).astype(np.float32)
            save_wav(str(d / f'{spk}-0.wav'), x, 16000)
        (tmp_path / 'train.txt').write_text('s1-0\ns2-0\n')
        (tmp_path / 'val.txt').write_text('s3-0\n')
        tail_adds = []
        monkeypatch.setattr(train.TailRunner, 'add',
                            lambda self, item: tail_adds.append(item))
        ckpt = tmp_path / 'ck'
        train.main(['--pathDB', str(root), '--file_extension', '.wav',
                    '--pathTrain', str(tmp_path / 'train.txt'),
                    '--pathVal', str(tmp_path / 'val.txt'),
                    '--pathCheckpoint', str(ckpt),
                    '--hiddenEncoder', '32', '--hiddenGar', '32',
                    '--nPredicts', '4', '--negativeSamplingExt', '8',
                    '--sizeWindow', '4160', '--nGPU', '4',
                    '--model_axis_size', '2', '--batchSizeGPU', '2',
                    '--rnnMode', 'linear', '--arMode', 'GRU',
                    '--samplingType', 'samespeaker', '--nEpoch', '1',
                    '--save_step', '1', '--random_seed', '11',
                    '--logging_step', '50'])
        out = capsys.readouterr().out
        assert 'ragged tail batches' in out, out
        assert '(dropped' not in out, out
        assert not tail_adds      # main-mesh program, not TailRunner
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        assert np.isfinite(np.asarray(logs['locLoss_train'])).all()

    def test_model_axis_rejects_unsupported(self):
        from cpc2_tpu import train
        with pytest.raises((ValueError, SystemExit)):
            train.main(['--pathDB', '/nonexistent', '--model_axis_size', '3',
                        '--nPredicts', '4', '--nGPU', '3'])


def test_n_skipped_trajectory_matches_dp():
    """n_skipped heads are excluded from the trained loss in BOTH paths:
    5-step trajectories match (linear predictors, n_skipped=1)."""
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = 4, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = 'linear', 'GRU'
    args.n_skipped = 1

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state0 = create_train_state(bundle.variables, criterion_vars, tx)
    crit_local = criterion.clone(n_predicts=2, head_axis='model',
                                 n_predicts_total=4, n_skipped=0)

    rs = np.random.RandomState(3)
    bn = rs.randn(4, 2, 1, args.sizeWindow).astype(np.float32)
    lab = np.zeros((4,), np.int32)

    mesh1 = make_mesh(2)
    ts1, _ = build_steps(bundle.module, criterion, tx, mesh1)
    s1 = replicate(mesh1, state0)
    b1, l1 = shard_batch(mesh1, bn, lab)

    mesh2 = make_mesh_2d(2, 2)
    s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
    ts2, _ = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2,
                            n_skipped=1)
    b2 = shard_batch(mesh2, bn)

    key = jax.random.PRNGKey(0)
    for step in range(5):
        s1, losses1, _ = ts1(s1, b1, l1, key)
        s2, losses2, _ = ts2(s2, b2, key)
        assert np.asarray(losses1).shape == (1, 3)   # K - n_skipped
        np.testing.assert_allclose(np.asarray(losses1),
                                   np.asarray(losses2), rtol=0, atol=2e-5,
                                   err_msg=f"step {step}")


def test_global_negatives_2d_matches_1d():
    """--global_negatives under head sharding: the negative pool is sized by
    the DATA axis extent (2), not the device count (4) — the round-2
    advisor finding was a silent out-of-bounds gather from sizing it off
    nGPU. With the pool sized right, the (2 data x 2 model) trajectory
    matches the 1-D 2-device global-negatives run."""
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = 4, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = 'linear', 'GRU'
    args.global_negatives = True

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None,
                              pool_axis_size=2)
    assert criterion.global_negatives and criterion.pool_axis_size == 2
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state0 = create_train_state(bundle.variables, criterion_vars, tx)
    crit_local = criterion.clone(n_predicts=2, head_axis='model',
                                 n_predicts_total=4)

    rs = np.random.RandomState(7)
    bn = rs.randn(4, 2, 1, args.sizeWindow).astype(np.float32)
    lab = np.zeros((4,), np.int32)

    mesh1 = make_mesh(2)
    ts1, _ = build_steps(bundle.module, criterion, tx, mesh1)
    s1 = replicate(mesh1, state0)
    b1, l1 = shard_batch(mesh1, bn, lab)

    mesh2 = make_mesh_2d(2, 2)
    s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
    ts2, _ = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2)
    b2 = shard_batch(mesh2, bn)

    key = jax.random.PRNGKey(5)
    for step in range(5):
        s1, losses1, accs1 = ts1(s1, b1, l1, key)
        s2, losses2, accs2 = ts2(s2, b2, key)
        np.testing.assert_allclose(np.asarray(losses1),
                                   np.asarray(losses2), rtol=0, atol=2e-5,
                                   err_msg=f"step {step}")
        np.testing.assert_array_equal(np.asarray(accs1), np.asarray(accs2))


def test_device_augment_2d_matches_1d():
    """--augment_on_device under head sharding: augmentation keys fold in
    only the data index, so the 2-D trajectory matches the 1-D one with the
    same device chain (time_dropout is keyed, deterministic per step)."""
    from cpc2_tpu.data.augment_device import make_device_augment
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = 4, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = 'linear', 'GRU'

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state0 = create_train_state(bundle.variables, criterion_vars, tx)
    crit_local = criterion.clone(n_predicts=2, head_axis='model',
                                 n_predicts_total=4)

    chain = make_device_augment(['time_dropout'], t_ms=60)
    device_augment = (chain, True, False, False)

    rs = np.random.RandomState(11)
    bn = rs.randn(4, 2, 1, args.sizeWindow).astype(np.float32)
    lab = np.zeros((4,), np.int32)

    mesh1 = make_mesh(2)
    ts1, _ = build_steps(bundle.module, criterion, tx, mesh1,
                         device_augment=device_augment)
    s1 = replicate(mesh1, state0)
    b1, l1 = shard_batch(mesh1, bn, lab)

    mesh2 = make_mesh_2d(2, 2)
    s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
    ts2, _ = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2,
                            device_augment=device_augment)
    b2 = shard_batch(mesh2, bn)

    key = jax.random.PRNGKey(9)
    for step in range(4):
        s1, losses1, _ = ts1(s1, b1, l1, key)
        s2, losses2, _ = ts2(s2, b2, key)
        np.testing.assert_allclose(np.asarray(losses1),
                                   np.asarray(losses2), rtol=0, atol=2e-5,
                                   err_msg=f"step {step}")


def test_quality_weighting_2d_matches_1d():
    """Signal-quality loss weighting composes with head sharding: the
    per-window sigmoid weight is identical across model ranks, so the 2-D
    trajectory matches the 1-D one given the same quality vectors."""
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = 4, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = 'linear', 'GRU'
    args.signal_quality_mode = 'snr'

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    assert criterion.growth_rate is not None
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state0 = create_train_state(bundle.variables, criterion_vars, tx)
    crit_local = criterion.clone(n_predicts=2, head_axis='model',
                                 n_predicts_total=4)

    rs = np.random.RandomState(13)
    bn = rs.randn(4, 2, 1, args.sizeWindow).astype(np.float32)
    lab = np.zeros((4,), np.int32)
    qual = rs.rand(4, 3).astype(np.float32)     # (B, n_quality_frames)

    mesh1 = make_mesh(2)
    ts1, _ = build_steps(bundle.module, criterion, tx, mesh1,
                         has_quality=True)
    s1 = replicate(mesh1, state0)
    b1, l1, q1 = shard_batch(mesh1, bn, lab, qual)

    mesh2 = make_mesh_2d(2, 2)
    s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
    ts2, _ = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2,
                            has_quality=True)
    b2, q2 = shard_batch(mesh2, bn, qual)

    key = jax.random.PRNGKey(2)
    for step in range(4):
        s1, losses1, _ = ts1(s1, b1, l1, key, quality=q1)
        s2, losses2, _ = ts2(s2, b2, key, quality=q2)
        np.testing.assert_allclose(np.asarray(losses1),
                                   np.asarray(losses2), rtol=0, atol=2e-5,
                                   err_msg=f"step {step}")


def test_masking_2d_matches_1d():
    """wav2vec-style span masking composes with head sharding: the same
    host-computed mask + the replicated mask_emb reproduce the 1-D
    masked trajectory."""
    from cpc2_tpu.models.cpc import compute_mask_indices
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = 4, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = 'linear', 'GRU'
    args.mask_prob, args.mask_length = 0.3, 3

    bundle = fl.init_model(args, seed=0)
    assert 'mask_emb' in bundle.variables['params']
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state0 = create_train_state(bundle.variables, criterion_vars, tx)
    crit_local = criterion.clone(n_predicts=2, head_axis='model',
                                 n_predicts_total=4)

    rs = np.random.RandomState(17)
    bn = rs.randn(4, 2, 1, args.sizeWindow).astype(np.float32)
    lab = np.zeros((4,), np.int32)
    frames = 4160 // 160
    mask = compute_mask_indices((8, frames), 0.3, 3, min_masks=2)

    mesh1 = make_mesh(2)
    ts1, _ = build_steps(bundle.module, criterion, tx, mesh1,
                         uses_mask=True)
    s1 = replicate(mesh1, state0)
    b1, l1, m1 = shard_batch(mesh1, bn, lab, mask)

    mesh2 = make_mesh_2d(2, 2)
    s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
    ts2, _ = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2,
                            uses_mask=True)
    b2, m2 = shard_batch(mesh2, bn, mask)

    key = jax.random.PRNGKey(4)
    for step in range(4):
        s1, losses1, _ = ts1(s1, b1, l1, key, mask_indices=m1)
        s2, losses2, _ = ts2(s2, b2, key, mask_indices=m2)
        np.testing.assert_allclose(np.asarray(losses1),
                                   np.asarray(losses2), rtol=0, atol=2e-5,
                                   err_msg=f"step {step}")


def test_hidden_carry_2d_matches_1d():
    """Sequential-sampling hidden carry (the reference's keepHidden,
    `cpc/model.py:196-201`) composes with head sharding: the carry comes
    from the replicated AR compute, so threading it through the 2-D step
    matches the 1-D keep_hidden trajectory, including the carried state."""
    from cpc2_tpu.training import init_hidden
    args, bundle, criterion, crit_local, tx, state0 = _setup('linear')
    bn, lab = _batch(args, n_data=2)

    mesh1 = make_mesh(2)
    ts1, vs1 = build_steps(bundle.module, criterion, tx, mesh1,
                           keep_hidden=True)
    s1 = replicate(mesh1, state0)
    b1, l1 = shard_batch(mesh1, bn, lab)

    mesh2 = make_mesh_2d(2, 2)
    s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
    ts2, vs2 = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2,
                              keep_hidden=True)
    b2 = shard_batch(mesh2, bn)

    key = jax.random.PRNGKey(0)
    h1 = init_hidden(None, args, bn.shape[0])
    h2 = init_hidden(None, args, bn.shape[0])
    for step in range(5):
        s1, losses1, accs1, h1 = ts1(s1, b1, l1, key, hidden=h1)
        s2, losses2, accs2, h2 = ts2(s2, b2, key, hidden=h2)
        np.testing.assert_allclose(np.asarray(losses1),
                                   np.asarray(losses2), rtol=0, atol=2e-5,
                                   err_msg=f"step {step}")
        np.testing.assert_array_equal(np.asarray(accs1),
                                      np.asarray(accs2))
        # the carried hidden itself matches (GRU: single array)
        for a, b in zip(jax.tree_util.tree_leaves(h1),
                        jax.tree_util.tree_leaves(h2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=2e-5,
                                       err_msg=f"hidden at step {step}")
        assert np.abs(np.asarray(jax.tree_util.tree_leaves(h1)[0])).max() \
            > 0  # the carry is actually live, not zeros

    lv1, av1, hv1 = vs1(s1, b1, l1, key, hidden=h1)
    lv2, av2, hv2 = vs2(s2, b2, key, hidden=h2)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv2),
                               rtol=0, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(hv1),
                    jax.tree_util.tree_leaves(hv2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)


def _setup_multihead(k=4, d_model=2):
    """--multihead_rnn: ONE shared transformer trunk, K classifier heads
    (the K-dependent params are only the classifier FF output layer)."""
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = k, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = 'transformer', 'GRU'
    args.multihead_rnn = True

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, criterion_vars, tx)
    crit_local = criterion.clone(n_predicts=k // d_model,
                                 head_axis='model', n_predicts_total=k)
    return args, bundle, criterion, crit_local, tx, state


class TestMultiheadSharding:
    """--multihead_rnn under the ('data','model') mesh: the trunk
    replicates (grads psum over 'model'), only the classifier FF's
    K-expanding output layer (head-major rows) shards."""

    def test_val_step_exact(self):
        """Deterministic val step: 2-D multihead equals 1-D multihead."""
        args, bundle, criterion, crit_local, tx, state0 = _setup_multihead()
        bn, lab = _batch(args, n_data=2)

        mesh1 = make_mesh(2)
        _, vs1 = build_steps(bundle.module, criterion, tx, mesh1)
        s1 = replicate(mesh1, state0)
        b1, l1 = shard_batch(mesh1, bn, lab)

        mesh2 = make_mesh_2d(2, 2)
        s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0),
                            multihead=True)
        _, vs2 = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2,
                                multihead=True)
        b2 = shard_batch(mesh2, bn)

        key = jax.random.PRNGKey(1)
        losses1, accs1 = vs1(s1, b1, l1, key)
        losses2, accs2 = vs2(s2, b2, key)
        np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses2),
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(accs1), np.asarray(accs2))

    def test_only_classifier_output_layer_sharded(self):
        args, bundle, criterion, crit_local, tx, state0 = _setup_multihead()
        mesh2 = make_mesh_2d(2, 2)
        s2 = shard_state_2d(mesh2, state0, multihead=True)
        specs = head_shard_specs(s2, multihead=True)
        n_sharded = n_replicated_pred = 0
        for (path, leaf), (_, spec) in zip(
                jax.tree_util.tree_leaves_with_path(s2),
                jax.tree_util.tree_leaves_with_path(specs)):
            pstr = jax.tree_util.keystr(path)
            if 'wPrediction' not in pstr or leaf.ndim < 1:
                continue
            if 'ffnetwork' in pstr and 'lin2' in pstr:
                n_sharded += 1
                assert spec[0] == 'model', pstr
                shard_shape = leaf.sharding.shard_shape(leaf.shape)
                # head-major leading axis splits 2-ways
                assert shard_shape[0] * 2 == leaf.shape[0], pstr
            else:
                n_replicated_pred += 1
                assert spec == jax.sharding.PartitionSpec(), pstr
        # weight+bias for params, adam mu and nu => 6 sharded leaves
        assert n_sharded == 6, n_sharded
        # the shared trunk (attention, ln, ff1, last_linear) replicates
        assert n_replicated_pred >= 10, n_replicated_pred

    def test_train_step_updates_trunk_and_heads(self):
        """A 2-D multihead train step moves BOTH the sharded classifier
        leaves and the replicated trunk leaves (trunk grads psum over
        'model'), with finite reference-format (1, K) loss columns."""
        args, bundle, criterion, crit_local, tx, state0 = _setup_multihead()
        bn, lab = _batch(args, n_data=2)
        mesh2 = make_mesh_2d(2, 2)
        s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0),
                            multihead=True)
        ts2, _ = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2,
                                multihead=True)
        b2 = shard_batch(mesh2, bn)
        key = jax.random.PRNGKey(1)
        new_state, losses, accs = ts2(s2, b2, key)
        losses = np.asarray(losses)
        assert losses.shape == (1, args.nPredicts)
        assert np.isfinite(losses).all()

        def leafdiff(substr):
            moved = []
            for (path, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(state0.params),
                    jax.tree_util.tree_leaves_with_path(new_state.params)):
                pstr = jax.tree_util.keystr(path)
                if 'wPrediction' in pstr and substr(pstr):
                    moved.append(float(np.abs(np.asarray(b)
                                              - np.asarray(a)).max()))
            return moved

        sharded = leafdiff(lambda p: 'ffnetwork' in p and 'lin2' in p)
        trunk = leafdiff(lambda p: not ('ffnetwork' in p and 'lin2' in p))
        assert sharded and max(sharded) > 0
        assert trunk and max(trunk) > 0

    def test_train_cli_with_multihead(self, tmp_path):
        """--multihead_rnn x --model_axis_size 2 through the full CLI: the
        shared-trunk predictor trains on the (2,2) mesh and the checkpoint
        holds the FULL (unsharded) classifier FF in reference format."""
        import json
        from cpc2_tpu import train
        from cpc2_tpu.data.audio_io import save_wav
        root = tmp_path / 'db'
        rs = np.random.RandomState(1)
        for spk in ('s1', 's2'):
            d = root / spk / 'c1'
            d.mkdir(parents=True)
            for i in range(2):
                n = 30000
                t = np.arange(n) / 16000.0
                x = (0.3 * np.sin(2 * np.pi * (150 + 80 * i) * t)
                     + 0.05 * rs.randn(n)).astype(np.float32)
                save_wav(str(d / f'{spk}-{i}.wav'), x, 16000)
        ckpt = tmp_path / 'ck'
        train.main(['--pathDB', str(root), '--file_extension', '.wav',
                    '--pathCheckpoint', str(ckpt),
                    '--hiddenEncoder', '32', '--hiddenGar', '32',
                    '--nPredicts', '4', '--negativeSamplingExt', '8',
                    '--sizeWindow', '4160', '--nGPU', '4',
                    '--model_axis_size', '2', '--batchSizeGPU', '2',
                    '--rnnMode', 'transformer', '--arMode', 'GRU',
                    '--multihead_rnn',
                    '--samplingType', 'uniform', '--nEpoch', '1',
                    '--save_step', '1', '--logging_step', '10'])
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        losses = np.asarray(logs['locLoss_train'])
        assert losses.shape[-1] == 4
        assert np.isfinite(losses).all()
        from cpc2_tpu.io.torch_ckpt import load_torch_checkpoint
        sd = load_torch_checkpoint(str(ckpt / 'checkpoint_0.pt'))
        lin2 = [k for k in sd['cpcCriterion']
                if 'wPrediction' in k and 'lin2' in k and 'ffnetwork' in k]
        assert lin2, list(sd['cpcCriterion'])[:8]
        # full K*dmodel rows survive the gather off the sharded state
        w = sd['cpcCriterion'][[k for k in lin2 if k.endswith('weight')][0]]
        assert w.shape[0] == 4 * 32, w.shape

    def test_multi_step_composes(self):
        """--steps_per_dispatch x --multihead_rnn x --model_axis_size:
        the scanned 2-D multi-step program carries the multihead sharding
        (trunk replicated, classifier FF sharded) and matches two calls
        of the single-step 2-D path bit-for-bit given the same rng."""
        from cpc2_tpu.training import build_multi_step_2d, \
            shard_stacked_batch
        args, bundle, criterion, crit_local, tx, state0 = _setup_multihead()
        mesh2 = make_mesh_2d(2, 2)
        rs = np.random.RandomState(7)
        stacked = rs.randn(2, args.batchSizeGPU * 2, 2, 1,
                           args.sizeWindow).astype(np.float32) * 0.1
        key = jax.random.PRNGKey(3)

        s_a = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0),
                             multihead=True)
        ts2, _ = build_steps_2d(bundle.module, crit_local, tx, mesh2, s_a,
                                multihead=True)
        single_losses = []
        for i in range(2):
            b = shard_batch(mesh2, stacked[i])
            s_a, losses, _ = ts2(s_a, b, key)
            single_losses.append(np.asarray(losses))

        s_b = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0),
                             multihead=True)
        multi = build_multi_step_2d(bundle.module, crit_local, tx, mesh2,
                                    s_b, n_inner=2, multihead=True)
        s_b, m_losses, _ = multi(s_b, shard_stacked_batch(mesh2, stacked),
                                 None, key)
        m_losses = np.asarray(m_losses)
        assert m_losses.shape == (2, 1, args.nPredicts)
        np.testing.assert_allclose(m_losses[0], single_losses[0],
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(m_losses[1], single_losses[1],
                                   rtol=0, atol=2e-5)
        for pa, pb in zip(jax.tree_util.tree_leaves(s_a.params),
                          jax.tree_util.tree_leaves(s_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=0, atol=3e-6)


def test_cosine_distances_2d_matches_1d():
    """cosine_distances under head sharding scores each shard's heads
    against its ABSOLUTE positive frames (`_pos_z` applies the
    axis_index(head_axis)*n_predicts offset): the concatenated shard
    outputs equal the unsharded criterion's (B, K, W) scores. A shard
    slicing z at the LOCAL step k instead would silently return step-k
    scores for every shard."""
    from jax.sharding import PartitionSpec as P
    from cpc2_tpu.training import head_shard_specs

    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = 4, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = 'linear', 'GRU'

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    crit_local = criterion.clone(n_predicts=2, head_axis='model',
                                 n_predicts_total=4)

    rs = np.random.RandomState(9)
    s = args.sizeWindow // 160
    c = rs.randn(2, s, 32).astype(np.float32)
    z = rs.randn(2, s, 32).astype(np.float32)

    ref = criterion.apply(criterion_vars, c, z, method='cosine_distances')
    assert np.asarray(ref).shape == (2, 4, s - 4)

    mesh2 = make_mesh_2d(1, 2)
    specs = head_shard_specs(criterion_vars)
    fn = jax.jit(jax.shard_map(
        lambda v, cc, zz: crit_local.apply(v, cc, zz,
                                           method='cosine_distances'),
        mesh=mesh2, in_specs=(specs, P(), P()),
        out_specs=P(None, 'model', None)))
    out = fn(criterion_vars, c, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)
