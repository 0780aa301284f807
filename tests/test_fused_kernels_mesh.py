"""Fused Pallas kernels (FFN, LSTM) composed with the mesh paths.

The kernels are TPU-gated, so the CPU test suite and the driver's
virtual-mesh dryrun normally exercise the XLA formulations. These tests
force the INTERPRETED kernels (CPC2_FUSED_*_INTERPRET=1) through the
full step builders to pin that:

* the kernels trace/execute under `shard_map` on the 1-D data mesh and
  the 2-D ('data','model') head-sharded mesh (vmap over heads inside
  shard_map inside jit);
* module-level outputs match the XLA paths at fp tolerance end-to-end
  (deterministic val step - dropout off).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.parallel.mesh import make_mesh, make_mesh_2d, replicate, \
    shard_batch
from cpc2_tpu.train import get_criterion, init_criterion_vars
from cpc2_tpu.training import (build_steps, build_steps_2d,
                               create_train_state, make_optimizer,
                               shard_state_2d)


def _setup(k=4):
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = k, 6
    args.sizeWindow = 4160
    args.batchSizeGPU = 2
    args.rnnMode, args.arMode = 'transformer', 'LSTM'

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, criterion_vars, tx)
    crit_local = criterion.clone(n_predicts=k // 2, head_axis='model',
                                 n_predicts_total=k)
    return args, bundle, criterion, crit_local, tx, state


def _batch(args, n_data):
    rs = np.random.RandomState(3)
    b = args.batchSizeGPU * n_data
    return (rs.randn(b, 2, 1, args.sizeWindow).astype(np.float32),
            np.zeros((b,), np.int32))


FUSED_ENV = {'CPC2_FUSED_FFN_INTERPRET': '1', 'CPC2_FUSED_FFN': '1',
             'CPC2_FUSED_LSTM_INTERPRET': '1', 'CPC2_FUSED_LSTM': '1'}


class TestFusedKernelsMesh:

    def test_1d_val_fused_matches_xla(self, monkeypatch):
        args, bundle, criterion, _, tx, state0 = _setup()
        bn, lab = _batch(args, n_data=2)
        mesh = make_mesh(2)
        b1, l1 = shard_batch(mesh, bn, lab)
        key = jax.random.PRNGKey(1)

        _, vs_xla = build_steps(bundle.module, criterion, tx, mesh)
        losses_xla, accs_xla = vs_xla(replicate(mesh, state0), b1, l1, key)

        for k, v in FUSED_ENV.items():
            monkeypatch.setenv(k, v)
        _, vs_fused = build_steps(bundle.module, criterion, tx, mesh)
        losses_f, accs_f = vs_fused(replicate(mesh, state0), b1, l1, key)

        np.testing.assert_allclose(np.asarray(losses_xla),
                                   np.asarray(losses_f),
                                   rtol=0, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(accs_xla),
                                      np.asarray(accs_f))

    def test_2d_val_fused_matches_1d(self, monkeypatch):
        """Head-sharded 2-D mesh with the fused kernels inside the
        shard_map body equals the 1-D fused path."""
        for k, v in FUSED_ENV.items():
            monkeypatch.setenv(k, v)
        args, bundle, criterion, crit_local, tx, state0 = _setup()
        bn, lab = _batch(args, n_data=2)
        key = jax.random.PRNGKey(1)

        mesh1 = make_mesh(2)
        _, vs1 = build_steps(bundle.module, criterion, tx, mesh1)
        losses1, accs1 = vs1(replicate(mesh1, state0),
                             *shard_batch(mesh1, bn, lab), key)

        mesh2 = make_mesh_2d(2, 2)
        s2 = shard_state_2d(mesh2, jax.tree.map(jnp.array, state0))
        _, vs2 = build_steps_2d(bundle.module, crit_local, tx, mesh2, s2)
        losses2, accs2 = vs2(s2, shard_batch(mesh2, bn), key)

        np.testing.assert_allclose(np.asarray(losses1),
                                   np.asarray(losses2),
                                   rtol=0, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(accs1),
                                      np.asarray(accs2))

    def test_1d_train_step_fused_lstm_runs(self, monkeypatch):
        """One fused-LSTM train step under shard_map: finite losses and
        a fp-close trajectory vs the scan (FFN stays XLA so the dropout
        realization is identical and the comparison is meaningful)."""
        args, bundle, criterion, _, tx, state0 = _setup()
        bn, lab = _batch(args, n_data=2)
        mesh = make_mesh(2)
        b1, l1 = shard_batch(mesh, bn, lab)
        key = jax.random.PRNGKey(0)

        # deep copies: the train step donates its state buffers, and
        # replicate() aliases state0's device-0 buffer
        ts_xla, _ = build_steps(bundle.module, criterion, tx, mesh)
        s_xla, losses_xla, _ = ts_xla(
            replicate(mesh, jax.tree.map(jnp.array, state0)), b1, l1, key)

        monkeypatch.setenv('CPC2_FUSED_LSTM_INTERPRET', '1')
        monkeypatch.setenv('CPC2_FUSED_LSTM', '1')
        ts_f, _ = build_steps(bundle.module, criterion, tx, mesh)
        s_f, losses_f, _ = ts_f(
            replicate(mesh, jax.tree.map(jnp.array, state0)), b1, l1, key)

        np.testing.assert_allclose(np.asarray(losses_xla),
                                   np.asarray(losses_f),
                                   rtol=0, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_xla.params['model']),
                        jax.tree_util.tree_leaves(s_f.params['model'])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=5e-4)
