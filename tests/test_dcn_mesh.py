"""The 2-level ('dcn_data','ici_data') multi-slice data mesh
(`parallel.mesh.make_mesh(dcn_axis_size=...)`, `--dcn_axis_size`): the
train step is UNCHANGED (its collectives address `data_axes(mesh)`), and
the trajectory must match the flat 1-D mesh on the same batches — the
hierarchy lives in the mesh layout, not the program.

Reference analogue: the inter-node tier of NCCL DDP
(`/root/reference/cpc/distributed_training/distributed_mode.py:138-142`),
which the reference expresses as a process topology; here it is a mesh
axis XLA lowers to ICI-then-DCN reductions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.parallel.mesh import (batch_pspec, data_axes, data_extent,
                                    local_batch_size, make_mesh,
                                    shard_batch)
from cpc2_tpu.train import get_criterion, init_criterion_vars
from cpc2_tpu.training import (build_multi_step, build_steps,
                               create_train_state, make_optimizer,
                               shard_stacked_batch)


class TestMeshConstruction:

    def test_flat_default(self):
        mesh = make_mesh(8)
        assert mesh.axis_names == ('data',)
        assert data_axes(mesh) == 'data'
        assert data_extent(mesh) == 8
        assert local_batch_size(2, mesh) == 16

    def test_two_level(self):
        mesh = make_mesh(8, dcn_axis_size=2)
        assert mesh.axis_names == ('dcn_data', 'ici_data')
        assert mesh.shape['dcn_data'] == 2 and mesh.shape['ici_data'] == 4
        assert data_axes(mesh) == ('dcn_data', 'ici_data')
        assert data_extent(mesh) == 8
        assert local_batch_size(2, mesh) == 16
        # slice-major: consecutive devices fill the inner (ICI) axis first
        ids = [[d.id for d in row] for row in mesh.devices]
        assert ids == [[0, 1, 2, 3], [4, 5, 6, 7]]

    def test_indivisible_raises(self):
        with pytest.raises(ValueError, match='does not divide'):
            make_mesh(8, dcn_axis_size=3)

    def test_batch_pspec_spans_both_axes(self):
        mesh = make_mesh(8, dcn_axis_size=2)
        spec = batch_pspec(mesh, 4)
        assert spec[0] == ('dcn_data', 'ici_data')
        x = np.arange(8 * 2 * 1 * 4, dtype=np.float32).reshape(8, 2, 1, 4)
        arr = shard_batch(mesh, x)
        # one batch row per device, dcn-major ordering
        shards = sorted(arr.addressable_shards, key=lambda s: s.device.id)
        assert all(s.data.shape == (1, 2, 1, 4) for s in shards)
        np.testing.assert_array_equal(np.asarray(shards[5].data[0]), x[5])


def _setup(mesh_kwargs):
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 24
    args.nPredicts, args.negativeSamplingExt = 2, 4
    args.sizeWindow, args.batchSizeGPU = 4160, 1

    mesh = make_mesh(8, **mesh_kwargs)
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None,
                              data_axis=data_axes(mesh))
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(jax.tree.map(jnp.array, bundle.variables),
                               jax.tree.map(jnp.array, criterion_vars), tx)
    return args, mesh, bundle, criterion, tx, state


def _run_steps(mesh_kwargs, n_steps=4):
    args, mesh, bundle, criterion, tx, state = _setup(mesh_kwargs)
    step, val = build_steps(bundle.module, criterion, tx, mesh)
    rs = np.random.RandomState(0)
    b = 8
    key = jax.random.PRNGKey(0)
    losses_out = []
    for i in range(n_steps):
        x = rs.randn(b, 2, 1, args.sizeWindow).astype(np.float32) * 0.1
        batch, lab = shard_batch(mesh, x, np.zeros((b,), np.int32))
        state, losses, accs = step(state, batch, lab, key)
        losses_out.append(np.asarray(losses))
    vb, vl = shard_batch(
        mesh, rs.randn(b, 2, 1, args.sizeWindow).astype(np.float32) * 0.1,
        np.zeros((b,), np.int32))
    vlosses, vaccs = val(state, vb, vl, key)
    return (np.stack(losses_out), np.asarray(vlosses),
            jax.tree.leaves(jax.tree.map(np.asarray, state.params)))


class TestTrajectoryParity:

    def test_dcn_matches_flat(self):
        """Same batches, same seed: the 2x4 two-level mesh follows the
        8-device flat mesh's trajectory (device-RNG folding uses the
        linearized axis_index, identical across layouts; reductions may
        reassociate -> fp tolerance, like the multi-step pin)."""
        flat = _run_steps({})
        dcn = _run_steps({'dcn_axis_size': 2})
        np.testing.assert_allclose(dcn[0], flat[0], atol=1e-5)
        np.testing.assert_allclose(dcn[1], flat[1], atol=1e-5)
        for a, b in zip(dcn[2], flat[2]):
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_multi_step_on_dcn_mesh(self):
        """--steps_per_dispatch composes with the 2-level mesh."""
        args, mesh, bundle, criterion, tx, state = _setup(
            {'dcn_axis_size': 4})
        n_inner = 2
        multi = build_multi_step(bundle.module, criterion, tx, mesh,
                                 n_inner)
        rs = np.random.RandomState(1)
        stacked = rs.randn(n_inner, 8, 2, 1,
                           args.sizeWindow).astype(np.float32) * 0.1
        labels = np.zeros((n_inner, 8), np.int32)
        batches, labs = shard_stacked_batch(mesh, stacked, labels)
        state, losses, accs = multi(state, batches, labs,
                                    jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(losses)).all()
        assert int(state.step) == n_inner

    def test_global_negatives_on_dcn_mesh(self):
        """--global_negatives gathers its pool over BOTH data axes (the
        criterion's data_axis is the axis pair), so the pool spans all 8
        devices like on the flat mesh."""
        args, mesh, bundle, criterion, tx, state = _setup({})
        args.global_negatives = True

        for kwargs in ({}, {'dcn_axis_size': 2}):
            mesh = make_mesh(8, **kwargs)
            crit = get_criterion(args, 160, n_speakers=4, n_phones=None,
                                 data_axis=data_axes(mesh),
                                 pool_axis_size=data_extent(mesh))
            crit_vars = init_criterion_vars(crit, args, bundle)
            st = create_train_state(
                jax.tree.map(jnp.array, bundle.variables),
                jax.tree.map(jnp.array, crit_vars), tx)
            step, _ = build_steps(bundle.module, crit, tx, mesh)
            rs = np.random.RandomState(2)
            x = rs.randn(8, 2, 1, args.sizeWindow).astype(np.float32) * 0.1
            batch, lab = shard_batch(mesh, x, np.zeros((8,), np.int32))
            st, losses, accs = step(st, batch, lab, jax.random.PRNGKey(0))
            assert np.isfinite(np.asarray(losses)).all()


def test_dcn_rejects_model_axis_composition(tmp_path):
    """--dcn_axis_size composes with the data-parallel paths only; with
    --model_axis_size > 1 train.main must refuse up front."""
    from cpc2_tpu import train
    with pytest.raises(ValueError, match='dcn_axis_size composes'):
        train.main(['--pathDB', str(tmp_path),
                    '--model_axis_size', '2', '--dcn_axis_size', '2'])
