"""`build_multi_step` (one dispatch = n optimizer steps via lax.scan):
bit-identical trajectory to n calls of the single-step path."""

import numpy as np

import jax
import jax.numpy as jnp

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
from cpc2_tpu.train import get_criterion, init_criterion_vars
from cpc2_tpu.training import (build_multi_step, build_steps,
                               create_train_state, make_optimizer,
                               shard_stacked_batch)


def test_multi_step_matches_single_steps():
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 24
    args.nPredicts, args.negativeSamplingExt = 2, 4
    args.sizeWindow, args.batchSizeGPU = 4160, 4

    mesh = make_mesh(2)
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)

    n_inner = 3
    rs = np.random.RandomState(0)
    b = args.batchSizeGPU * 2
    stacked = rs.randn(n_inner, b, 2, 1,
                       args.sizeWindow).astype(np.float32) * 0.1
    labels = np.zeros((b,), np.int32)
    key = jax.random.PRNGKey(0)

    # single-step path, n_inner times
    state = create_train_state(jax.tree.map(jnp.array, bundle.variables),
                               jax.tree.map(jnp.array, criterion_vars), tx)
    step, _ = build_steps(bundle.module, criterion, tx, mesh)
    single_losses = []
    for i in range(n_inner):
        batch, lab = shard_batch(mesh, stacked[i], labels)
        state, losses, accs = step(state, batch, lab, key)
        single_losses.append(np.asarray(losses))
    single_losses = np.stack(single_losses)

    # one multi-step dispatch
    state2 = create_train_state(jax.tree.map(jnp.array, bundle.variables),
                                jax.tree.map(jnp.array, criterion_vars), tx)
    multi = build_multi_step(bundle.module, criterion, tx, mesh, n_inner)
    batches, labs = shard_stacked_batch(
        mesh, stacked, np.broadcast_to(labels, (n_inner, b)).copy())
    state2, m_losses, m_accs = multi(state2, batches, labs, key)
    m_losses = np.asarray(m_losses)

    assert m_losses.shape == (n_inner,) + single_losses.shape[1:]
    np.testing.assert_allclose(m_losses, single_losses, atol=1e-6)
    # End states agree (same optimizer trajectory). Tolerance is fp-fusion,
    # not exactness: XLA fuses reductions differently inside the scan body,
    # and Adam's per-step normalization amplifies the ~1e-7 logit wobble
    # into ~1e-5 on the params after a few steps.
    for a, b_ in zip(jax.tree.leaves(state.params),
                     jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
    assert int(state2.step) == n_inner


def test_multi_step_2d_matches_single_steps():
    """`build_multi_step_2d`: one dispatch of n scanned steps on the
    ('data','model') head-sharded mesh follows the same trajectory as n
    calls of the `build_steps_2d` single-step path (which itself is pinned
    to the 1-D path in tests/test_model_parallel.py)."""
    from cpc2_tpu.parallel.mesh import make_mesh_2d
    from cpc2_tpu.training import (build_multi_step_2d, build_steps_2d,
                                   shard_state_2d)

    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 24
    args.nPredicts, args.negativeSamplingExt = 4, 4
    args.sizeWindow, args.batchSizeGPU = 4160, 2
    args.rnnMode, args.arMode = 'linear', 'GRU'

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state0 = create_train_state(bundle.variables, criterion_vars, tx)
    crit_local = criterion.clone(n_predicts=2, head_axis='model',
                                 n_predicts_total=4)

    n_inner = 3
    rs = np.random.RandomState(7)
    b = args.batchSizeGPU * 2
    stacked = rs.randn(n_inner, b, 2, 1,
                       args.sizeWindow).astype(np.float32) * 0.1
    key = jax.random.PRNGKey(1)
    mesh = make_mesh_2d(2, 2)

    s1 = shard_state_2d(mesh, jax.tree.map(jnp.array, state0))
    ts, _ = build_steps_2d(bundle.module, crit_local, tx, mesh, s1)
    single_losses = []
    for i in range(n_inner):
        bi = shard_batch(mesh, stacked[i])
        s1, losses, accs = ts(s1, bi, key)
        single_losses.append(np.asarray(losses))
    single_losses = np.stack(single_losses)

    s2 = shard_state_2d(mesh, jax.tree.map(jnp.array, state0))
    multi = build_multi_step_2d(bundle.module, crit_local, tx, mesh, s2,
                                n_inner)
    batches = shard_stacked_batch(mesh, stacked)
    s2, m_losses, m_accs = multi(s2, batches, None, key)
    m_losses = np.asarray(m_losses)

    assert m_losses.shape == (n_inner,) + single_losses.shape[1:]
    np.testing.assert_allclose(m_losses, single_losses, atol=2e-5)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
    assert int(s2.step) == n_inner
