"""`--remat` (jax.checkpoint rematerialization): matching training
trajectories with and without, on the full shard_map step.

"Matching" is up to recompute rounding: jax.checkpoint re-executes the
forward subgraph inside the backward pass, where XLA fuses it with
different neighbors, so individual f32 intermediates can differ in the
last ulp. Losses stay within 1e-6; after Adam normalizes three such
gradients (dividing by sqrt(v), which is tiny at init) single param
elements have been observed ~3e-6 apart. The tolerances below allow that
while still failing hard on any real gradient bug (those show up at
1e-2+)."""

import numpy as np

import jax

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
from cpc2_tpu.train import get_criterion, init_criterion_vars
from cpc2_tpu.training import build_steps, create_train_state, make_optimizer


def test_remat_matches_plain():
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 24
    args.nPredicts, args.negativeSamplingExt = 2, 4
    args.sizeWindow, args.batchSizeGPU = 4160, 4

    mesh = make_mesh(2)
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)

    rs = np.random.RandomState(0)
    b = args.batchSizeGPU * 2
    batches = [rs.randn(b, 2, 1, args.sizeWindow).astype(np.float32) * 0.1
               for _ in range(3)]
    labels = np.zeros((b,), np.int32)
    key = jax.random.PRNGKey(0)

    results = {}
    for remat in (False, True):
        # fresh copies: the jitted step donates the state buffers
        import jax.numpy as jnp
        state = create_train_state(
            jax.tree.map(jnp.array, bundle.variables),
            jax.tree.map(jnp.array, criterion_vars), tx)
        step, _ = build_steps(bundle.module, criterion, tx, mesh,
                              remat=remat)
        hist = []
        for bt in batches:
            batch, lab = shard_batch(mesh, bt, labels)
            state, losses, accs = step(state, batch, lab, key)
            hist.append(np.asarray(losses))
        results[remat] = (np.stack(hist), state)

    np.testing.assert_allclose(results[False][0], results[True][0],
                               rtol=0, atol=1e-6)
    # params after 3 updates agree too (tolerance: see module docstring)
    pa = jax.tree.leaves(results[False][1].params)
    pb = jax.tree.leaves(results[True][1].params)
    for a, b_ in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def test_remat_cli_flag_exists():
    from cpc2_tpu.train import parse_args
    a = parse_args(['--pathDB', '/tmp/x', '--remat'])
    assert a.remat is True
    a = parse_args(['--pathDB', '/tmp/x'])
    assert a.remat is False
