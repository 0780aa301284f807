"""Worker for tests/test_multihost.py.

Runs ONE framework train step over an 8-device CPU mesh, either as one of
two `jax.distributed` processes (4 local devices each, per-host input
slices assembled by `shard_batch` via
`jax.make_array_from_process_local_data`) or as a single-process baseline
over the same global batch. Prints the per-prediction-step losses so the
test can assert the two modes agree — i.e. that the multi-host input
assembly feeds the exact same global program the single-host path does
(SURVEY §2.6 "per-host input pipelines").

Usage: python multihost_worker.py <mode> [process_id coordinator_port]
  mode: 'distributed' | 'baseline'
"""

import os
import sys


def _build_and_step(n_local_devices, process_id, n_processes):
    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', n_local_devices)
    jax.config.update('jax_default_matmul_precision', 'highest')

    if n_processes > 1:
        # Exercise the framework's SLURM/env bootstrap path, not a direct
        # jax.distributed.initialize call.
        import argparse
        from cpc2_tpu.parallel.distributed import init_distributed_mode
        params = argparse.Namespace()
        init_distributed_mode(params)
        assert jax.process_count() == n_processes, jax.process_count()
        assert params.global_rank == process_id

    import numpy as np

    from cpc2_tpu import feature_loader as fl
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from cpc2_tpu.train import get_criterion, init_criterion_vars
    from cpc2_tpu.training import (build_steps, create_train_state,
                                   make_optimizer)

    args = get_default_cpc_config()
    args.hiddenEncoder = 32
    args.hiddenGar = 32
    args.nPredicts = 4
    args.negativeSamplingExt = 8
    args.sizeWindow = 4160
    args.batchSizeGPU = 2

    mesh = make_mesh(-1)
    assert mesh.devices.size == 8, mesh.devices.size

    if n_processes > 1:
        # Establish the cross-process gloo context NOW, while the processes
        # are still in lock-step: the train-step compile below takes a
        # minute and can skew the two processes past gloo's 30 s context
        # rendezvous deadline. The tiny psum compiles in ~1 s and creates
        # the all-device communicator the train step then reuses.
        from jax.sharding import PartitionSpec as P
        warm = jax.jit(jax.shard_map(
            lambda x: jax.lax.psum(x, 'data'), mesh=mesh,
            in_specs=P('data'), out_specs=P()))
        ones = shard_batch(mesh, np.ones((8 // n_processes,), np.float32))
        total = np.asarray(warm(ones).addressable_shards[0].data).reshape(-1)
        assert float(total[0]) == 8.0, total

    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, criterion_vars, tx)
    state = state.replace(params=replicate(mesh, state.params))

    train_step, _ = build_steps(bundle.module, criterion, tx, mesh)

    # The same deterministic GLOBAL batch in both modes; each distributed
    # process feeds shard_batch only its per-host slice.
    global_batch = args.batchSizeGPU * 8
    rng = np.random.RandomState(0)
    batch = rng.randn(global_batch, 2, 1, args.sizeWindow).astype(np.float32)
    labels = np.zeros((global_batch,), np.int32)
    per_host = global_batch // n_processes
    lo, hi = process_id * per_host, (process_id + 1) * per_host
    batch, labels = shard_batch(mesh, batch[lo:hi], labels[lo:hi])

    state, losses, accs = train_step(state, batch, labels,
                                     jax.random.PRNGKey(0))
    # The losses are pmean'd (replicated), but under multi-host the global
    # array spans non-addressable devices, so fetch a local shard.
    losses = np.asarray(losses.addressable_shards[0].data)
    assert np.isfinite(losses).all(), losses
    print("LOSSES", " ".join("%.6f" % v for v in losses.ravel()))


def main():
    mode = sys.argv[1]
    if mode == 'baseline':
        _build_and_step(n_local_devices=8, process_id=0, n_processes=1)
    elif mode == 'distributed':
        process_id, port = int(sys.argv[2]), sys.argv[3]
        os.environ.update({
            'WORLD_SIZE': '2', 'RANK': str(process_id), 'LOCAL_RANK': '0',
            'N_NODES': '2', 'NODE_ID': str(process_id),
            'JAX_COORDINATOR_ADDRESS': f'localhost:{port}',
        })
        _build_and_step(n_local_devices=4, process_id=process_id,
                        n_processes=2)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == '__main__':
    main()
