"""Device mesh and sharding helpers.

The reference's two parallelism strategies (single-node DataParallel,
multi-node NCCL DDP — `cpc/train.py:523-532`, `distributed_mode.py`) both
reduce to data parallelism. Here that is ONE program: a `shard_map` over a
1-D `('data',)` mesh — per-device batches, replicated params, gradient
`psum` compiled by XLA onto ICI (and DCN across slices, by growing the mesh
to ('dcn_data', 'ici_data') without touching the step function).

Per-shard InfoNCE negative sampling falls out of shard_map for free and
matches the reference's per-GPU negative pool semantics
(`criterion.py:247-267` under DDP).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_axis_size: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh. data_axis_size == -1 uses all devices.

    On multi-slice pods, devices are ordered slice-major so the gradient
    psum's reduction tree keeps intra-slice hops on ICI and crosses DCN once
    per slice (the multi-slice analogue of the reference's NCCL ring)."""
    devices = list(devices if devices is not None else jax.devices())
    if len({getattr(d, 'slice_index', 0) for d in devices}) > 1:
        devices.sort(key=lambda d: (getattr(d, 'slice_index', 0), d.id))
    if data_axis_size > 0:
        devices = devices[:data_axis_size]
    return Mesh(np.asarray(devices), ('data',))


def local_batch_size(batch_size_per_device: int, mesh: Mesh) -> int:
    return batch_size_per_device * mesh.devices.size


def shard_batch(mesh: Mesh, *arrays):
    """Assemble host batches into global arrays sharded over axis 0.

    Single-process: a plain `device_put`. Multi-host (process_count > 1):
    each process holds only its per-host slice of the global batch (fed by
    per-host file sharding, `train.py`), and the global array is assembled
    with `jax.make_array_from_process_local_data` — the TPU-pod analogue of
    the reference's per-rank DataLoader shards
    (`cpc/train.py:387-401`). Per-host batch shapes must match across
    processes (the framework keeps batch shapes static by design).
    """
    n_proc = jax.process_count()
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        spec = P('data', *([None] * (np.ndim(a) - 1)))
        sharding = NamedSharding(mesh, spec)
        if n_proc > 1:
            a = np.asarray(a)
            global_shape = (a.shape[0] * n_proc,) + a.shape[1:]
            out.append(jax.make_array_from_process_local_data(
                sharding, a, global_shape))
        else:
            out.append(jax.device_put(a, sharding))
    return out if len(out) != 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-host, every process holds the full (identical, same-seed) value,
    so the replicated global array is exactly "process-local data == global
    data"."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)
