"""Multi-host bootstrap (reference `cpc/distributed_training/
distributed_mode.py`).

The reference parses SLURM env vars and calls
`torch.distributed.init_process_group(nccl)`. On TPU pods the runtime already
knows the topology; `jax.distributed.initialize()` is the whole story. This
shim keeps the reference's SLURM-awareness (rank/world-size discovery for
logging and per-host file sharding) and fills the same fields on `args`.
"""

from __future__ import annotations

import os
from typing import Any


def init_distributed_mode(params: Any) -> None:
    """Populate rank fields on `params` and initialize the JAX distributed
    runtime when running multi-host. Mirrors the fields set by the reference
    (`distributed_mode.py:11-142`): is_slurm_job, world_size, global_rank,
    local_rank, n_nodes, node_id, n_gpu_per_node, is_master."""
    params.is_slurm_job = ('SLURM_JOB_ID' in os.environ
                           and 'WORLD_SIZE' not in os.environ)

    if params.is_slurm_job:
        params.n_nodes = int(os.environ.get('SLURM_JOB_NUM_NODES', 1))
        params.node_id = int(os.environ.get('SLURM_NODEID', 0))
        params.local_rank = int(os.environ.get('SLURM_LOCALID', 0))
        params.global_rank = int(os.environ.get('SLURM_PROCID', 0))
        params.world_size = int(os.environ.get('SLURM_NTASKS', 1))
    elif 'WORLD_SIZE' in os.environ:
        # torch.distributed.launch-style env (kept for CLI parity)
        params.local_rank = int(os.environ.get('LOCAL_RANK', 0))
        params.global_rank = int(os.environ.get('RANK', 0))
        params.world_size = int(os.environ['WORLD_SIZE'])
        params.n_nodes = int(os.environ.get('N_NODES', 1))
        params.node_id = int(os.environ.get('NODE_ID', 0))
    else:
        # single-host fallback (`distributed_mode.py:88-97`)
        params.n_nodes = 1
        params.node_id = 0
        params.local_rank = 0
        params.global_rank = 0
        params.world_size = 1

    params.n_gpu_per_node = max(1, params.world_size // params.n_nodes)
    params.is_master = params.node_id == 0 and params.local_rank == 0
    params.multi_node = params.n_nodes > 1
    params.multi_gpu = params.world_size > 1

    print("Initialized distributed mode:")
    for name in ['n_nodes', 'node_id', 'local_rank', 'global_rank',
                 'world_size', 'is_master']:
        print(f"  {name}: {getattr(params, name)}")

    if params.world_size > 1:
        import jax
        coordinator = os.environ.get('JAX_COORDINATOR_ADDRESS')
        kwargs = {}
        if coordinator:
            kwargs = dict(coordinator_address=coordinator,
                          num_processes=params.world_size,
                          process_id=params.global_rank)
        jax.distributed.initialize(**kwargs)
