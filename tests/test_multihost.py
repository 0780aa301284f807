"""Multi-host input assembly (SURVEY §2.6 "per-host input pipelines").

Spawns a REAL 2-process `jax.distributed` job on CPU (4 virtual devices per
process, gloo collectives) where each process feeds `shard_batch` only its
per-host slice of the global batch, and asserts the resulting train-step
losses match a single-process 8-device run of the same global batch —
proving `jax.make_array_from_process_local_data` assembles exactly the
array the single-host `device_put` path produces.

Reference analogue: per-rank file shards + NCCL DDP
(`cpc/train.py:387-401,523-532`).
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'multihost_worker.py')
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker_env():
    env = dict(os.environ)
    # The workers pick their own backend/device count via jax.config; the
    # pytest process's CPU-mesh env vars must not leak in.
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_PLATFORMS', None)
    env['PYTHONPATH'] = os.pathsep.join(
        [REPO] + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                  if p])
    return env


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _losses(stdout, label):
    for line in stdout.splitlines():
        if line.startswith('LOSSES '):
            return np.asarray([float(v) for v in line.split()[1:]])
    raise AssertionError(f"no LOSSES line from {label}:\n{stdout}")


def test_two_process_step_matches_single_process():
    env = _worker_env()
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, WORKER, 'distributed', str(pid), port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    baseline = subprocess.run(
        [sys.executable, WORKER, 'baseline'], env=env, timeout=900,
        capture_output=True, text=True)
    assert baseline.returncode == 0, baseline.stderr

    l0 = _losses(outs[0][0], 'proc0')
    l1 = _losses(outs[1][0], 'proc1')
    lb = _losses(baseline.stdout, 'baseline')

    # Both processes observe the same (replicated) loss of the same global
    # program...
    np.testing.assert_array_equal(l0, l1)
    # ...and it is the loss the single-host path computes on that batch.
    np.testing.assert_allclose(l0, lb, atol=1e-5)
