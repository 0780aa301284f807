"""One-command A/B ladder for the fused Pallas kernels.

Measures the published recipe's training step (same program as
`bench.py`) with each fused kernel toggled via its env gate, in
subprocesses (the gates are read at trace time), and prints a ladder:

    all kernels off -> +fused FFN -> +fused LSTM -> +fused InfoNCE
    (= shipping defaults) -> defaults + opt-in fused encoder

so every kernel's whole-step contribution is reproducible in one
command on the target chip. Timing follows bench.py's rules: 150-step
blocks ending in a device->host fetch, min over repeats.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_kernel_ab.py
      [--steps 150] [--repeats 2] [--batch 8]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LADDER = [
    ("all fused kernels off",
     {'CPC2_FUSED_FFN': '0', 'CPC2_FUSED_LSTM': '0',
      'CPC2_FUSED_INFONCE': '0'}),
    ("+ fused FFN",
     {'CPC2_FUSED_LSTM': '0', 'CPC2_FUSED_INFONCE': '0'}),
    ("+ fused LSTM",
     {'CPC2_FUSED_INFONCE': '0'}),
    ("+ fused InfoNCE (= defaults)", {}),
    ("defaults + opt-in fused encoder", {'CPC2_FUSED_ENCODER': '1'}),
]


def worker(steps, repeats, batch):
    import time

    import numpy as np
    import jax
    from cpc2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cpc2_tpu.utils.misc import apply_precision, apply_prng_impl
    apply_precision('bf16mix')
    apply_prng_impl('rbg')
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu import feature_loader as fl
    from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
    from cpc2_tpu.train import get_criterion, init_criterion_vars
    from cpc2_tpu.training import (build_steps, create_train_state,
                                   make_optimizer)

    args = get_default_cpc_config()
    args.batchSizeGPU = batch
    mesh = make_mesh(1)
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=64, n_phones=None)
    cvars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, cvars, tx)
    train_step, _ = build_steps(bundle.module, criterion, tx, mesh)
    rs = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    data = rs.randn(batch, 2, 1, args.sizeWindow).astype(np.float32)
    labels = np.zeros((batch,), np.int32)
    data, labels = shard_batch(mesh, data, labels)
    losses = None
    for _ in range(10):
        state, losses, _ = train_step(state, data, labels, key)
    np.asarray(losses)
    best = float('inf')
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, losses, _ = train_step(state, data, labels, key)
        np.asarray(losses)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(json.dumps({'ms_per_step': best * 1000,
                      'loss': float(np.asarray(losses).ravel()[0])}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=150)
    ap.add_argument('--repeats', type=int, default=2)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--worker', action='store_true')
    args = ap.parse_args()
    if args.worker:
        worker(args.steps, args.repeats, args.batch)
        return

    rows = []
    for label, env in LADDER:
        e = dict(os.environ)
        e.update(env)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--worker',
             '--steps', str(args.steps), '--repeats', str(args.repeats),
             '--batch', str(args.batch)],
            env=e, capture_output=True, text=True)
        line = [ln for ln in out.stdout.strip().splitlines()
                if ln.startswith('{')]
        if out.returncode or not line:
            print(f"{label}: FAILED\n{out.stdout[-500:]}\n{out.stderr[-500:]}")
            continue
        res = json.loads(line[-1])
        rows.append((label, res['ms_per_step'], res['loss']))
        print(f"{label:36s} {res['ms_per_step']:7.2f} ms/step  "
              f"(loss[0]={res['loss']:.4f})")
    if rows:
        base = rows[0][1]
        print('\nladder vs all-off:')
        for label, ms, _ in rows:
            print(f"  {label:36s} {ms:7.2f} ms  ({base / ms:4.2f}x)")


if __name__ == '__main__':
    main()
