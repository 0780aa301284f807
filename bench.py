"""Headline benchmark: CPC base pretraining throughput on one TPU chip.

Runs the published recipe's training step (256-d conv encoder, 1-layer LSTM
context net, 12 transformer prediction heads, 128 negatives, 20480-sample
windows — `BASELINE.md`) on synthetic data and reports **audio-hours of
training data processed per wall-clock hour per chip**.

Prints ONE JSON line:
  {"metric": "train_audio_hours_per_hour_per_chip", "value": N,
   "unit": "audio-hours/hour/chip", "vs_baseline": N}

vs_baseline is measured against an estimated PyTorch-GPU reference
throughput. The reference repo publishes no numbers (BASELINE.md); from its
own telemetry hooks (ms/batch at batchSizeGPU=8 -> 10.24 s of audio per
step) a V100-class GPU running the recipe at a typical ~95 ms/step gives
~390 audio-hours/hour/GPU. The BASELINE.json target is >= 5x that
(~1940 audio-hours/hour/chip).
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

TORCH_GPU_BASELINE_AH_PER_H = 390.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=8,
                        help='windows per step (reference batchSizeGPU=8)')
    parser.add_argument('--steps', type=int, default=30)
    parser.add_argument('--warmup', type=int, default=5)
    args_cli = parser.parse_args()

    from cpc2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu import feature_loader as fl
    from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
    from cpc2_tpu.train import get_criterion, init_criterion_vars
    from cpc2_tpu.training import (build_steps, create_train_state,
                                   make_optimizer)

    args = get_default_cpc_config()
    args.batchSizeGPU = args_cli.batch

    mesh = make_mesh(1)  # one chip
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=64, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, criterion_vars, tx)
    train_step, _ = build_steps(bundle.module, criterion, tx, mesh)

    b = args_cli.batch
    rng = np.random.RandomState(0)
    batch = rng.randn(b, 2, 1, args.sizeWindow).astype(np.float32)
    labels = np.zeros((b,), np.int32)
    batch, labels = shard_batch(mesh, batch, labels)
    key = jax.random.PRNGKey(0)

    # Warmup (compile)
    for _ in range(args_cli.warmup):
        state, losses, accs = train_step(state, batch, labels, key)
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    for _ in range(args_cli.steps):
        state, losses, accs = train_step(state, batch, labels, key)
    jax.block_until_ready(losses)
    elapsed = time.perf_counter() - t0

    steps_per_sec = args_cli.steps / elapsed
    audio_sec_per_step = b * args.sizeWindow / 16000.0
    # audio-hours per hour == audio-seconds per second
    value = steps_per_sec * audio_sec_per_step
    print(json.dumps({
        "metric": "train_audio_hours_per_hour_per_chip",
        "value": round(float(value), 2),
        "unit": "audio-hours/hour/chip",
        "vs_baseline": round(float(value) / TORCH_GPU_BASELINE_AH_PER_H, 3),
    }))
    print(f"# {1000 * elapsed / args_cli.steps:.2f} ms/step, "
          f"batch {b} x {args.sizeWindow / 16000:.2f}s audio",
          file=sys.stderr)


if __name__ == "__main__":
    main()
