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
step), a V100-class GPU running the recipe at a typical ~95 ms/step
processes 10.24 / 0.095 ~= 108 audio-hours per hour.

Timing is honest: every timed repetition ends with a device->host fetch of
the losses (np.asarray), so asynchronous dispatch cannot under-report, and
the minimum over repetitions is reported to reject remote-service queue
noise. Per-step device time is cross-checked against the XLA profiler:
`jit_train_body` device duration matches the reported steady-state wall
time with ~3 us inter-step gaps (fully occupied device) — 7.41 ms in the
pre-kernel era, 4.37 ms with the current fused kernels
(`scripts/profile_step.py`).
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

# 10.24 s audio/step at ~95 ms/step on a V100 (see module docstring)
TORCH_GPU_BASELINE_AH_PER_H = 108.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=8,
                        help='windows per step (reference batchSizeGPU=8)')
    parser.add_argument('--steps', type=int, default=150,
                        help='training steps per timed repetition. Large '
                        'enough that the remote-dispatch pipeline fill/'
                        'drain (~30 ms per repetition on the tunnel '
                        'backend) is amortized: device occupancy is '
                        'back-to-back (profiler-verified 3 us gaps), so '
                        'short blocks under-report steady-state '
                        'throughput (20 steps: 8.9 ms/step apparent vs '
                        '7.6 ms/step device-bound steady state)')
    parser.add_argument('--repeats', type=int, default=3)
    parser.add_argument('--precision', type=str, default='bf16mix',
                        choices=['fp32', 'bf16mix', 'bf16'],
                        help='bf16 additionally runs the prediction heads '
                        'with bf16 activations (see utils.apply_precision)')
    parser.add_argument('--inner', type=int, default=0,
                        help='optimizer steps per host dispatch '
                        '(build_multi_step lax.scan; 0 = one step per '
                        'dispatch). Same training math either way.')
    parser.add_argument('--head_remat', nargs='?', const='nothing',
                        default=False, choices=['nothing', 'dots'],
                        help='rematerialize the prediction-head stack in '
                        'the backward pass (bit-identical gradients); '
                        'bare flag recomputes everything, "dots" saves '
                        'matmul outputs and recomputes only elementwise')
    parser.add_argument('--adam_mu_dtype', type=str, default='fp32',
                        choices=['fp32', 'bf16'],
                        help='Adam first-moment dtype (see config flag)')
    parser.add_argument('--neg_pool_group', type=int, default=0,
                        help='sample negatives within groups of this many '
                        'batch elements (reference DataParallel '
                        'semantics; see the training CLI flag)')
    parser.add_argument('--hidden_encoder', type=int, default=None,
                        help='override hiddenEncoder (default: recipe 256) '
                        'for model-scaling studies')
    parser.add_argument('--hidden_gar', type=int, default=None,
                        help='override hiddenGar (default: recipe 256)')
    parser.add_argument('--ar_mode', type=str, default=None,
                        choices=['LSTM', 'GRU', 'RNN', 'transformer'],
                        help='override arMode (default: recipe LSTM)')
    parser.add_argument('--n_levels_gru', type=int, default=None,
                        help='override nLevelsGRU (AR layer count)')
    parser.add_argument('--n_predicts', type=int, default=None,
                        help='override nPredicts (prediction steps)')
    parser.add_argument('--prng', type=str, default='rbg',
                        choices=['rbg', 'threefry'],
                        help='JAX PRNG implementation for dropout masks / '
                        'negative sampling. rbg (default, matching the '
                        'training CLI) uses the TPU hardware RNG; '
                        'threefry mask generation is ALU-bound and costs '
                        '~1.3 ms/step.')
    args_cli = parser.parse_args()

    from cpc2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cpc2_tpu.utils.misc import apply_precision, apply_prng_impl
    apply_precision(args_cli.precision)
    apply_prng_impl(args_cli.prng)
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu import feature_loader as fl
    from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
    from cpc2_tpu.train import get_criterion, init_criterion_vars
    from cpc2_tpu.training import (build_multi_step, build_steps,
                                   create_train_state, make_optimizer,
                                   shard_stacked_batch)

    args = get_default_cpc_config()
    args.batchSizeGPU = args_cli.batch
    args.head_remat = args_cli.head_remat
    args.adam_mu_dtype = args_cli.adam_mu_dtype
    args.neg_pool_group = args_cli.neg_pool_group
    if args_cli.hidden_encoder is not None:
        args.hiddenEncoder = args_cli.hidden_encoder
    if args_cli.hidden_gar is not None:
        args.hiddenGar = args_cli.hidden_gar
    if args_cli.ar_mode is not None:
        args.arMode = args_cli.ar_mode
    if args_cli.n_levels_gru is not None:
        args.nLevelsGRU = args_cli.n_levels_gru
    if args_cli.n_predicts is not None:
        args.nPredicts = args_cli.n_predicts

    mesh = make_mesh(1)  # one chip
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=64, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, criterion_vars, tx)

    b = args_cli.batch
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    inner = max(args_cli.inner, 0)

    if inner > 1:
        multi_step = build_multi_step(bundle.module, criterion, tx, mesh,
                                      inner)
        stacked = rng.randn(inner, b, 2, 1,
                            args.sizeWindow).astype(np.float32)
        labels = np.zeros((inner, b), np.int32)
        batches, labels = shard_stacked_batch(mesh, stacked, labels)

        def run_block(state, n_steps):
            for _ in range(max(n_steps // inner, 1)):
                state, losses, accs = multi_step(state, batches, labels,
                                                 key)
            np.asarray(losses)          # honest device->host sync
            return state, max(n_steps // inner, 1) * inner
    else:
        train_step, _ = build_steps(bundle.module, criterion, tx, mesh)
        batch = rng.randn(b, 2, 1, args.sizeWindow).astype(np.float32)
        labels = np.zeros((b,), np.int32)
        batch, labels = shard_batch(mesh, batch, labels)

        def run_block(state, n_steps):
            for _ in range(n_steps):
                state, losses, accs = train_step(state, batch, labels, key)
            np.asarray(losses)          # honest device->host sync
            return state, n_steps

    # warmup: compile + settle donated-buffer layouts
    for _ in range(2):
        state, _n = run_block(state, max(inner, 2))

    per_step = []
    for _ in range(args_cli.repeats):
        t0 = time.perf_counter()
        state, n_steps = run_block(state, args_cli.steps)
        per_step.append((time.perf_counter() - t0) / n_steps)
    best = min(per_step)

    audio_sec_per_step = b * args.sizeWindow / 16000.0
    # audio-hours per hour == audio-seconds per second
    value = audio_sec_per_step / best
    print(json.dumps({
        "metric": "train_audio_hours_per_hour_per_chip",
        "value": round(float(value), 2),
        "unit": "audio-hours/hour/chip",
        "vs_baseline": round(float(value) / TORCH_GPU_BASELINE_AH_PER_H, 3),
        # the denominator is an ESTIMATED ~95 ms/step V100 (no GPU exists
        # in this environment to measure one); the caveat must travel
        # with every derived number — BASELINE.md has the measured
        # same-host torch-CPU anchor (8,280 ms/step)
        "baseline_estimated": True,
    }))
    print(f"# {1000 * best:.2f} ms/step "
          f"({max(inner, 1)} steps/dispatch), "
          f"batch {b} x {args.sizeWindow / 16000:.2f}s audio, "
          f"repeats {[round(1000 * p, 2) for p in per_step]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
