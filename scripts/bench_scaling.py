"""Batch-scaling / chip-saturation study (VERDICT round-2 item 1).

Runs the headline training-step benchmark (`bench.py`) across per-chip
batch sizes and precisions, one subprocess per config (precision is
process-global), and prints a markdown table of:

  ms/step, audio-hours/hour/chip, x-vs-batch-8-default, est. MFU

MFU is estimated from an analytic FLOP count of the recipe's matmuls
(encoder convs, LSTM, K=12 transformer heads, InfoNCE contractions; 3x
forward for the backward pass) against the chip's advertised peak. It is
a rough occupancy indicator, not a marketing number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scaling.py
           [--batches 8 16 32 64 128] [--steps 150]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def recipe_flops_per_step(b, w=20480, d=256, k=12, n_neg=128):
    """Analytic matmul FLOPs for one fwd+bwd optimizer step of the default
    recipe (2 views per window -> 2b encoder passes, b AR passes)."""
    s = w // 160                       # 128 encoded frames
    # encoder: 5 convs, kernel sizes 10,8,4,4,4, all d channels, output
    # lengths w/5, w/20, w/40, w/80, w/160
    enc = 0
    lens = [w // 5, w // 20, w // 40, w // 80, w // 160]
    ks = [10, 8, 4, 4, 4]
    cin = [1, d, d, d, d]
    for L, kk, ci in zip(lens, ks, cin):
        enc += 2 * L * kk * ci * d
    enc *= 2 * b                       # two views
    # LSTM: 4 gates, (d x d) input + (d x d) recurrent per frame
    lstm = b * s * 2 * (4 * d * d * 2)
    # heads: K transformer heads, each ~1 attention (qkv+out: 4 d^2) +
    # 2-layer FFN (2 * d * 2048?) — reference transformer hidden 512:
    ffn_hidden = 512
    head = k * b * (s - k) * 2 * (4 * d * d + 2 * d * ffn_hidden)
    # InfoNCE: positives b*k*(s-k)*d, negatives b*(s-k)*n_neg*d (fwd)
    nce = 2 * b * (s - k) * d * (k + n_neg)
    fwd = enc + lstm + head + nce
    return 3 * fwd                     # fwd + 2x in bwd


def run_config(batch, precision, steps, extra=()):
    cmd = [sys.executable, os.path.join(REPO, 'bench.py'),
           '--batch', str(batch), '--precision', precision,
           '--steps', str(steps)] + list(extra)
    env = dict(os.environ)
    env['PYTHONPATH'] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=3000)
    if out.returncode != 0:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise RuntimeError(f"bench failed for batch={batch} {precision}")
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith('{')][-1]
    res = json.loads(line)
    ms = None
    for ln in out.stderr.splitlines():
        if ln.startswith('#') and 'ms/step' in ln:
            ms = float(ln.split()[1])
    return res, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='+',
                    default=[8, 16, 32, 64, 128])
    ap.add_argument('--precisions', type=str, nargs='+',
                    default=['bf16mix', 'bf16'])
    ap.add_argument('--steps', type=int, default=150)
    ap.add_argument('--neg_pool_group', type=int, default=0,
                    help='pass --neg_pool_group to every config '
                    '(reference DataParallel pool semantics)')
    ap.add_argument('--peak_tflops', type=float, default=197.0,
                    help='chip peak bf16 TFLOP/s for the MFU estimate '
                    '(v5p ~459, v5e ~197, v4 ~275)')
    args = ap.parse_args()

    rows = []
    for precision in args.precisions:
        for batch in args.batches:
            extra = (['--neg_pool_group',
                      str(args.neg_pool_group)]
                     if args.neg_pool_group else [])
            res, ms = run_config(batch, precision, args.steps,
                                 extra)
            ahh = res['value']
            flops = recipe_flops_per_step(batch)
            mfu = flops / (ms / 1000.0) / (args.peak_tflops * 1e12) * 100
            rows.append((precision, batch, ms, ahh, mfu,
                         res['vs_baseline']))
            print(f"done: {precision} b={batch}: {ms:.2f} ms/step, "
                  f"{ahh:.0f} ah/h, ~{mfu:.1f}% MFU", file=sys.stderr)

    # scaling column anchors on batch 8 when present, else the first row
    # (and says so in the header)
    b8 = next((r[3] for r in rows if r[1] == 8), rows[0][3])
    anchor = 'batch-8' if any(r[1] == 8 for r in rows) else 'first row'
    print('\n| precision | per-chip batch | ms/step | audio-h/h/chip | '
          f'x vs {anchor} | est. MFU | vs torch-GPU est. |')
    print('|---|---|---|---|---|---|---|')
    for precision, batch, ms, ahh, mfu, vsb in rows:
        print(f'| {precision} | {batch} | {ms:.2f} | {ahh:,.0f} | '
              f'{ahh / b8:.2f}x | {mfu:.1f}% | {vsb:.1f}x |')


if __name__ == '__main__':
    main()
