"""Model-size scaling study: MFU vs model width on one chip.

The batch-scaling study (`scripts/bench_scaling.py`, docs/performance.md)
showed the published recipe is latency/bandwidth-bound at single-digit
MFU — a property of the tiny 256-d model, not of the framework. This
script demonstrates the other axis: hold the recipe's structure (two-view
CPC step, 12 prediction heads, 128 negatives, 1.28 s windows) and grow
the model. MXU utilization should climb steeply with width because the
matmul FLOPs grow ~d^2 while activation traffic grows ~d.

Each config runs `bench.py` in its own subprocess (precision is
process-global) with the model-override flags; the table reports
ms/step, audio-h/h/chip, and est. MFU from an analytic FLOP count.

The FLOP model here counts every matmul in the step (encoder convs, AR
net, head attention score/PV contractions, head FFNs, InfoNCE pos/neg
scoring) at 2 FLOPs/MAC, x3 for fwd+bwd. It is more complete than the
older `bench_scaling.recipe_flops_per_step` (which omitted the attention
score matmuls and the k-fold negative scoring), so MFU numbers between
the two tables are not directly comparable — each table is internally
consistent.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           scripts/bench_model_scaling.py [--steps 120] [--batch 8 ...]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (label, hidden_encoder, hidden_gar, ar_mode, n_ar_layers)
DEFAULT_CONFIGS = [
    ('recipe-256', 256, 256, 'LSTM', 1),
    ('512', 512, 512, 'LSTM', 1),
    ('1024', 1024, 1024, 'LSTM', 2),
    ('1024-xfmr', 1024, 1024, 'transformer', 4),
]


def step_flops(b, d_enc, d_ar, ar_mode, n_ar_layers, w=20480, k=12,
               n_neg=128, dff=2048):
    """Analytic matmul FLOPs (2/MAC) for one fwd+bwd optimizer step."""
    s = w // 160                       # encoded frames per window
    wh = s - k                         # head/criterion window
    # encoder: 5 strided convs, two views -> 2b passes
    lens = [w // 5, w // 20, w // 40, w // 80, w // 160]
    ks = [10, 8, 4, 4, 4]
    cin = [1] + [d_enc] * 4
    enc = sum(2 * L * kk * ci * d_enc for L, kk, ci in zip(lens, ks, cin))
    enc *= 2 * b
    # AR context net over s frames, b sequences
    ar = 0
    for layer in range(max(n_ar_layers, 1)):
        d_in = d_enc if layer == 0 else d_ar
        if ar_mode == 'LSTM':
            ar += b * s * 2 * 4 * (d_in * d_ar + d_ar * d_ar)
        elif ar_mode == 'GRU':
            ar += b * s * 2 * 3 * (d_in * d_ar + d_ar * d_ar)
        elif ar_mode == 'RNN':
            ar += b * s * 2 * (d_in * d_ar + d_ar * d_ar)
        elif ar_mode == 'transformer':
            per_frame = (4 * d_ar * d_ar + 2 * s * d_ar
                         + d_ar * dff + dff * d_ar + d_ar * d_enc)
            ar += b * s * 2 * per_frame
        else:
            raise ValueError(ar_mode)
    # k single-layer transformer prediction heads over wh frames
    per_frame = (4 * d_ar * d_ar + 2 * wh * d_ar
                 + d_ar * dff + dff * d_ar + d_ar * d_enc)
    heads = k * b * wh * 2 * per_frame
    # InfoNCE scoring: k positives + k x n_neg negative dots per (b, w)
    nce = b * wh * 2 * d_enc * (k + k * n_neg)
    return 3 * (enc + ar + heads + nce)


def run_config(cfg, batch, precision, steps):
    label, d_enc, d_ar, ar_mode, n_layers = cfg
    cmd = [sys.executable, os.path.join(REPO, 'bench.py'),
           '--batch', str(batch), '--precision', precision,
           '--steps', str(steps),
           '--hidden_encoder', str(d_enc), '--hidden_gar', str(d_ar),
           '--ar_mode', ar_mode, '--n_levels_gru', str(n_layers)]
    env = dict(os.environ)
    env['PYTHONPATH'] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=3000)
    if out.returncode != 0:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise RuntimeError(f"bench failed for {label} batch={batch}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith('{')][-1]
    res = json.loads(line)
    ms = None
    for ln in out.stderr.splitlines():
        if ln.startswith('#') and 'ms/step' in ln:
            ms = float(ln.split()[1])
    return res, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='+', default=[8, 32])
    ap.add_argument('--precision', type=str, default='bf16mix')
    ap.add_argument('--steps', type=int, default=120)
    ap.add_argument('--peak_tflops', type=float, default=197.0,
                    help='chip peak bf16 TFLOP/s for the MFU estimate '
                    '(v5p ~459, v5e ~197, v4 ~275)')
    args = ap.parse_args()

    rows = []
    for cfg in DEFAULT_CONFIGS:
        for batch in args.batches:
            res, ms = run_config(cfg, batch, args.precision, args.steps)
            flops = step_flops(batch, cfg[1], cfg[2], cfg[3], cfg[4])
            mfu = flops / (ms / 1000.0) / (args.peak_tflops * 1e12) * 100
            rows.append((cfg[0], cfg[3], batch, ms, res['value'], mfu))
            print(f"done: {cfg[0]} b={batch}: {ms:.2f} ms/step, "
                  f"{res['value']:.0f} ah/h, ~{mfu:.1f}% MFU",
                  file=sys.stderr)

    print('\n| model | AR | per-chip batch | ms/step | audio-h/h/chip | '
          'est. MFU |')
    print('|---|---|---|---|---|---|')
    for label, ar_mode, batch, ms, ahh, mfu in rows:
        print(f'| {label} | {ar_mode} | {batch} | {ms:.2f} | {ahh:,.0f} | '
              f'{mfu:.1f}% |')


if __name__ == '__main__':
    main()
