"""Profile the training step and print a device-time op breakdown.

Builds the same train step as `bench.py` (published recipe), traces N
steps with `jax.profiler`, then aggregates the XLA 'X' (complete) events
on the TPU device track: total device ms per op-name prefix, top-k ops,
and a category rollup (matmul/conv, rng, elementwise fusions, copies).

Usage: PYTHONPATH=/root/repo python scripts/profile_step.py
           [--steps 30] [--trace_dir /tmp/tpu_trace] [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_trace(trace_dir, steps, batch, neg_pool_group=0, prng='rbg'):
    import jax
    from cpc2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cpc2_tpu.utils.misc import apply_precision, apply_prng_impl
    apply_precision('bf16mix')
    apply_prng_impl(prng)  # match bench.py/train defaults
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu import feature_loader as fl
    from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
    from cpc2_tpu.train import get_criterion, init_criterion_vars
    from cpc2_tpu.training import (build_steps, create_train_state,
                                   make_optimizer)

    args = get_default_cpc_config()
    args.batchSizeGPU = batch
    args.neg_pool_group = neg_pool_group
    mesh = make_mesh(1)
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=64, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, criterion_vars, tx)
    train_step, _ = build_steps(bundle.module, criterion, tx, mesh)

    rs = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    data = rs.randn(batch, 2, 1, args.sizeWindow).astype(np.float32)
    labels = np.zeros((batch,), np.int32)
    data, labels = shard_batch(mesh, data, labels)

    for _ in range(5):  # warm up: compile + settle layouts
        state, losses, _ = train_step(state, data, labels, key)
    np.asarray(losses)

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, losses, _ = train_step(state, data, labels, key)
        np.asarray(losses)


def load_events(trace_dir):
    """Leaf op events: the device track's 'XLA Ops' thread only (the
    'XLA Modules' / 'Steps' threads carry whole-program container events
    that would double-count)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.trace.json.gz')))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1], 'rt') as f:
        trace = json.load(f)
    events = trace['traceEvents']
    dev_pids, op_tracks = set(), set()
    for e in events:
        if e.get('ph') != 'M':
            continue
        if e.get('name') == 'process_name':
            name = e.get('args', {}).get('name', '')
            if '/device:' in name:
                dev_pids.add(e['pid'])
        elif e.get('name') == 'thread_name':
            if e.get('args', {}).get('name') == 'XLA Ops':
                op_tracks.add((e['pid'], e.get('tid')))
    tracks = {t for t in op_tracks if t[0] in dev_pids} or op_tracks
    assert tracks, "no 'XLA Ops' thread found in trace"
    return [e for e in events
            if e.get('ph') == 'X' and (e['pid'], e.get('tid')) in tracks]


CATEGORIES = [
    ('rng', re.compile(r'rng|threefry|philox|iota_.*random', re.I)),
    ('matmul/conv', re.compile(r'dot|conv|einsum', re.I)),
    ('copy/transpose', re.compile(r'copy|transpose|bitcast|reshape', re.I)),
    ('reduce', re.compile(r'reduce|all-reduce|scatter|gather', re.I)),
    ('fusion/elementwise', re.compile(r'fusion|add|mul|div|exp|log|select',
                                      re.I)),
]


def categorize(name):
    for cat, pat in CATEGORIES:
        if pat.search(name):
            return cat
    return 'other'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--neg_pool_group', type=int, default=0)
    ap.add_argument('--trace_dir', type=str, default='/tmp/tpu_trace')
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--reuse', action='store_true',
                    help='aggregate an existing trace, skip running')
    ap.add_argument('--long', action='store_true',
                    help='print each top op\'s HLO long name (shapes/'
                    'layouts) under its row')
    ap.add_argument('--prng', type=str, default='rbg',
                    choices=['rbg', 'threefry'],
                    help='PRNG implementation (match bench.py/train '
                    'defaults; threefry mask generation adds ~1.3 '
                    'ms/step and flips the fused-FFN auto gate off)')
    args = ap.parse_args()

    if not args.reuse:
        import shutil
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        run_trace(args.trace_dir, args.steps, args.batch,
                  args.neg_pool_group, args.prng)

    events = load_events(args.trace_dir)
    per_op = collections.Counter()
    per_cat = collections.Counter()
    n_ev = collections.Counter()
    long_names = {}
    total = 0.0
    for e in events:
        dur = e.get('dur', 0)  # microseconds
        name = e['name']
        per_op[name] += dur
        n_ev[name] += 1
        per_cat[categorize(name)] += dur
        total += dur
        if name not in long_names:
            ln = e.get('args', {}).get('long_name', '')
            if ln:
                long_names[name] = ln

    steps = args.steps
    print(f"device total: {total / 1000:.2f} ms over {steps} steps "
          f"= {total / 1000 / steps:.3f} ms/step\n")
    print(f"{'category':20s} {'ms/step':>9s} {'share':>7s}")
    for cat, dur in per_cat.most_common():
        print(f"{cat:20s} {dur / 1000 / steps:9.3f} "
              f"{100 * dur / total:6.1f}%")
    print(f"\ntop {args.top} ops (ms/step, count/step):")
    for name, dur in per_op.most_common(args.top):
        print(f"{dur / 1000 / steps:8.3f}  {n_ev[name] / steps:6.1f}x  "
              f"{name[:110]}")
        if args.long and name in long_names:
            print(f"            {long_names[name][:400]}")


if __name__ == '__main__':
    main()
