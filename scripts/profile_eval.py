"""Eval-stack profiler: where ABX time actually goes (round-3 verdict
item 7 — the 4.3x ABX / 3.1x feature-extraction claims in
`scripts/bench_eval.py` needed device-side evidence).

Builds the same synthetic phone corpus + flagship-dims checkpoint as
bench_eval, then:

* times the three ABX phases (feature loading, within-speaker groups,
  across-speaker groups) at the wall;
* traces the group-computation loops with `jax.profiler` and aggregates
  the device track per op (same methodology as `profile_step.py`),
  reporting the device-busy fraction of each phase — the difference is
  host work (group assembly, score scatter) plus dispatch gaps.

Usage: PYTHONPATH=/root/repo python scripts/profile_eval.py [workdir]
"""

import importlib.util
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, 'scripts', f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else '/tmp/profile_eval'
    os.makedirs(work, exist_ok=True)
    bench_eval = _load('bench_eval')
    profile_step = _load('profile_step')

    import jax
    from cpc2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    corpus = os.path.join(work, 'corpus')
    ckpt = os.path.join(work, 'ckpt', 'checkpoint_0.pt')
    if not os.path.exists(ckpt):
        item = bench_eval.build_corpus(corpus)
        bench_eval.train_checkpoint(corpus, os.path.join(work, 'ckpt'))
    item = os.path.join(work, 'phones.item')

    from cpc2_tpu import feature_loader as fl
    from cpc2_tpu.data.corpus import findAllSeqs
    from cpc2_tpu.eval import eval_ABX
    from cpc2_tpu.eval.abx import abx_group_computation as abx_g
    from cpc2_tpu.eval.abx import abx_iterators as abx_it

    model, _, _ = fl.loadModel([ckpt])
    feat = fl.FeatureModule(model, get_encoded=False, keep_hidden=True)
    seq_list = [(os.path.splitext(os.path.basename(p))[0], p)
                for p in bench_eval._wav_list(corpus)]

    # mirror eval_ABX.main's real path: whole-corpus batched extraction
    # up front, then the loader slices per-phone intervals from the cache
    from cpc2_tpu.feature_loader import build_feature_files
    needed = set(abx_it.load_item_file(item)[0].keys())
    paths = [p for (stem, p) in seq_list if stem in needed]

    def run_phases(trace_dir=None):
        timings = {}
        t0 = time.perf_counter()
        cache = build_feature_files(feat, paths, seqNorm=False,
                                    strict=False, maxSizeSeq=64000)
        for v in cache.values():
            np.asarray(v)
        timings['feature_extraction'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ds = abx_it.ABXFeatureLoader(
            item, seq_list, lambda x: cache[str(x)], 160, True)
        timings['item_slicing'] = time.perf_counter() - t0

        dist = abx_g.get_distance_function_from_name('cosine')
        ctx = (jax.profiler.trace(trace_dir) if trace_dir
               else _null())
        with ctx:
            for mode in ('within', 'across'):
                t0 = time.perf_counter()
                it = ds.get_iterator(mode, 10, max_x_across=5)
                coords, values, board = abx_g.get_abx_scores_dtw_on_group(
                    it, dist, it.symmetric)
                np.asarray(values)
                timings[mode] = time.perf_counter() - t0
        return timings

    print("== warm-up (compiles excluded from the report) ==")
    run_phases()
    trace_dir = os.path.join(work, 'trace')
    shutil.rmtree(trace_dir, ignore_errors=True)
    timings = run_phases(trace_dir)
    group_wall = timings['within'] + timings['across']

    events = profile_step.load_events(trace_dir)
    import collections
    per_op, per_cat = collections.Counter(), collections.Counter()
    total = 0.0
    for e in events:
        dur = e.get('dur', 0)
        per_op[e['name']] += dur
        per_cat[profile_step.categorize(e['name'])] += dur
        total += dur

    print("\n== phase wall times (second run, warm) ==")
    for k, v in timings.items():
        print(f"  {k:18s} {v * 1000:9.1f} ms")
    print(f"\n== device busy during the group loops ==")
    print(f"  device op time   {total / 1000:9.1f} ms")
    print(f"  group-loop wall  {group_wall * 1000:9.1f} ms")
    print(f"  busy fraction    {100 * total / 1000 / (group_wall * 1000):8.1f}%"
          f"   (rest = host group assembly/scatter + dispatch gaps)")
    print("\n== device time by category ==")
    for cat, dur in per_cat.most_common():
        print(f"  {cat:20s} {dur / 1000:9.2f} ms  "
              f"{100 * dur / total:5.1f}%")
    print("\n== top 15 device ops ==")
    for name, dur in per_op.most_common(15):
        print(f"  {dur / 1000:9.2f} ms  {name[:100]}")


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == '__main__':
    main()
