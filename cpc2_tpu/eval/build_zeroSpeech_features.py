"""ZeroSpeech Track-1 feature export (parity surface:
`cpc/eval/build_zeroSpeech_features.py` — same CLI, same on-disk formats,
own pipeline).

Per corpus file, CPC features (context or encoder) are written as one of:

* ``fea`` — text lines ``<t> <f_1> ... <f_D>``;
* ``npz`` — arrays ``time`` / ``features`` / ``totTime``;
* ``npy`` — the raw (T, D) matrix;
* ``af``  — arrayfire containers (same three arrays as npz).

Frame timestamps are mid-frame: ``t = step/2 + i*step`` with
``step = 160/16000`` (the encoder's downsampling). Optional heads stack
onto the extractor: a phone-posterior classifier (``--addCriterion``),
a PCA/SFA projection (``--dimReduction``), or k-means cluster
posteriors/one-hots (``--clusters``).

Run: ``python -m cpc2_tpu.eval.build_zeroSpeech_features <pathDB>
<pathOut> <checkpoint> [...]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..data.corpus import findAllSeqs
from ..feature_loader import (FeatureModule, ModelClusterCombined,
                              ModelPhoneCombined, buildFeature,
                              load_supervised_criterion, loadModel)
from ..models.encoder import DOWNSAMPLING


def _write_fea(path, times, values, tot_time):
    with open(path, 'w') as f:
        for t, row in zip(times, values):
            f.write(' '.join(str(v) for v in [t] + row.tolist()) + '\n')


def _write_npz(path, times, values, tot_time):
    with open(path, 'wb') as f:
        np.savez(f, time=times, features=values, totTime=tot_time)


def _write_npy(path, times, values, tot_time):
    with open(path, 'wb') as f:
        np.save(f, values)


def _write_af(path, times, values, tot_time):
    import arrayfire as af
    af.save_array("time", af.Array(times, dtype=af.Dtype.f32), path)
    af.save_array("totTime", af.interop.from_ndarray(tot_time), path,
                  append=True)
    af.save_array("features", af.interop.from_ndarray(values), path,
                  append=True)


_WRITERS = {'fea': _write_fea, 'npz': _write_npz, 'npy': _write_npy,
            'af': _write_af}


def export_file(feature_fn, in_path, out_path, fmt, step_size,
                strict=False, max_size_seq=64000, seq_norm=False,
                feats=None):
    """Extract one file's features (unless precomputed `feats` is given)
    and write them in `fmt`."""
    if feats is None:
        feats = buildFeature(feature_fn, in_path, strict=strict or seq_norm,
                             maxSizeSeq=max_size_seq, seqNorm=seq_norm)
    feats = np.asarray(feats)[0]
    n_steps = feats.shape[0]
    times = [step_size / 2 + i * step_size for i in range(n_steps)]
    tot_time = np.array([step_size * n_steps], dtype=np.float32)
    _WRITERS[fmt](out_path, times, feats.astype(np.float32), tot_time)


def assemble_feature_fn(args):
    """Compose the extractor the flags describe: base CPC features, then
    any of the phone / dim-reduction / cluster heads on top."""
    bundle = loadModel([args.pathCheckpoint])[0]
    fn = FeatureModule(bundle, args.getEncoded, train_mode=args.train_mode)
    fn.collapse = False

    if args.addCriterion:
        criterion, _ = load_supervised_criterion(args.pathCheckpoint)
        fn = ModelPhoneCombined(fn, criterion, args.oneHot)

    if args.dimReduction is not None:
        from ..research.dim_reduction import loadDimReduction
        project = loadDimReduction(args.dimReduction, args.centroidLimits)
        base, factor = fn, fn.get_downsampling_factor()

        class _Projected:
            def __call__(self, data):
                return project(np.asarray(base(data)))

            def get_downsampling_factor(self):
                return factor
            getDownsamplingFactor = get_downsampling_factor
        fn = _Projected()

    if args.clusters is not None:
        import torch
        from ..clustering.clustering import kMeanCluster
        payload = torch.load(args.clusters, map_location='cpu',
                             weights_only=False)
        centroids = payload['state_dict']['Ck'].numpy()
        print(f"{payload['n_clusters']} clusters found")
        fn = ModelClusterCombined(fn, kMeanCluster(centroids),
                                  payload['n_clusters'],
                                  'oneHot' if args.oneHot else 'softmax')
    return fn


def parse_export_args(argv):
    p = argparse.ArgumentParser(
        'Build features for zerospeech Track1 evaluation')
    p.add_argument('pathDB', help='Path to the reference dataset')
    p.add_argument('pathOut', help='Path to the output features')
    p.add_argument('pathCheckpoint', help='Checkpoint to load')
    p.add_argument('--extension', type=str, default='.wav')
    p.add_argument('--addCriterion', action='store_true')
    p.add_argument('--oneHot', action='store_true')
    p.add_argument('--maxSizeSeq', default=64000, type=int)
    p.add_argument('--train_mode', action='store_true')
    p.add_argument('--format', default='fea', type=str,
                   choices=sorted(_WRITERS))
    p.add_argument('--strict', action='store_true')
    p.add_argument('--dimReduction', type=str, default=None)
    p.add_argument('--centroidLimits', type=int, nargs=2, default=None)
    p.add_argument('--getEncoded', action='store_true')
    p.add_argument('--clusters', type=str, default=None)
    p.add_argument('--seqNorm', action='store_true')
    return p.parse_args(argv)


def main(argv):
    args = parse_export_args(argv)

    os.makedirs(args.pathOut, exist_ok=True)
    sidecar = os.path.join(os.path.dirname(args.pathOut),
                           os.path.basename(args.pathOut) + '.json')
    with open(sidecar, 'w') as f:
        json.dump(vars(args), f, indent=2)

    rel_paths = [rel for _, rel in
                 findAllSeqs(args.pathDB, extension=args.extension,
                             loadCache=False)[0]]
    step_size = DOWNSAMPLING / 16000
    print(f"stepSize : {step_size}")
    feature_fn = assemble_feature_fn(args)

    # Plain-extractor exports go through the streamed batched corpus API
    # (decode on a worker thread, same-length files per program, meshed on
    # multi-device hosts); per-file outputs match buildFeature to float
    # precision. Head-wrapped extractors (phone/cluster/projection) and
    # --train_mode (per-forward dropout draws) keep the per-file loop.
    cache = None
    if hasattr(feature_fn, 'reset_hidden') and not args.train_mode:
        from ..feature_loader import build_feature_files
        paths = [os.path.join(args.pathDB, rel) for rel in rel_paths]
        cache = build_feature_files(feature_fn, paths,
                                    maxSizeSeq=args.maxSizeSeq,
                                    seqNorm=args.seqNorm,
                                    strict=args.strict or args.seqNorm)
    for i, rel in enumerate(rel_paths):
        stem = os.path.basename(os.path.splitext(rel)[0])
        in_path = os.path.join(args.pathDB, rel)
        export_file(feature_fn, in_path,
                    os.path.join(args.pathOut, f'{stem}.{args.format}'),
                    args.format, step_size, strict=args.strict,
                    max_size_seq=args.maxSizeSeq, seq_norm=args.seqNorm,
                    feats=None if cache is None else cache[in_path])
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{len(rel_paths)} files")


if __name__ == "__main__":
    main(sys.argv[1:])
