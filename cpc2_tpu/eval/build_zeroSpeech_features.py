"""ZeroSpeech Track-1 feature export
(reference `cpc/eval/build_zeroSpeech_features.py`).

Dumps per-file features in fea/npz/npy (and optionally arrayfire) formats,
optionally through a phone-posterior head or a cluster one-hot head.

Run: `python -m cpc2_tpu.eval.build_zeroSpeech_features <pathDB> <pathOut>
<checkpoint> [...]`
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


def getArgs(pathCheckpoints):
    pathArgs = os.path.join(os.path.dirname(pathCheckpoints),
                            "checkpoint_args.json")
    with open(pathArgs, 'rb') as f:
        return json.load(f)


def buildAllFeature(featureMaker, pathDB, pathOut, seqList, stepSize=0.01,
                    strict=False, maxSizeSeq=64000, format='fea',
                    seqNorm=False):
    tot_seqs = len(seqList)
    start_step = stepSize / 2
    for nseq, seqPath in enumerate(seqList):
        feature = buildFeature(featureMaker, os.path.join(pathDB, seqPath),
                               strict=strict or seqNorm,
                               maxSizeSeq=maxSizeSeq, seqNorm=seqNorm)
        feature = np.asarray(feature)
        _, n_steps, hidden_size = feature.shape
        out_name = (os.path.basename(os.path.splitext(seqPath)[0])
                    + f'.{format}')
        fname = os.path.join(pathOut, out_name)

        if format == 'npz':
            time = [start_step + step * stepSize for step in range(n_steps)]
            values = feature[0].astype(np.float32)
            tot_time = np.array([stepSize * n_steps], dtype=np.float32)
            with open(fname, 'wb') as f:
                np.savez(f, time=time, features=values, totTime=tot_time)
        elif format == 'npy':
            values = feature[0].astype(np.float32)
            with open(fname, 'wb') as f:
                np.save(f, values)
        elif format == 'af':
            import arrayfire as af
            time = [start_step + step * stepSize for step in range(n_steps)]
            values = feature[0].astype(np.float32)
            tot_time = np.array([stepSize * n_steps], dtype=np.float32)
            af.save_array("time", af.Array(time, dtype=af.Dtype.f32), fname)
            af.save_array("totTime", af.interop.from_ndarray(tot_time),
                          fname, append=True)
            af.save_array("features", af.interop.from_ndarray(values),
                          fname, append=True)
        else:
            with open(fname, 'w') as f:
                for step in range(n_steps):
                    line = ([start_step + step * stepSize]
                            + feature[0, step, :].tolist())
                    f.write(' '.join(str(x) for x in line) + '\n')
        if (nseq + 1) % 100 == 0:
            print(f"  {nseq + 1}/{tot_seqs} files")


def main(argv):
    parser = argparse.ArgumentParser(
        'Build features for zerospeech Track1 evaluation')
    parser.add_argument('pathDB', help='Path to the reference dataset')
    parser.add_argument('pathOut', help='Path to the output features')
    parser.add_argument('pathCheckpoint', help='Checkpoint to load')
    parser.add_argument('--extension', type=str, default='.wav')
    parser.add_argument('--addCriterion', action='store_true')
    parser.add_argument('--oneHot', action='store_true')
    parser.add_argument('--maxSizeSeq', default=64000, type=int)
    parser.add_argument('--train_mode', action='store_true')
    parser.add_argument('--format', default='fea', type=str,
                        choices=['npz', 'fea', 'npy', 'af'])
    parser.add_argument('--strict', action='store_true')
    parser.add_argument('--dimReduction', type=str, default=None)
    parser.add_argument('--centroidLimits', type=int, nargs=2, default=None)
    parser.add_argument('--getEncoded', action='store_true')
    parser.add_argument('--clusters', type=str, default=None)
    parser.add_argument('--seqNorm', action='store_true')
    args = parser.parse_args(argv)

    if not os.path.isdir(args.pathOut):
        os.mkdir(args.pathOut)
    with open(os.path.join(os.path.dirname(args.pathOut),
                           f"{os.path.basename(args.pathOut)}.json"),
              'w') as f:
        json.dump(vars(args), f, indent=2)

    outData = [x[1] for x in findAllSeqs(args.pathDB,
                                         extension=args.extension,
                                         loadCache=False)[0]]

    bundle = loadModel([args.pathCheckpoint])[0]
    stepSize = DOWNSAMPLING / 16000
    print(f"stepSize : {stepSize}")
    featureMaker = FeatureModule(bundle, args.getEncoded,
                                 train_mode=args.train_mode)
    featureMaker.collapse = False

    if args.addCriterion:
        criterion, nPhones = load_supervised_criterion(args.pathCheckpoint)
        featureMaker = ModelPhoneCombined(featureMaker, criterion,
                                          args.oneHot)
    if args.dimReduction is not None:
        from ..research.dim_reduction import loadDimReduction
        dimRed = loadDimReduction(args.dimReduction, args.centroidLimits)
        base_maker = featureMaker
        ds = base_maker.get_downsampling_factor()

        class _Seq:
            def __call__(self, data):
                return dimRed(np.asarray(base_maker(data)))

            def get_downsampling_factor(self):
                return ds
            getDownsamplingFactor = get_downsampling_factor
        featureMaker = _Seq()
    if args.clusters is not None:
        import torch
        from ..clustering.clustering import kMeanCluster
        cluster_state_dict = torch.load(args.clusters, map_location='cpu',
                                        weights_only=False)
        nClusters = cluster_state_dict['n_clusters']
        clusterModule = kMeanCluster(
            cluster_state_dict['state_dict']['Ck'].numpy())
        mode = 'oneHot' if args.oneHot else 'softmax'
        print(f"{nClusters} clusters found")
        featureMaker = ModelClusterCombined(featureMaker, clusterModule,
                                            nClusters, mode)

    buildAllFeature(featureMaker, args.pathDB, args.pathOut, outData,
                    stepSize=stepSize, strict=args.strict,
                    maxSizeSeq=args.maxSizeSeq, format=args.format,
                    seqNorm=args.seqNorm)


if __name__ == "__main__":
    main(sys.argv[1:])
