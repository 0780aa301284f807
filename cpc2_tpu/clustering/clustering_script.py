"""Clustering CLI (reference `cpc/clustering/clustering_script.py`).

Trains k-means or DP-means centroids over CPC features and writes
reference-compatible clustering checkpoints + `args.json`.

Run: `python -m cpc2_tpu.clustering.clustering_script <cpc_ckpt> <outdir>
<pathDB> [...]`
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from random import shuffle

import numpy as np

from .clustering import (distanceEstimation, fastDPMean, kMeanGPU,
                         save_clustering_checkpoint)


def getQuantile(sorted_data, percent):
    return sorted_data[int(percent * len(sorted_data))]


def parseArgs(argv):
    parser = argparse.ArgumentParser(
        description="Clustering module using kmeans or dpmeans.")
    parser.add_argument("pathCheckpoint", type=str,
                        help="Path to the checkpoint of CPC module.")
    parser.add_argument("dirOutput", type=str,
                        help="Path to the output clustering checkpoint.")
    parser.add_argument("pathDB", type=str,
                        help="Path to the root directory containing the "
                        "audio files to process")
    parser.add_argument("-k", "--nClusters", type=int, default=50,
                        help="Number of clusters for kmeans algorithm "
                        "(default: 50).")
    parser.add_argument("-g", "--nGroups", type=int, default=1,
                        help="Number of groups for kmeans algorithm "
                        "(default: 1).")
    parser.add_argument("-n", "--MAX_ITER", type=int, default=100,
                        help="Number of iterations (default: 100).")
    parser.add_argument("--recursionLevel", type=int, default=2,
                        help="The speaker recursionLevel in the training "
                        "dataset (default: 2).")
    parser.add_argument("--extension", type=str, default=".flac",
                        help="The audio file extension (default: .flac).")
    parser.add_argument("--seqList", type=str, default=None,
                        help="Specific the training sequence list "
                        "(default: None).")
    parser.add_argument("--sizeWindow", type=int, default=10240,
                        help="The size of the window when loading audio "
                        "data (default: 10240).")
    parser.add_argument("--debug", action="store_true",
                        help="Debug mode, only use a small number of "
                        "training data.")
    parser.add_argument("--encoder_layer", action="store_true",
                        help="Whether to use the output of the encoder "
                        "for the clustering.")
    parser.add_argument("--level_gru", type=int, default=None,
                        help="Specify the LSTM hidden level to take the "
                        "representation (default: None).")
    parser.add_argument("--batchSizeGPU", type=int, default=50,
                        help="Batch size of each GPU (default: 50).")
    parser.add_argument("--DPMean", action="store_true",
                        help="Activate DPMeans training instead of Kmeans.")
    parser.add_argument("-l", "--DPLambda", type=float, default=11,
                        help="Lambda parameter of DPMeans algo "
                        "(default: 11).")
    parser.add_argument("--perIterSize", type=int, default=-1,
                        help="Number of items per iteration (default: -1).")
    parser.add_argument("--train_mode", action="store_true",
                        help="Activate training CPC module too.")
    parser.add_argument("--dimReduction", type=str, default=None,
                        help="Dimentionality reduction (default: None)")
    parser.add_argument("--centroidLimits", type=int, nargs=2, default=None,
                        help="centroidLimits when using dimentionality "
                        "reduction (default: None)")
    parser.add_argument("--getDistanceEstimation", action="store_true",
                        help="Get distance estimation")
    parser.add_argument("--save", action="store_true",
                        help="Save the intermediate checkpoints.")
    parser.add_argument("--load", type=str,
                        help="Restart from the given checkpoint")
    parser.add_argument("--save-last", type=int, default=5,
                        help="Number of last checkpoints to be saved "
                        "(default: 5).")
    parser.add_argument("--max-size-loaded", type=int, default=400000000,
                        help="Maximal amount of data held in memory "
                        "at any given time")
    return parser.parse_args(argv)


def main(argv):
    from ..data.corpus import filterSeqs, findAllSeqs
    from ..data.dataset import AudioBatchData
    from ..feature_loader import FeatureModule, loadModel

    args = parseArgs(argv)
    args.pathCheckpoint = Path(args.pathCheckpoint).resolve()
    args.dirOutput = Path(args.dirOutput).resolve()
    args.pathDB = Path(args.pathDB).resolve()
    print("MAX_SIZE_LOADED is %d" % args.max_size_loaded)
    if not args.load and args.dirOutput.is_dir():
        print(f"The output directory {args.dirOutput} already exists, "
              f"please check the option --load !")
        sys.exit()

    seqNames, speakers = findAllSeqs(str(args.pathDB),
                                     speaker_level=args.recursionLevel,
                                     extension=args.extension,
                                     loadCache=True)
    if args.seqList is not None:
        seqNames = filterSeqs(args.seqList, seqNames)
    if args.debug:
        nsamples = 1000
        print(f"Debug mode activated, get only {nsamples} samples!")
        shuffle(seqNames)
        seqNames = seqNames[:nsamples]
    if args.getDistanceEstimation:
        shuffle(seqNames)
        seqNames = seqNames[:5000]

    print(f"\nLoading audio data at {args.pathDB}")
    start_time = time.time()
    dataset = AudioBatchData(args.pathDB, args.sizeWindow, seqNames, None,
                             len(speakers),
                             MAX_SIZE_LOADED=args.max_size_loaded)
    print(f"Dataset loaded in {time.time()-start_time} seconds !\n")

    import jax
    n_devices = len(jax.devices())
    batchSize = args.batchSizeGPU * n_devices
    trainLoader = dataset.getDataLoader(batchSize, "uniform", False,
                                        numWorkers=0)
    print(f"Length of dataLoader: {len(trainLoader)}\n")

    if args.level_gru is None:
        updateConfig = None
    else:
        updateConfig = argparse.Namespace(nLevelsGRU=args.level_gru)
    bundle = loadModel([str(args.pathCheckpoint)],
                       updateConfig=updateConfig)[0]
    featureMaker = FeatureModule(bundle, args.encoder_layer)
    print("Checkpoint loaded!\n")

    if args.dimReduction is not None:
        from ..research.dim_reduction import loadDimReduction
        dim_red = loadDimReduction(args.dimReduction, args.centroidLimits)
        base_maker = featureMaker
        featureMaker = lambda data: dim_red(base_maker(data))  # noqa: E731

    args.dirOutput.mkdir(parents=True, exist_ok=True)
    pathConfig = args.dirOutput / "args.json"
    with open(pathConfig, "w") as f:
        cfg = {k: (str(v) if isinstance(v, Path) else v)
               for k, v in vars(args).items()}
        json.dump(cfg, f, indent=2)

    if args.getDistanceEstimation:
        print("Performing the estimation of the distance distribution "
              "between features")
        dist_repartition = distanceEstimation(featureMaker, trainLoader)
        out_dict = {x: getQuantile(dist_repartition, x)
                    for x in np.arange(0, 1.0, 0.1)}
        with open(args.dirOutput / "quantiles.json", "w") as f:
            json.dump(out_dict, f, indent=2)
        with open(args.dirOutput / "raw.npy", "wb") as f:
            np.save(f, dist_repartition)
        sys.exit()

    start_clusters = None
    if args.load is not None:
        import torch
        print(f"Loading the clusters from {args.load}")
        start_clusters = torch.load(
            args.load, weights_only=False)["state_dict"]["Ck"].numpy()
        print(start_clusters.shape)

    print("Starting the clustering...")
    start_time = time.time()
    if args.DPMean:
        clusters = fastDPMean(trainLoader, featureMaker, args.DPLambda,
                              MAX_ITER=args.MAX_ITER,
                              perIterSize=args.perIterSize,
                              save_dir=args.dirOutput,
                              save_last=args.save_last,
                              mu_start=start_clusters)
        args.nClusters = int(clusters.shape[1])
    else:
        clusters = kMeanGPU(trainLoader, featureMaker, args.nClusters,
                            args.nGroups, perIterSize=args.perIterSize,
                            MAX_ITER=args.MAX_ITER, save_dir=args.dirOutput,
                            save_last=args.save_last,
                            start_clusters=start_clusters)

    print(f"Ran clustering in {time.time() - start_time:.2f} seconds")
    save_clustering_checkpoint(np.asarray(clusters),
                               args.dirOutput / "checkpoint_last.pt")


if __name__ == "__main__":
    main(sys.argv[1:])
