"""Quantization CLI (reference `cpc/clustering/clustering_quantization.py`):
per file, CPC features -> argmin cluster ids -> `quantized_outputs.txt`
lines `name\\tid,id,...` (multi-group ids '-'-joined).

Run: `python -m cpc2_tpu.clustering.clustering_quantization <cluster_ckpt>
<pathDB> <outdir> [...]`
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path
from time import time

import jax.numpy as jnp
import numpy as np

from .clustering import load_clustering_checkpoint


def readArgs(path_dir):
    print(f"Loading args from {path_dir}")
    path_args = Path(path_dir) / "args.json"
    with open(path_args, "r") as f:
        return argparse.Namespace(**json.load(f))


def parseArgs(argv):
    parser = argparse.ArgumentParser(
        description="Quantize audio files using CPC Clustering Module.")
    parser.add_argument("pathCheckpoint", type=str,
                        help="Path to the clustering checkpoint.")
    parser.add_argument("pathDB", type=str,
                        help="Path to the dataset that we want to quantize.")
    parser.add_argument("pathOutput", type=str,
                        help="Path to the output directory.")
    parser.add_argument("--split", type=str, default=None,
                        help="If you want to divide the dataset in small "
                        "splits, specify it with idxSplit-numSplits "
                        "(idxSplit > 0), eg. --split 1-20.")
    parser.add_argument("--file_extension", type=str, default=".flac",
                        help="Extension of the audio files in the dataset "
                        "(default: .flac).")
    parser.add_argument("--max_size_seq", type=int, default=10240,
                        help="Maximal number of frames to consider when "
                        "computing a batch of features (defaut: 10240).")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="Batch size used to compute features when "
                        "computing each file (defaut: 8).")
    parser.add_argument("--strict", type=bool, default=True,
                        help="If activated, each batch of feature will "
                        "contain exactly max_size_seq frames (defaut: True).")
    parser.add_argument("--debug", action="store_true",
                        help="Load only a very small amount of files for "
                        "debugging purposes.")
    parser.add_argument("--nobatch", action="store_true",
                        help="Don't use batch implementation when building "
                        "features (uses stateful RNN carry instead).")
    parser.add_argument("--recursionLevel", type=int, default=1,
                        help="Speaker level in pathDB (defaut: 1).")
    parser.add_argument("--separate-speaker", action="store_true",
                        help="Separate each speaker with a different "
                        "output file.")
    return parser.parse_args(argv)


def main(argv):
    from ..data.corpus import findAllSeqs
    from ..feature_loader import (FeatureModule, buildFeature,
                                  buildFeature_batch, loadModel)

    args = parseArgs(argv)
    print("=" * 61)
    print(f"Quantizing data from {args.pathDB}")
    print("=" * 61)

    if not os.path.exists(args.pathOutput):
        print(f"\nCreating the output directory at {args.pathOutput}")
        Path(args.pathOutput).mkdir(parents=True, exist_ok=True)

    if args.split:
        assert (len(args.split.split("-")) == 2
                and int(args.split.split("-")[1])
                >= int(args.split.split("-")[0]) >= 1), \
            "SPLIT must be under the form idxSplit-numSplits"
        idx_split, num_splits = map(int, args.split.split("-"))

    print(f"\nLooking for all {args.file_extension} files in {args.pathDB} "
          f"with speakerLevel {args.recursionLevel}")
    seqNames, speakers = findAllSeqs(args.pathDB,
                                     speaker_level=args.recursionLevel,
                                     extension=args.file_extension,
                                     loadCache=True)
    print(f"Done! Found {len(seqNames)} files and {len(speakers)} speakers!")

    if not args.split:
        nameOutput = "quantized_outputs.txt"
    else:
        nameOutput = f"quantized_outputs_split_{idx_split}-{num_splits}.txt"
    if not args.separate_speaker:
        outputFile = os.path.join(args.pathOutput, nameOutput)
        assert not os.path.exists(outputFile), \
            f"Output file {outputFile} already exists !!!"

    if args.split:
        startIdx = len(seqNames) // num_splits * (idx_split - 1)
        if idx_split == num_splits:
            endIdx = len(seqNames)
        else:
            endIdx = min(len(seqNames) // num_splits * idx_split,
                         len(seqNames))
        seqNames = seqNames[startIdx:endIdx]
        print(f"\nQuantizing split {idx_split} out of {num_splits} splits, "
              f"with {len(seqNames)} files (idx in range({startIdx}, "
              f"{endIdx})).")

    if args.debug:
        nsamples = 20
        print(f"\nDebug mode activated, only load {nsamples} samples!")
        seqNames = seqNames[:nsamples]

    assert args.pathCheckpoint.endswith(".pt")
    clustering_args = readArgs(Path(args.pathCheckpoint).parent)
    print(f"\nClutering args:\n"
          f"{json.dumps(vars(clustering_args), indent=4, sort_keys=True)}")
    print("-" * 50)

    clusterModule = load_clustering_checkpoint(args.pathCheckpoint)

    print("\nLoading CPC FeatureMaker")
    if getattr(clustering_args, 'level_gru', None) is not None:
        updateConfig = argparse.Namespace(nLevelsGRU=clustering_args.level_gru)
    else:
        updateConfig = None
    bundle = loadModel([clustering_args.pathCheckpoint],
                       updateConfig=updateConfig)[0]
    # train_mode comes from the CLUSTERING run's saved args, like the
    # reference (`clustering_quantization.py:211-217`): quantization
    # reproduces whatever dropout regime the centroids were fit under.
    featureMaker = FeatureModule(
        bundle, clustering_args.encoder_layer, keep_hidden=args.nobatch,
        train_mode=getattr(clustering_args, 'train_mode', False))
    if getattr(clustering_args, 'dimReduction', None) is not None:
        from ..research.dim_reduction import loadDimReduction
        dim_red = loadDimReduction(clustering_args.dimReduction,
                                   clustering_args.centroidLimits)
        base_maker = featureMaker
        featureMaker = lambda data: dim_red(base_maker(data))  # noqa: E731
    print("CPC FeatureMaker loaded!")

    print("\nQuantizing audio files...")
    seqQuantLines = []
    start_time = time()
    for index, vals in enumerate(seqNames):
        file_path = os.path.join(args.pathDB, vals[1])
        if args.nobatch:
            cFeatures = buildFeature(featureMaker, file_path, seqNorm=False,
                                     strict=args.strict,
                                     maxSizeSeq=args.max_size_seq)
        else:
            cFeatures = buildFeature_batch(featureMaker, file_path,
                                           seqNorm=False, strict=args.strict,
                                           maxSizeSeq=args.max_size_seq,
                                           batch_size=args.batch_size)

        dim_ck = clusterModule.Ck.shape[-1]
        nGroups = cFeatures.shape[-1] // dim_ck
        cFeatures = jnp.asarray(cFeatures).reshape(1, -1, dim_ck)
        qFeatures = np.asarray(jnp.argmin(clusterModule(cFeatures), axis=-1))
        qFeatures = qFeatures[0]

        quantLine = ",".join("-".join(str(i) for i in item)
                             for item in qFeatures.reshape(-1, nGroups))
        seqQuantLines.append(quantLine)
        if (index + 1) % 100 == 0:
            print(f"  {index + 1}/{len(seqNames)} files")

    print(f"...done {len(seqQuantLines)} files in {time()-start_time} "
          f"seconds.")

    if args.separate_speaker:
        # One output file per speaker (speaker = path component at
        # recursionLevel, like findAllSeqs). The reference advertises this
        # flag but its implementation is dead code that ends in a NameError
        # after the whole quantization pass
        # (`clustering_quantization.py:141-147,155,262`) — this writes
        # `<speaker>_<nameOutput>` files instead of crashing.
        by_speaker = {}
        for vals, quantln in zip(seqNames, seqQuantLines):
            speaker = vals[1].split("/")[args.recursionLevel - 1]
            file_name = os.path.splitext(os.path.basename(vals[1]))[0]
            by_speaker.setdefault(speaker, []).append(
                "\t".join([file_name, quantln]))
        for speaker, lines in by_speaker.items():
            speaker_file = os.path.join(args.pathOutput,
                                        f"{speaker}_{nameOutput}")
            print(f"\nSaving outputs to {speaker_file}")
            with open(speaker_file, "w") as f:
                f.write("\n".join(lines))
        return

    print(f"\nSaving outputs to {outputFile}")
    outLines = []
    for vals, quantln in zip(seqNames, seqQuantLines):
        file_name = os.path.splitext(os.path.basename(vals[1]))[0]
        outLines.append("\t".join([file_name, quantln]))
    with open(outputFile, "w") as f:
        f.write("\n".join(outLines))


if __name__ == "__main__":
    main(sys.argv[1:])
