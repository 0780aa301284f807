"""Canonical correlation analysis between two CPC models
(reference `cpc/criterion/cca/train_cca.py`).

Extracts features from two checkpoints over a corpus, fits sklearn CCA,
pickles the projection; consumed at inference by
`FeatureModule(cca_projection=...)`.

Run: `python -m cpc2_tpu.research.train_cca --path_cp_X ... --path_cp_Y ...
--path_db ... --path_output ...`
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from pathlib import Path
from time import time

import numpy as np


def readArgs(path_args):
    print(f"Loading args from {path_args}")
    with open(path_args, 'r') as f:
        return argparse.Namespace(**json.load(f))


def writeArgs(path_args, args):
    with open(path_args, 'w') as f:
        json.dump(vars(args), f, indent=2)


def loadFeatureMakerCPC(cp_path, no_batch=False):
    from ..feature_loader import FeatureModule, loadModel
    assert cp_path[-3:] == ".pt"
    assert os.path.exists(cp_path), f"CPC path at {cp_path} does not exist!!"
    path_config = os.path.join(os.path.dirname(cp_path),
                               "checkpoint_args.json")
    cpc_args = readArgs(path_config)
    print("\nLoading CPC FeatureMaker")
    bundle = loadModel([cp_path])[0]
    return FeatureModule(bundle, getattr(cpc_args, 'onEncoder', False),
                         keep_hidden=no_batch)


def parseArgs(argv):
    parser = argparse.ArgumentParser(
        description='Learn a CCA model between the representations of two '
                    'CPC checkpoints.')
    parser.add_argument('--path_cp_X', type=str,
                        help='Path to the CPC checkpoint for model X.')
    parser.add_argument('--path_cp_Y', type=str,
                        help='Path to the CPC checkpoint for model Y.')
    parser.add_argument('--path_db', type=str,
                        help='Path to the dataset to learn the CCA on.')
    parser.add_argument('--path_output', type=str,
                        help='Path to the output directory.')
    parser.add_argument('--n_components', type=int, default=100,
                        help='Output dimension of the CCA model.')
    parser.add_argument('--file_extension', type=str, default=".wav")
    parser.add_argument('--max_size_seq', type=int, default=10240)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--strict', type=bool, default=True)
    parser.add_argument('--debug', action='store_true')
    parser.add_argument('--no_batch', action='store_true')
    parser.add_argument('--cpu', action='store_true',
                        help="(kept for CLI parity)")
    return parser.parse_args(argv)


def main(argv):
    from ..data.corpus import findAllSeqs
    from ..feature_loader import buildFeature, buildFeature_batch

    args = parseArgs(argv)
    print("=" * 61)
    print("Canonical correlation analysis script.")
    print("=" * 61)

    print(f"\nLooking for all {args.file_extension} files in {args.path_db}")
    seqNames, _ = findAllSeqs(args.path_db, speaker_level=0,
                              extension=args.file_extension, loadCache=True)
    if len(seqNames) == 0 or not os.path.splitext(
            seqNames[0][1])[1].endswith(args.file_extension):
        seqNames, _ = findAllSeqs(args.path_db, speaker_level=0,
                                  extension=args.file_extension,
                                  loadCache=False)
    print(f"Done! Found {len(seqNames)} files!")

    if not os.path.exists(args.path_output):
        Path(args.path_output).mkdir(parents=True, exist_ok=True)
    writeArgs(os.path.join(args.path_output, "CCA_info_args.json"), args)

    if args.debug:
        seqNames = seqNames[:1000]
    assert len(seqNames) > 0, "No file to fit the CCA on!"

    feature_maker_x = loadFeatureMakerCPC(args.path_cp_X, args.no_batch)
    feature_maker_y = loadFeatureMakerCPC(args.path_cp_Y, args.no_batch)

    def extract(feature_maker, x):
        if not args.no_batch:
            return buildFeature_batch(feature_maker, x, seqNorm=False,
                                      strict=args.strict,
                                      maxSizeSeq=args.max_size_seq,
                                      batch_size=args.batch_size)
        return buildFeature(feature_maker, x, seqNorm=False,
                            strict=args.strict)

    print("\nExtracting representations ...")
    start_time = time()
    features_x, features_y = [], []
    for index, vals in enumerate(seqNames):
        file_path = os.path.join(args.path_db, vals[1])
        features_x.append(np.asarray(extract(feature_maker_x, file_path)))
        features_y.append(np.asarray(extract(feature_maker_y, file_path)))
    features_x = np.concatenate(features_x, axis=1)[0]
    features_y = np.concatenate(features_y, axis=1)[0]
    print(f"...done {len(seqNames)} files in {time() - start_time} seconds.")

    print("Fitting CCA to extracted features ...")
    from sklearn.cross_decomposition import CCA
    cca = CCA(n_components=args.n_components)
    cca.fit(features_x, features_y)
    print("Done learning CCA parameters.")

    cca_path = os.path.join(args.path_output,
                            "cca_model_n_components_%d.pkl"
                            % args.n_components)
    with open(cca_path, 'wb') as f:
        pickle.dump(cca, f)


if __name__ == "__main__":
    main(sys.argv[1:])
