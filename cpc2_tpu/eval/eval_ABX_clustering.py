"""ABX on quantized/clustered units
(reference `cpc/eval/eval_ABX_clustering.py`).

One-hot / soft cluster-distance features fed into the same ABX machinery;
group modes seq / onehot / concat / combine for multi-group quantizers.

Run: `python -m cpc2_tpu.eval.eval_ABX_clustering --clustering <ckpt> ...`
or `--quantized quantized_outputs.txt ...`
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from os.path import basename, exists, splitext
from pathlib import Path

import numpy as np

from ..clustering.clustering import load_clustering_checkpoint
from ..feature_loader import FeatureModule, buildFeature, loadModel
from .eval_ABX import ABX


def write_json(filepath, scores):
    Path(filepath).parent.mkdir(parents=True, exist_ok=True)
    with open(filepath, "w") as f:
        json.dump(scores, f, indent=2)


def read_args(pathArgs):
    print(f"Loading args from {pathArgs}")
    with open(pathArgs, "r") as f:
        return argparse.Namespace(**json.load(f))


def load_cpc_feature_maker(CPC_path_checkpoint, encoder_layer=False,
                           keepHidden=True, gru_level=-1):
    updateConfig = None
    if gru_level is not None and gru_level > 0:
        updateConfig = argparse.Namespace(nLevelsGRU=gru_level)
    bundle, hiddenGar, _ = loadModel([CPC_path_checkpoint],
                                     loadStateDict=True,
                                     updateConfig=updateConfig)
    feature_maker = FeatureModule(bundle, get_encoded=encoder_layer,
                                  keep_hidden=keepHidden)
    print("Checkpoint loaded!\n")
    return feature_maker


def _one_hot(idxs: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((len(idxs), n), np.float32)
    out[np.arange(len(idxs)), idxs] = 1.0
    return out


class ClusteringFeatures:
    """Reference `eval_ABX_clustering.py:48-185`."""

    def __init__(self, clustering_path_checkpoint, soft_clustering=False,
                 encoder_layer=False, keepHidden=True, group_modes="concat",
                 onehot_dict=None):
        self.group_modes = group_modes
        self.soft_clustering = soft_clustering

        clustering_path_checkpoint = Path(clustering_path_checkpoint)
        assert clustering_path_checkpoint.suffix == ".pt"
        assert self.group_modes in ["seq", "onehot", "concat", "combine"]
        if (clustering_path_checkpoint.parent / "args.json").is_file():
            path_config = clustering_path_checkpoint.parent / "args.json"
        elif (clustering_path_checkpoint.parent
              / "checkpoint_args.json").is_file():
            path_config = (clustering_path_checkpoint.parent
                           / "checkpoint_args.json")
        else:
            raise RuntimeError(f"Args file not found in the directory "
                               f"{clustering_path_checkpoint.parent}")
        clustering_args = read_args(path_config)
        print(f"\nClutering args:\n"
              f"{json.dumps(vars(clustering_args), indent=4, sort_keys=True)}")
        print("-" * 50)

        level_gru = vars(clustering_args).get("level_gru", None)
        self.featureMaker = load_cpc_feature_maker(
            clustering_args.pathCheckpoint, encoder_layer=encoder_layer,
            keepHidden=keepHidden, gru_level=level_gru)
        n_features = self.featureMaker.out_feature_dim
        self.clusterModule = load_clustering_checkpoint(
            clustering_path_checkpoint)
        print("Checkpoint loaded!\n")

        self.dim_clusters = self.clusterModule.Ck.shape[-1]
        self.n_groups = n_features // self.dim_clusters
        assert n_features % self.dim_clusters == 0, \
            f"Number of features {n_features} must be divided by the " \
            f"dimension of clusters {self.dim_clusters}"

        self.pair2idx = None
        if self.n_groups > 1 and self.group_modes == "onehot":
            assert onehot_dict is not None, \
                "A dictionary must be given when there are more than one " \
                "group and in onehot mode!"
            with open(onehot_dict, "r") as f:
                lines = f.read().split("\n")
            self.pair2idx = {word.split()[0]: i
                             for i, word in enumerate(lines) if word}

    def feature_function(self, x):
        c_feature = np.asarray(buildFeature(self.featureMaker, x,
                                            seqNorm=False, strict=True,
                                            maxSizeSeq=64000))
        c_feature = c_feature.reshape(1, -1, self.dim_clusters)
        dist_clusters = np.asarray(self.clusterModule(c_feature))
        if self.soft_clustering:
            return dist_clusters[0]
        q_feature = np.argmin(dist_clusters, axis=-1)
        n_k = self.clusterModule.Ck.shape[1]
        if self.n_groups > 1:
            if self.group_modes == "seq":
                one_hot = _one_hot(q_feature[0], n_k)
            elif self.group_modes == "onehot":
                pairs = ["-".join(str(i) for i in item)
                         for item in q_feature[0].reshape(-1, 2)]
                idxs = np.asarray([self.pair2idx[p] for p in pairs])
                one_hot = _one_hot(idxs, len(self.pair2idx))
            elif self.group_modes == "concat":
                one_hot = _one_hot(q_feature[0], n_k)
                one_hot = one_hot.reshape(-1, n_k * self.n_groups)
            elif self.group_modes == "combine":
                idx_even = q_feature[0][::2]
                idx_odd = q_feature[0][1::2]
                one_hot = _one_hot(idx_even, n_k)
                one_hot[np.arange(len(idx_odd)), idx_odd] = 1.0
        else:
            one_hot = _one_hot(q_feature[0], n_k)
        s, n = one_hot.shape
        return one_hot.reshape(1, s, n)

    @property
    def step_feature_multiplication(self):
        if self.group_modes == "seq":
            return self.n_groups
        return 1


class QuantizedClustering:
    """Reference `eval_ABX_clustering.py:188-240`: features from a
    pre-computed `quantized_outputs.txt`."""

    def __init__(self, quantized_file, onehot_dict=None):
        self.frames_dict = {}
        with open(quantized_file, "r") as f:
            for line in f:
                if line.endswith("\n"):
                    line = line[:-1]
                filename, frames = line.split("\t")
                filename = splitext(basename(filename))[0]
                self.frames_dict[filename] = frames

        frames = next(iter(self.frames_dict.values()))
        if not frames.split(",")[0].isdigit():
            assert onehot_dict is not None, \
                "A dictionary must be given when the quantized outputs is " \
                "not digits (multi-group case)!"

        pair2idx = None
        if onehot_dict:
            print(f"\nLoading onehot dictionary from {onehot_dict}...")
            with open(onehot_dict, "r") as f:
                lines = f.read().split("\n")
            pair2idx = {word.split()[0]: i
                        for i, word in enumerate(lines) if word}

        self.n_units = -1
        for filename in self.frames_dict:
            frames = self.frames_dict[filename].split(",")
            if onehot_dict:
                idxs_seq = [pair2idx[item] for item in frames]
            else:
                idxs_seq = [int(item) for item in frames]
            self.n_units = max(self.n_units, max(idxs_seq))
            self.frames_dict[filename] = idxs_seq
        self.n_units += 1
        print(f"\nNumber of quantized units: {self.n_units}")

    def feature_function(self, x):
        filename = splitext(basename(str(x)))[0]
        idxs_seq = np.asarray(self.frames_dict[filename])
        one_hot = _one_hot(idxs_seq, self.n_units)
        n, s = one_hot.shape
        return one_hot.reshape(1, n, s)

    @property
    def step_feature_multiplication(self):
        return 1


def eval_ABX_Librispeech(path_data, path_item_file, feature_function,
                         modes="within", feature_size=0.01,
                         distance_mode="cosine", file_extension=".flac",
                         debug=False, path_output=None):
    """Reference `eval_ABX_clustering.py:243-307`."""
    save = path_output is not None
    assert modes in ["within", "across", "all"]
    assert distance_mode in ["cosine", "euclidian"]
    if save:
        assert not exists(path_output), \
            f"The output file {path_output} already exists!!"

    if modes in ["within", "across"]:
        modes = [modes]
    else:
        modes = ["within", "across"]

    step_feature = 1 / feature_size
    seq_list = list(Path(path_data).glob(f"**/*{file_extension}"))
    if debug:
        seq_list = seq_list[:100]
    seq_list = [(x.stem, str(x)) for x in seq_list]

    scores = ABX(feature_function, path_item_file, seq_list, distance_mode,
                 step_feature, modes, cuda=False, max_x_across=5,
                 max_size_group=10, normalize=True)

    if save:
        scores["args"] = {"modes": modes, "feature_size": feature_size,
                          "distance_mode": distance_mode,
                          "path_data": str(path_data),
                          "file_extension": file_extension, "debug": debug}
        if debug:
            scores["args"]["debug_size"] = len(seq_list)
        write_json(path_output, scores)
    return scores


def main(argv):
    parser = argparse.ArgumentParser(
        description="ABX Evaluation on CPC-clustering. Use either "
                    "--clustering pathClustering or --quantized "
                    "pathQuantized")
    group_type_input = parser.add_mutually_exclusive_group(required=True)
    group_type_input.add_argument("--quantized", type=str, default=None)
    group_type_input.add_argument("--clustering", type=str, default=None)
    parser.add_argument("--name-output", type=str, default=None)
    parser.add_argument("--modes", choices=["all", "within", "across"],
                        default="all")
    parser.add_argument("--feature-size", type=float, default=0.01)
    parser.add_argument("--gru", type=int, default=-1)
    parser.add_argument("--file-extension", type=str, default=".flac")
    parser.add_argument("--soft-clustering", "-s", action="store_true")
    parser.add_argument("--group-modes",
                        choices=["seq", "onehot", "concat", "combine"],
                        default="onehot")
    parser.add_argument("--onehot-dict", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--no-save", action="store_true")
    parser.add_argument("--path_audio_data", type=str, required=True)
    parser.add_argument("--path_abx_item", type=str, required=True)
    args = parser.parse_args(argv)

    if args.clustering:
        feature_maker = ClusteringFeatures(
            args.clustering, soft_clustering=args.soft_clustering,
            encoder_layer=False, keepHidden=True,
            group_modes=args.group_modes, onehot_dict=args.onehot_dict)
    else:
        feature_maker = QuantizedClustering(args.quantized,
                                            onehot_dict=args.onehot_dict)

    print(f"\nFeature function args:\n"
          f"{json.dumps(vars(args), indent=4, sort_keys=True)}")
    print("-" * 50)

    mult = feature_maker.step_feature_multiplication
    feature_size = (args.feature_size / mult if mult > 1
                    else args.feature_size)

    return eval_ABX_Librispeech(
        path_data=args.path_audio_data, path_item_file=args.path_abx_item,
        feature_function=feature_maker.feature_function, modes=args.modes,
        feature_size=feature_size, distance_mode="cosine",
        file_extension=args.file_extension, debug=args.debug,
        path_output=args.name_output)


if __name__ == "__main__":
    main(sys.argv[1:])
