"""ABX discriminability of *discrete* representations.

Covers the same CLI surface as the reference's clustering-ABX driver
(`cpc/eval/eval_ABX_clustering.py`): score either

* a clustering checkpoint applied on-the-fly to CPC features
  (``--clustering``), emitting hard one-hot unit indicators (or soft
  cluster distances with ``--soft-clustering``), or
* a pre-computed ``quantized_outputs.txt`` table (``--quantized``).

Everything downstream funnels into the dense-board ABX machinery in
:mod:`cpc2_tpu.eval.eval_ABX`.

Design notes (this file is a re-formulation, not a port): unit-id
sequences are treated as the primary object, one-hot expansion is a
single helper, and the four multi-group layouts (seq / onehot / concat /
combine) are a table of small pure functions over the ``(T, G)`` id
matrix rather than a branch ladder. The flag names, defaults, and JSON
output layout are kept reference-compatible.

Run: ``python -m cpc2_tpu.eval.eval_ABX_clustering --clustering <ckpt>
--path_audio_data <dir> --path_abx_item <item>`` (or ``--quantized
quantized_outputs.txt ...``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

from ..clustering.clustering import load_clustering_checkpoint
from ..feature_loader import FeatureModule, buildFeature, loadModel
from .eval_ABX import ABX


# ---------------------------------------------------------------------------
# small pure helpers
# ---------------------------------------------------------------------------

def indicator(ids: np.ndarray, width: int) -> np.ndarray:
    """(T,) int ids -> (T, width) float32 one-hot rows."""
    return np.eye(width, dtype=np.float32)[np.asarray(ids, np.int64)]


def load_pair_vocabulary(path) -> dict:
    """Multi-group token vocabulary: each nonempty line is ``token ...``;
    the token (e.g. ``65-241``) maps to its line rank."""
    vocab = {}
    with open(path, "r") as f:
        for line in f:
            fields = line.split()
            if fields:
                vocab[fields[0]] = len(vocab)
    return vocab


def parse_quantized_table(path) -> dict:
    """``quantized_outputs.txt`` -> {file stem: raw comma-joined frames}."""
    table = {}
    with open(path, "r") as f:
        for line in f:
            name, _, frames = line.rstrip("\n").partition("\t")
            stem = Path(name).stem
            table[stem] = frames
    return table


def _stack_groups(ids: np.ndarray, n_groups: int) -> np.ndarray:
    """(T*G,) interleaved ids -> (T, G)."""
    return np.asarray(ids, np.int64).reshape(-1, n_groups)


# Multi-group layouts. Each entry maps the (T, G) id matrix to the 2-D
# feature matrix the ABX stack consumes; `vocab` is only used by 'onehot'.
#   seq     — groups unrolled along time: (T*G, n_units), frame rate × G
#   concat  — per-frame concatenation of the G indicators: (T, G*n_units)
#   combine — union of the G indicators in one n_units-wide row (G==2)
#   onehot  — each id *tuple* is one token in a provided vocabulary
def _merge_seq(idm, n_units, vocab):
    return indicator(idm.reshape(-1), n_units)


def _merge_concat(idm, n_units, vocab):
    return indicator(idm.reshape(-1), n_units).reshape(idm.shape[0], -1)


def _merge_combine(idm, n_units, vocab):
    per_group = [indicator(idm[:, g], n_units) for g in range(idm.shape[1])]
    out = per_group[0]
    for other in per_group[1:]:
        out = np.maximum(out, other)
    return out


def _merge_onehot(idm, n_units, vocab):
    tokens = ["-".join(str(v) for v in row) for row in idm]
    return indicator(np.array([vocab[t] for t in tokens]), len(vocab))


GROUP_MERGERS = {
    "seq": _merge_seq,
    "concat": _merge_concat,
    "combine": _merge_combine,
    "onehot": _merge_onehot,
}


def _find_run_config(checkpoint: Path) -> Path:
    """Locate the clustering run's serialized args next to its checkpoint
    (the clustering CLI writes ``args.json``; training-style directories
    use ``checkpoint_args.json``)."""
    for candidate in ("args.json", "checkpoint_args.json"):
        p = checkpoint.parent / candidate
        if p.is_file():
            return p
    raise RuntimeError(
        f"No args.json / checkpoint_args.json next to {checkpoint} — "
        f"cannot recover the clustering run's configuration")


def read_args(pathArgs):
    print(f"Loading args from {pathArgs}")
    with open(pathArgs, "r") as f:
        return argparse.Namespace(**json.load(f))


def write_json(filepath, scores):
    Path(filepath).parent.mkdir(parents=True, exist_ok=True)
    with open(filepath, "w") as f:
        json.dump(scores, f, indent=2)


def load_cpc_feature_maker(CPC_path_checkpoint, encoder_layer=False,
                           keepHidden=True, gru_level=-1):
    """CPC checkpoint -> stateful FeatureModule, optionally truncated to an
    intermediate recurrent level (``gru_level``)."""
    overrides = None
    if gru_level is not None and gru_level > 0:
        overrides = argparse.Namespace(nLevelsGRU=gru_level)
    bundle, _, _ = loadModel([CPC_path_checkpoint], loadStateDict=True,
                             updateConfig=overrides)
    print(f"Feature maker ready ({CPC_path_checkpoint})")
    return FeatureModule(bundle, get_encoded=encoder_layer,
                         keep_hidden=keepHidden)


# ---------------------------------------------------------------------------
# feature sources
# ---------------------------------------------------------------------------

class ClusteringFeatures:
    """Quantize CPC features through a clustering checkpoint on the fly.

    Parity surface: reference ``eval_ABX_clustering.py`` (ClusteringFeatures);
    same constructor signature and group modes, restructured around the
    GROUP_MERGERS table.
    """

    def __init__(self, clustering_path_checkpoint, soft_clustering=False,
                 encoder_layer=False, keepHidden=True, group_modes="concat",
                 onehot_dict=None):
        if group_modes not in GROUP_MERGERS:
            raise ValueError(f"Unknown group mode {group_modes!r}; "
                             f"expected one of {sorted(GROUP_MERGERS)}")
        ckpt = Path(clustering_path_checkpoint)
        if ckpt.suffix != ".pt":
            raise ValueError(f"Expected a .pt clustering checkpoint, "
                             f"got {ckpt}")
        self.group_modes = group_modes
        self.soft_clustering = soft_clustering

        run_args = read_args(_find_run_config(ckpt))
        print("\nClustering args:\n"
              + json.dumps(vars(run_args), indent=4, sort_keys=True))
        print("-" * 50)

        self.featureMaker = load_cpc_feature_maker(
            run_args.pathCheckpoint, encoder_layer=encoder_layer,
            keepHidden=keepHidden,
            gru_level=vars(run_args).get("level_gru", None))
        self.clusterModule = load_clustering_checkpoint(ckpt)

        feat_dim = self.featureMaker.out_feature_dim
        self.dim_clusters = self.clusterModule.Ck.shape[-1]
        if feat_dim % self.dim_clusters:
            raise ValueError(
                f"Feature dim {feat_dim} is not a multiple of the cluster "
                f"dim {self.dim_clusters} — group split impossible")
        self.n_groups = feat_dim // self.dim_clusters

        self.pair2idx = None
        if self.n_groups > 1 and self.group_modes == "onehot":
            assert onehot_dict is not None, (
                "onehot grouping over multiple groups needs --onehot-dict "
                "(the unit-tuple vocabulary)")
            self.pair2idx = load_pair_vocabulary(onehot_dict)
        self._cpc_cache = {}

    def prime(self, paths):
        """Batch-extract the CPC features for `paths` up front through the
        streamed corpus API (worker-thread decode, same-length batching,
        meshed on multi-device hosts); per-file features match the lazy
        per-file path to float precision."""
        from ..feature_loader import build_feature_files
        self._cpc_cache.update(build_feature_files(
            self.featureMaker, paths, seqNorm=False, strict=True,
            maxSizeSeq=64000))

    def feature_function(self, x):
        cached = self._cpc_cache.get(str(x))
        feats = np.asarray(cached if cached is not None
                           else buildFeature(self.featureMaker, x,
                                             seqNorm=False, strict=True,
                                             maxSizeSeq=64000))
        # regroup the feature channels into per-group cluster spaces
        feats = feats.reshape(1, -1, self.dim_clusters)
        dists = np.asarray(self.clusterModule(feats))
        if self.soft_clustering:
            return dists[0]
        units = np.argmin(dists, axis=-1)[0]
        n_units = self.clusterModule.Ck.shape[1]
        if self.n_groups > 1:
            merger = GROUP_MERGERS[self.group_modes]
            flat = merger(_stack_groups(units, self.n_groups), n_units,
                          self.pair2idx)
        else:
            flat = indicator(units, n_units)
        return flat[None]

    @property
    def step_feature_multiplication(self):
        # 'seq' unrolls the G groups along time, multiplying the frame rate
        return self.n_groups if self.group_modes == "seq" else 1


class QuantizedClustering:
    """Replay unit ids from a pre-computed ``quantized_outputs.txt``.

    Parity surface: reference ``eval_ABX_clustering.py``
    (QuantizedClustering). Single-group tables hold plain ints; multi-group
    tables hold ``-``-joined tuples and need the vocabulary file.
    """

    def __init__(self, quantized_file, onehot_dict=None):
        raw = parse_quantized_table(quantized_file)
        sample = next(iter(raw.values())).split(",")[0]
        multi_group = not sample.isdigit()
        assert not multi_group or onehot_dict is not None, (
            "multi-group quantized outputs (tokens like '65-241') need "
            "--onehot-dict to map tuples to unit ids")

        vocab = None
        if onehot_dict:
            print(f"\nLoading onehot dictionary from {onehot_dict}...")
            vocab = load_pair_vocabulary(onehot_dict)

        self.frames_dict = {}
        top = -1
        for stem, frames in raw.items():
            tokens = frames.split(",")
            ids = ([vocab[t] for t in tokens] if vocab
                   else [int(t) for t in tokens])
            top = max(top, max(ids))
            self.frames_dict[stem] = ids
        self.n_units = top + 1
        print(f"\nNumber of quantized units: {self.n_units}")

    def feature_function(self, x):
        ids = self.frames_dict[Path(str(x)).stem]
        return indicator(np.asarray(ids), self.n_units)[None]

    @property
    def step_feature_multiplication(self):
        return 1


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def eval_ABX_Librispeech(path_data, path_item_file, feature_function,
                         modes="within", feature_size=0.01,
                         distance_mode="cosine", file_extension=".flac",
                         debug=False, path_output=None):
    """Score one feature source over a corpus; optionally persist the JSON.

    Parity surface: reference ``eval_ABX_clustering.py``
    (eval_ABX_Librispeech) — same kwargs, same score/args JSON layout.
    """
    if modes not in ("within", "across", "all"):
        raise ValueError(f"bad mode {modes!r}")
    if distance_mode not in ("cosine", "euclidian"):
        raise ValueError(f"bad distance {distance_mode!r}")
    if path_output is not None and os.path.exists(path_output):
        raise FileExistsError(
            f"Refusing to overwrite existing output {path_output}")

    mode_list = ["within", "across"] if modes == "all" else [modes]

    found = sorted(Path(path_data).glob(f"**/*{file_extension}"))
    if debug:
        found = found[:100]
    seq_list = [(p.stem, str(p)) for p in found]

    # Feature sources that can pre-extract (ClusteringFeatures) do the
    # whole item-file-referenced corpus up front in batched programs
    # instead of one lazy chunk loop per file.
    owner = getattr(feature_function, '__self__', None)
    if hasattr(owner, 'prime'):
        from .abx.abx_iterators import load_item_file
        needed = set(load_item_file(path_item_file)[0].keys())
        owner.prime([p for stem, p in seq_list if stem in needed])

    scores = ABX(feature_function, path_item_file, seq_list, distance_mode,
                 1.0 / feature_size, mode_list, cuda=False, max_x_across=5,
                 max_size_group=10, normalize=True)

    if path_output is not None:
        scores["args"] = {"modes": mode_list, "feature_size": feature_size,
                          "distance_mode": distance_mode,
                          "path_data": str(path_data),
                          "file_extension": file_extension, "debug": debug}
        if debug:
            scores["args"]["debug_size"] = len(seq_list)
        write_json(path_output, scores)
    return scores


def _build_feature_source(args):
    if args.clustering:
        return ClusteringFeatures(
            args.clustering, soft_clustering=args.soft_clustering,
            encoder_layer=False, keepHidden=True,
            group_modes=args.group_modes, onehot_dict=args.onehot_dict)
    return QuantizedClustering(args.quantized, onehot_dict=args.onehot_dict)


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description="ABX over discrete units: quantize through a clustering "
                    "checkpoint (--clustering) or replay a precomputed "
                    "table (--quantized)")
    source = parser.add_mutually_exclusive_group(required=True)
    source.add_argument("--quantized", type=str, default=None)
    source.add_argument("--clustering", type=str, default=None)
    parser.add_argument("--name-output", type=str, default=None)
    parser.add_argument("--modes", choices=["all", "within", "across"],
                        default="all")
    parser.add_argument("--feature-size", type=float, default=0.01)
    parser.add_argument("--gru", type=int, default=-1)
    parser.add_argument("--file-extension", type=str, default=".flac")
    parser.add_argument("--soft-clustering", "-s", action="store_true")
    parser.add_argument("--group-modes", choices=sorted(GROUP_MERGERS),
                        default="onehot")
    parser.add_argument("--onehot-dict", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--no-save", action="store_true")
    parser.add_argument("--path_audio_data", type=str, required=True)
    parser.add_argument("--path_abx_item", type=str, required=True)
    return parser.parse_args(argv)


def main(argv):
    args = parse_args(argv)
    source = _build_feature_source(args)

    print("\nFeature function args:\n"
          + json.dumps(vars(args), indent=4, sort_keys=True))
    print("-" * 50)

    # 'seq' grouping emits G frames per model frame — the item-file time
    # stamps must be mapped at the densified rate
    rate_divisor = source.step_feature_multiplication
    return eval_ABX_Librispeech(
        path_data=args.path_audio_data, path_item_file=args.path_abx_item,
        feature_function=source.feature_function, modes=args.modes,
        feature_size=args.feature_size / max(rate_divisor, 1),
        distance_mode="cosine", file_extension=args.file_extension,
        debug=args.debug, path_output=args.name_output)


if __name__ == "__main__":
    main(sys.argv[1:])
