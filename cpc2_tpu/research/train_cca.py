"""Fit a CCA projection between the representation spaces of two CPC
checkpoints (parity surface: `cpc/criterion/cca/train_cca.py` — same CLI
flags and output artifacts, own pipeline).

The projection aligns model X's feature space with model Y's; at
inference `FeatureModule(cca_projection=...)` applies the X-side
rotation. Artifacts written to --path_output:

* ``cca_model_n_components_<n>.pkl`` — the pickled fitted sklearn CCA;
* ``CCA_info_args.json`` — the CLI arguments of the fit.

Run: ``python -m cpc2_tpu.research.train_cca --path_cp_X ... --path_cp_Y
... --path_db ... --path_output ...``
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description='Fit a CCA aligning the representations of two CPC '
                    'checkpoints over a shared corpus.')
    p.add_argument('--path_cp_X', type=str,
                   help='Checkpoint whose features form the X view.')
    p.add_argument('--path_cp_Y', type=str,
                   help='Checkpoint whose features form the Y view.')
    p.add_argument('--path_db', type=str,
                   help='Audio corpus both views are extracted from.')
    p.add_argument('--path_output', type=str,
                   help='Directory for the pickled CCA + args record.')
    p.add_argument('--n_components', type=int, default=100,
                   help='Dimension of the shared CCA space.')
    p.add_argument('--file_extension', type=str, default=".wav")
    p.add_argument('--max_size_seq', type=int, default=10240,
                   help='Chunk length (samples) for feature extraction.')
    p.add_argument('--batch_size', type=int, default=8,
                   help='Chunks per forward in the batched extractor.')
    p.add_argument('--strict', type=bool, default=True)
    p.add_argument('--debug', action='store_true',
                   help='Cap the corpus at 1000 files.')
    p.add_argument('--no_batch', action='store_true',
                   help='Chunk-sequential extraction with hidden carry '
                   'instead of the batched splitter.')
    p.add_argument('--cpu', action='store_true',
                   help='(accepted for reference CLI parity; device '
                   'selection is automatic here)')
    return p


def corpus_files(path_db: str, extension: str):
    """All corpus files (relative paths), tolerating a stale
    `_seqs_cache.txt` written for a different extension: if the cached
    list's entries don't carry `extension`, rescan the tree."""
    from ..data.corpus import findAllSeqs

    found, _ = findAllSeqs(path_db, speaker_level=0, extension=extension,
                           loadCache=True)
    stale = found and not os.path.splitext(found[0][1])[1].endswith(
        extension)
    if stale or not found:
        found, _ = findAllSeqs(path_db, speaker_level=0,
                               extension=extension, loadCache=False)
    return [rel for _, rel in found]


def checkpoint_extractor(cp_path: str, *, no_batch: bool, strict: bool,
                         max_size_seq: int, batch_size: int):
    """Build `extract(file_path) -> (T, D) ndarray` for one checkpoint.

    The checkpoint's own training config (sibling ``checkpoint_args.json``)
    decides whether features come from the context network or the encoder
    (`onEncoder`), mirroring how every other eval consumer loads models."""
    from ..feature_loader import (FeatureModule, buildFeature,
                                  buildFeature_batch, loadModel)

    if not cp_path.endswith('.pt'):
        raise ValueError(f"expected a .pt checkpoint, got {cp_path}")
    if not os.path.exists(cp_path):
        raise FileNotFoundError(cp_path)
    cfg_path = os.path.join(os.path.dirname(cp_path),
                            "checkpoint_args.json")
    with open(cfg_path) as f:
        on_encoder = json.load(f).get('onEncoder', False)

    bundle = loadModel([cp_path])[0]
    module = FeatureModule(bundle, on_encoder, keep_hidden=no_batch)

    def extract(file_path: str) -> np.ndarray:
        if no_batch:
            feats = buildFeature(module, file_path, seqNorm=False,
                                 strict=strict)
        else:
            feats = buildFeature_batch(module, file_path, seqNorm=False,
                                       strict=strict,
                                       maxSizeSeq=max_size_seq,
                                       batch_size=batch_size)
        return np.asarray(feats)[0]          # (1, T, D) -> (T, D)

    return extract


def main(argv):
    args = build_parser().parse_args(argv)

    os.makedirs(args.path_output, exist_ok=True)
    with open(os.path.join(args.path_output, "CCA_info_args.json"),
              'w') as f:
        json.dump(vars(args), f, indent=2)

    files = corpus_files(args.path_db, args.file_extension)
    if args.debug:
        files = files[:1000]
    if not files:
        raise RuntimeError(
            f"no {args.file_extension} files under {args.path_db} to fit "
            "the CCA on")
    print(f"CCA fit over {len(files)} files from {args.path_db}")

    opts = dict(no_batch=args.no_batch, strict=args.strict,
                max_size_seq=args.max_size_seq,
                batch_size=args.batch_size)
    extract_x = checkpoint_extractor(args.path_cp_X, **opts)
    extract_y = checkpoint_extractor(args.path_cp_Y, **opts)

    t0 = time.time()
    views = {'x': [], 'y': []}
    for rel in files:
        path = os.path.join(args.path_db, rel)
        views['x'].append(extract_x(path))
        views['y'].append(extract_y(path))
    mat_x = np.vstack(views['x'])
    mat_y = np.vstack(views['y'])
    print(f"extracted {mat_x.shape[0]} frames per view "
          f"in {time.time() - t0:.1f}s")

    from sklearn.cross_decomposition import CCA
    cca = CCA(n_components=args.n_components)
    cca.fit(mat_x, mat_y)

    out = os.path.join(args.path_output,
                       f"cca_model_n_components_{args.n_components}.pkl")
    with open(out, 'wb') as f:
        pickle.dump(cca, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
