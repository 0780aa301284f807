"""Streaming PCA and Slow Feature Analysis
(reference `cpc/criterion/research/dim_reduction.py`).

Numpy streaming moments on the host (the accumulation is O(D^2) per batch —
negligible), eigendecompositions via numpy; projections applied to device
arrays. State dicts interoperate with the reference's torch checkpoints
(same buffer names: var, mean, PCA_mul, PCA_values, covar_speed, ...).
"""

from __future__ import annotations

import argparse
import json
import os
import numpy as np


class PCA:
    """Streaming-moment PCA (reference `dim_reduction.py:13-62`)."""

    def __init__(self, k: int):
        self.building = True
        self.var = np.zeros((k, k), np.float64)
        self.mean = np.zeros(k, np.float64)
        self.PCA_mul = np.zeros((1, k, k), np.float32)
        self.PCA_values = np.zeros(k, np.float32)
        self.N = 0
        self.normalize = True

    def update(self, x):
        x = np.asarray(x)
        if x.ndim == 3:
            x = x.reshape(-1, x.shape[2])
        assert x.ndim == 2 and x.shape[1] == self.mean.shape[0]
        self.var += x.T @ x
        self.mean += x.sum(axis=0)
        self.N += x.shape[0]

    def build(self, normalize: bool = True):
        self.normalize = normalize
        self.var = self.var / self.N
        self.mean = self.mean / self.N
        self.var = self.var - np.outer(self.mean, self.mean)
        k = self.var.shape[0]
        e_vals, e_vects = np.linalg.eigh(self.var)
        self.PCA_mul = e_vects.T.reshape(1, k, k).astype(np.float32)
        self.PCA_values = e_vals.astype(np.float32)
        self.building = False

    def __call__(self, x):
        x = np.asarray(x, np.float32)
        reshape = x.ndim == 3
        if reshape:
            b, s, _ = x.shape
            x = x.reshape(b * s, -1)
        assert not self.building
        x = x - self.mean.astype(np.float32)
        x = x @ self.PCA_mul[0].T
        if reshape:
            x = x.reshape(b, s, -1)
        return x

    def state_dict(self):
        return {'var': self.var, 'mean': self.mean, 'PCA_mul': self.PCA_mul,
                'PCA_values': self.PCA_values}

    def load_state_dict(self, sd):
        for key in ('var', 'mean', 'PCA_mul', 'PCA_values'):
            setattr(self, key, np.asarray(
                sd[key].numpy() if hasattr(sd[key], 'numpy') else sd[key]))


class SFALinear:
    """Slow Feature Analysis with Cholesky-whitened speed covariance
    (reference `dim_reduction.py:65-148`)."""

    def __init__(self, k: int):
        self.covar_speed = np.zeros((k, k), np.float64)
        self.mean_x = np.zeros(k, np.float64)
        self.square_x = np.zeros(k, np.float64)
        self.covar_x = np.zeros((k, k), np.float64)
        self.normalizer = np.zeros((1, k, k), np.float32)
        self.PCA_mul = np.zeros((1, k, k), np.float32)
        self.PCA_values = np.zeros(k, np.float32)
        self.projection = np.zeros((1, k, k), np.float32)
        self.N_speed = 0
        self.N_x = 0
        self.k = k
        self.building = True

    def update(self, x):
        x = np.asarray(x)
        assert x.ndim == 3 and x.shape[2] == self.k
        n, s, k = x.shape
        x = x[:, 1:]
        xt = (x[:, 1:] - x[:, :-1]).reshape(-1, k)
        self.covar_speed += xt.T @ xt
        self.N_speed += n * (s - 1)
        self.mean_x += x.sum(axis=(0, 1))
        self.square_x += (x ** 2).sum(axis=(0, 1))
        xp = x.reshape(-1, k)
        self.covar_x += xp.T @ xp
        self.N_x += n * s

    def build(self):
        self.mean_x = self.mean_x / self.N_x
        self.covar_x = self.covar_x / self.N_x
        self.covar_x = self.covar_x - np.outer(self.mean_x, self.mean_x)

        self.square_x = self.square_x / self.N_x
        self.square_x = np.sqrt(np.clip(
            self.square_x - self.mean_x * self.mean_x, 0, None))
        inv_square_x = 1 / (self.square_x + 1e-08)

        covar_x_normalized = (inv_square_x[:, None] * self.covar_x
                              * inv_square_x[None, :])
        l_ = np.linalg.inv(np.linalg.cholesky(covar_x_normalized))
        self.normalizer = l_.reshape(1, self.k, self.k).astype(np.float32)

        self.covar_speed = self.covar_speed / self.N_speed
        self.covar_speed = (inv_square_x[:, None] * self.covar_speed
                            * inv_square_x[None, :])
        self.covar_speed = l_ @ self.covar_speed @ l_.T

        e_vals, e_vects = np.linalg.eigh(self.covar_speed)
        k = e_vects.shape[0]
        self.PCA_mul = e_vects.T.reshape(1, k, k).astype(np.float32)
        self.PCA_values = e_vals.astype(np.float32)
        self.building = False
        self.projection = self.PCA_mul.copy()

    def selectDimensions(self, index_vector):
        index_vector = np.asarray(index_vector)
        self.projection = self.PCA_mul[0][index_vector > 0].reshape(
            1, -1, self.k)

    def __call__(self, x):
        assert not self.building
        x = np.asarray(x, np.float32)
        n, s, k = x.shape
        x = x.reshape(-1, k)
        x = x - self.mean_x.astype(np.float32)[None, :]
        x = x / (self.square_x.astype(np.float32)[None, :] + 1e-08)
        x = x @ self.normalizer[0].T
        x = x @ self.projection[0].T
        return x.reshape(n, s, -1)

    def state_dict(self):
        return {'covar_speed': self.covar_speed, 'mean_x': self.mean_x,
                'square_x': self.square_x, 'covar_x': self.covar_x,
                'normalizer': self.normalizer, 'PCA_mul': self.PCA_mul,
                'PCA_values': self.PCA_values,
                'projection': self.projection}

    def load_state_dict(self, sd):
        for key in self.state_dict():
            if key in sd:
                v = sd[key]
                setattr(self, key, np.asarray(
                    v.numpy() if hasattr(v, 'numpy') else v))


def buildPCA(dataLoader, featureMaker, k, normalize=False):
    out = PCA(k)
    print("Performing the PCA...")
    for index, data in enumerate(dataLoader):
        out.update(np.asarray(featureMaker(data)))
    out.build(normalize=normalize)
    return out


def buildSFA(dataLoader, featureMaker, k):
    out = SFALinear(k)
    if hasattr(featureMaker, 'collapse'):
        featureMaker.collapse = False
    print("Performing the SFA...")
    for index, data in enumerate(dataLoader):
        out.update(np.asarray(featureMaker(data)))
    out.build()
    return out


def loadDimReduction(path, centroidLimits):
    """Load a reference-format dim-reduction checkpoint
    (`dim_reduction.py:186-201`)."""
    import torch
    state_dict = torch.load(path, map_location='cpu', weights_only=False)
    if state_dict["type"] == "PCA":
        dim_red = PCA(state_dict["inDim"])
    elif state_dict["type"] == "SFA":
        dim_red = SFALinear(state_dict["inDim"])
    else:
        raise ValueError(f"Invalid module type {state_dict['type']}")
    dim_red.load_state_dict(state_dict["state_dict"])
    dim_red.building = False
    if centroidLimits is not None:
        centroids_vals = np.asarray(state_dict["centroid_values"])
        dim_red.selectDimensions(
            (centroids_vals > centroidLimits[0])
            * (centroids_vals < centroidLimits[1]))
    return dim_red


def main(argv):
    """CLI mirroring the reference's `dim_reduction.py` __main__ block."""
    import sys
    from random import shuffle
    from ..data.corpus import findAllSeqs, filterSeqs
    from ..data.dataset import AudioBatchData
    from ..feature_loader import FeatureModule, loadModel
    from ..io.checkpoint import get_checkpoint_data

    parser = argparse.ArgumentParser(
        description='Dim reduction. Performing either a PCA or a SFA')
    parser.add_argument('pathCheckpoint', type=str)
    parser.add_argument('pathOut', type=str)
    parser.add_argument('--pathDB', type=str, required=True)
    parser.add_argument('--seqList', type=str, default=None)
    parser.add_argument('--recursionLevel', type=int, default=2)
    parser.add_argument('--extension', type=str, default='.flac')
    parser.add_argument('--mode', type=str, default='SFA',
                        choices=['PCA', 'SFA'])
    parser.add_argument('--debug', action='store_true')
    parser.add_argument('--batchSize', type=int, default=8)
    parser.add_argument('--sizeWindow', type=int, default=20480)
    args = parser.parse_args(argv)

    seqNames, speakers = findAllSeqs(args.pathDB,
                                     speaker_level=args.recursionLevel,
                                     extension=args.extension)
    if args.seqList is not None:
        seqNames = filterSeqs(args.seqList, seqNames)
    if args.debug:
        shuffle(seqNames)
        seqNames = seqNames[:100]

    dataset = AudioBatchData(args.pathDB, args.sizeWindow, seqNames, None,
                             len(speakers))
    train_loader = dataset.getDataLoader(args.batchSize, "sequential", False)

    bundle = loadModel([args.pathCheckpoint])[0]
    feature_maker = FeatureModule(bundle, False, keep_hidden=True)

    model_args = get_checkpoint_data(
        os.path.dirname(args.pathCheckpoint))[2]
    out_dim = model_args.hiddenGar

    if args.mode == 'SFA':
        feature_maker.collapse = False
        dim_reduction = buildSFA(train_loader, feature_maker, out_dim)
    else:
        dim_reduction = buildPCA(train_loader, feature_maker, out_dim)

    import torch
    out_state_dict = {"state_dict": {k: torch.from_numpy(np.array(v))
                                     for k, v in dim_reduction.state_dict().items()},
                      "inDim": out_dim,
                      "type": args.mode}
    torch.save(out_state_dict, args.pathOut)
    path_args = f"{os.path.splitext(args.pathOut)[0]}_args.json"
    with open(path_args, 'w') as f:
        json.dump(vars(args), f, indent=2)


if __name__ == "__main__":
    import sys
    main(sys.argv[1:])
