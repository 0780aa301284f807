"""k-means / DP-means quantization (reference `cpc/clustering/clustering.py`).

TPU-first design
----------------
One Lloyd step is two MXU matmuls instead of the reference's python loop over
clusters (`clustering.py:44-53`):

* distances: `||f||² - 2 f·Cᵀ + ||C||²` — an (N, D) x (D, k) matmul;
* accumulation: `onehot(assign)ᵀ @ f` — a (k, N) x (N, D) matmul — plus a
  column-sum for counts.

Everything is jitted with static shapes; DP-means' growing cluster count is
handled by padding the centroid table to blocks of 128 (MXU lane width) with
masked slots, so XLA recompiles only when k crosses a block boundary.

Checkpoint format parity: `{state_dict: {Ck}, n_clusters, dim, iteration,
last_diff, mode}` torch pickles (`clustering.py:58-72`), readable by the
reference code unchanged.
"""

from __future__ import annotations

import functools
import logging
from os import remove
from pathlib import Path
from time import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Distance/assignment kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def _sq_distances(features: Array, ck: Array) -> Array:
    """(N, D), (k, D) -> (N, k) squared L2, via one MXU matmul."""
    f2 = jnp.sum(jnp.square(features), axis=1, keepdims=True)
    c2 = jnp.sum(jnp.square(ck), axis=1)[None, :]
    cross = jnp.dot(features, ck.T, preferred_element_type=jnp.float32)
    return f2 - 2.0 * cross + c2


@jax.jit
def _lloyd_accumulate(features: Array, ck: Array
                      ) -> Tuple[Array, Array]:
    """One assignment+accumulate step: returns (sums (k, D), counts (k,))."""
    d = _sq_distances(features, ck)
    assign = jnp.argmin(d, axis=1)
    onehot = jax.nn.one_hot(assign, ck.shape[0], dtype=features.dtype)
    sums = jnp.einsum('nk,nd->kd', onehot, features,
                      preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    return sums, counts


@jax.jit
def _lloyd_accumulate_weighted(features: Array, ck: Array, w: Array
                               ) -> Tuple[Array, Array]:
    """Row-weighted accumulate: zero-weight rows are assigned but contribute
    nothing — the pad-and-mask form that keeps the mesh-sharded path exactly
    equal to the unpadded math (`parallel.mesh.pad_rows`)."""
    d = _sq_distances(features, ck)
    assign = jnp.argmin(d, axis=1)
    onehot = (jax.nn.one_hot(assign, ck.shape[0], dtype=features.dtype)
              * w[:, None])
    sums = jnp.einsum('nk,nd->kd', onehot, features,
                      preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    return sums, counts


class _EvalSharder:
    """Commits eval-loop operands onto the local data mesh so XLA's SPMD
    partitioner data-parallelizes the jitted accumulate/assign programs —
    the TPU analogue of the reference's `DataParallel(kMeanClusterStep)`
    (`clustering.py:132-134`). Single-device (or multi-process) runs get a
    no-op sharder; N-divisible batches commit without padding, ragged ones
    go through the weighted pad-and-mask path."""

    def __init__(self, mesh='auto'):
        if mesh == 'auto':
            mesh = None
            if jax.process_count() == 1 and len(jax.local_devices()) > 1:
                from ..parallel.mesh import eval_mesh
                mesh = eval_mesh()
        self.mesh = mesh
        self.n_dev = 1 if mesh is None else mesh.devices.size
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import batch_pspec, data_axes
            self._rows = NamedSharding(mesh, batch_pspec(mesh, 2))
            self._vec = NamedSharding(mesh, PartitionSpec(data_axes(mesh)))
            self._repl = NamedSharding(mesh, PartitionSpec())

    def replicated(self, arr):
        if self.mesh is None:
            return jnp.asarray(arr)
        return jax.device_put(jnp.asarray(arr), self._repl)

    def accumulate(self, features, ck):
        """Mesh-aware `_lloyd_accumulate` over an (N, D) feature matrix."""
        if self.mesh is None:
            return _lloyd_accumulate(jnp.asarray(features), ck)
        if features.shape[0] % self.n_dev == 0:
            feats = jax.device_put(jnp.asarray(features), self._rows)
            return _lloyd_accumulate(feats, ck)
        from ..parallel.mesh import pad_rows
        feats, w = pad_rows(np.asarray(features), multiple=self.n_dev)
        return _lloyd_accumulate_weighted(
            jax.device_put(feats, self._rows), ck,
            jax.device_put(w, self._vec))

    def rows(self, features):
        """Commit an (N, D) matrix row-sharded when divisible (assign-only
        programs need no weights: callers drop the outputs of pad rows)."""
        if self.mesh is None or features.shape[0] % self.n_dev:
            return jnp.asarray(features)
        return jax.device_put(jnp.asarray(features), self._rows)


class kMeanCluster:
    """Distance module (B, S, D) -> (B, S, k) squared-L2 to each centroid
    (reference `clustering.py:24-34`). Ck: (1, k, D)."""

    def __init__(self, Ck):
        self.Ck = jnp.asarray(np.asarray(Ck), jnp.float32)
        self.k = self.Ck.shape[1]

    def __call__(self, features: Array) -> Array:
        b, s, d = features.shape
        flat = jnp.asarray(features).reshape(b * s, d)
        dist = _sq_distances(flat, self.Ck[0])
        return dist.reshape(b, s, self.k)


class kMeanClusterStep:
    """One Lloyd assignment+accumulate step over a feature batch, returning
    (per-cluster sums (k, D), per-cluster counts (k,)) — the reference wraps
    this in an nn.Module purely so DataParallel can split the batch
    (`clustering.py:37-53`); here the jitted accumulate runs on whatever
    mesh the caller shards over."""

    def __init__(self, k_mean_cluster: kMeanCluster):
        self.module = k_mean_cluster
        self.k = k_mean_cluster.k

    def __call__(self, features: Array) -> Tuple[Array, Array]:
        b, s, d = features.shape
        flat = jnp.asarray(features).reshape(b * s, d)
        return _lloyd_accumulate(flat, self.module.Ck[0])


def save_clustering_checkpoint(Ck, path_out, mode=None, iter=None,
                               last_diff=None):
    """Reference format (`clustering.py:58-72`), torch pickle."""
    import torch
    out = {"state_dict": {"Ck": torch.from_numpy(
               np.ascontiguousarray(np.asarray(Ck)))},
           "n_clusters": int(np.asarray(Ck).shape[1]),
           "dim": int(np.asarray(Ck).shape[2]),
           "iteration": iter,
           "last_diff": last_diff,
           "mode": mode}
    torch.save(out, path_out)


def load_clustering_checkpoint(path) -> kMeanCluster:
    import torch
    print(f"Loading ClusterModule at {path}")
    state_dict = torch.load(path, map_location='cpu', weights_only=False)
    return kMeanCluster(state_dict["state_dict"]["Ck"].numpy())


# Reference-spelled alias
loadClusterModule = load_clustering_checkpoint


def get_last_checkpoint(path_in):
    checkpoint_list = list(Path(path_in).glob("checkpoint_*.pt"))
    valid = [x for x in checkpoint_list if x.stem.split("_")[-1].isdigit()]
    valid.sort(key=lambda x: int(x.stem.split("_")[-1]))
    if len(valid) == 0:
        raise RuntimeError("No checkpoint found")
    return valid[-1]


def _setup_log_file(save_dir):
    return logging.FileHandler(Path(save_dir) / "training_logs.txt")


# ---------------------------------------------------------------------------
# Mini-batch k-means (reference `clustering.py:90-205`)
# ---------------------------------------------------------------------------

def kMeanGPU(dataLoader, featureMaker, k, n_group=1, MAX_ITER=100,
             EPSILON=1e-4, perIterSize=-1, start_clusters=None,
             save_dir=None, save_last=5, mesh='auto'):
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("Kmean")
    save = save_dir is not None
    if save:
        save_dir = Path(save_dir)
        logger.addHandler(_setup_log_file(save_dir))

    logger.info(f"Start Kmean clustering with {k} clusters and {n_group} "
                f"groups...")

    if start_clusters is None:
        init_feats = []
        for index, data in enumerate(dataLoader):
            c_feature = np.asarray(featureMaker(data))
            c_feature = c_feature.reshape(-1, c_feature.shape[2] // n_group)
            init_feats.append(c_feature)
            if index > k:
                break
        init_feats = np.concatenate(init_feats, axis=0)
        n, d = init_feats.shape
        indexes = np.random.permutation(n)[:k]
        ck = jnp.asarray(init_feats[indexes], jnp.float32)  # (k, D)
    else:
        ck = jnp.asarray(np.asarray(start_clusters), jnp.float32)
        if ck.ndim == 3:
            ck = ck[0]
        d = ck.shape[1]
    d = ck.shape[1]

    if perIterSize < 0:
        perIterSize = len(dataLoader)

    sharder = _EvalSharder(mesh)
    if sharder.mesh is not None:
        logger.info(f"Accumulating over {sharder.n_dev} devices")
    ck = sharder.replicated(ck)

    it, stored = 0, 0
    sum_seen = 0.0
    last_diff = float('inf')
    n_items_clusters = jnp.zeros((k,), jnp.float32)
    print("perIterSize = %.f" % perIterSize)

    while it < MAX_ITER:
        start_time = time()
        ck1 = jnp.zeros((k, d), jnp.float32)
        n_items_clusters = jnp.zeros((k,), jnp.float32)
        for index, data in enumerate(dataLoader):
            c_feature = jnp.asarray(featureMaker(data)).reshape(-1, d)
            sums, counts = sharder.accumulate(c_feature, ck)
            ck1 = ck1 + sums
            n_items_clusters = n_items_clusters + counts
            stored += 1
            sum_seen += (np.asarray(data[0]).shape[0]
                         * np.asarray(data[0]).shape[-1] / 16000)
            if stored >= perIterSize:
                break
        if stored < perIterSize:
            continue

        stored = 0
        it += 1
        print("I've seen %.2f hours in %d epochs :) More data more data "
              "more data!" % (sum_seen / 3600, it))

        denom = n_items_clusters[:, None] + 1e-8
        ck1 = ck1 / denom
        last_diff = float(jnp.max(jnp.linalg.norm(ck - ck1, axis=1)))
        n_items = int(jnp.sum(n_items_clusters))
        logger.info(f"ITER {it} done in {time()-start_time:.2f} seconds. "
                    f"nItems: {n_items}. Difference with last checkpoint: "
                    f"{last_diff}")

        if save:
            path_save = save_dir / f"checkpoint_{it}.pt"
            logger.info(f"Saving last checkpoint to {path_save}")
            save_clustering_checkpoint(np.asarray(ck1)[None], path_save,
                                       iter=it, last_diff=last_diff,
                                       mode="kMean")
            old = save_dir / f"checkpoint_{it - save_last}.pt"
            if old.is_file():
                remove(old)
        if last_diff < EPSILON:
            logger.info(f"Clustering ended in {it} iterations out of "
                        f"{MAX_ITER}")
            ck = ck1
            break
        ck = ck1

    logger.info(f"Last diff {last_diff}")
    if start_clusters is not None:
        n_empty = int(jnp.sum(n_items_clusters < 1))
        logger.info(f"{n_empty} empty clusters out of {k}")
    return jnp.asarray(ck)[None]  # (1, k, D) reference layout


# ---------------------------------------------------------------------------
# DP-means (reference `clustering.py:208-329`)
# ---------------------------------------------------------------------------

_PAD = 128


def _padded(mu: np.ndarray, k: int) -> np.ndarray:
    """Pad centroid table to a multiple of _PAD rows; padded rows are +inf so
    they never win an argmin."""
    kp = ((k + _PAD - 1) // _PAD) * _PAD
    out = np.full((kp, mu.shape[1]), np.inf, np.float32)
    out[:k] = mu[:k]
    return out


@jax.jit
def _dp_assign(features: Array, mu_pad: Array):
    """Returns (assign (N,), min_dist (N,)) against a padded (+inf) table."""
    valid = jnp.isfinite(mu_pad[:, 0])
    mu_safe = jnp.where(valid[:, None], mu_pad, 0.0)
    d = _sq_distances(features, mu_safe)
    d = jnp.where(valid[None, :], d, jnp.inf)
    return jnp.argmin(d, axis=1), jnp.sqrt(jnp.min(d, axis=1))


def fastDPMean(dataLoader, featureMaker, l, MAX_ITER=100, batchSize=1000,
               EPSILON=1e-4, perIterSize=-1, save_dir=None, save_last=5,
               mu_start=None, mesh='auto'):
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("DPMean")
    save = save_dir is not None
    if save:
        save_dir = Path(save_dir)
        logger.addHandler(_setup_log_file(save_dir))
    logger.info(f"{perIterSize} updates per iteration")

    if mu_start is not None:
        mu = np.asarray(mu_start, np.float32).reshape(
            -1, np.asarray(mu_start).shape[-1])
        k, d = mu.shape
    else:
        print("Start training from scratch. Creating new mu ...")
        acc = None
        n_seqs = 100
        for index, data in enumerate(dataLoader):
            features = np.asarray(featureMaker(data))
            acc = features if acc is None else acc + features
            if index > n_seqs:
                break
        d = acc.shape[-1]
        k = 1
        mu = (acc.reshape(-1, d).mean(axis=0) / n_seqs).reshape(1, d)

    sharder = _EvalSharder(mesh)
    it = 0
    last_diff = float('inf')
    while it < MAX_ITER:
        start_time = time()
        mu1 = np.zeros((k, d), np.float32)
        c1 = np.zeros((k,), np.float64)
        for n_batch, data in enumerate(dataLoader):
            features = np.asarray(featureMaker(data)).reshape(-1, d)
            assign, dist = _dp_assign(sharder.rows(features),
                                      sharder.replicated(_padded(mu, k)))
            assign = np.array(assign)
            dist = np.array(dist)
            max_dist = dist.max()
            if max_dist > l:
                idx = int(dist.argmax())
                mu = np.concatenate([mu, features[idx].reshape(1, d)],
                                    axis=0)
                mu1 = np.concatenate([mu1, np.zeros((1, d), np.float32)],
                                     axis=0)
                c1 = np.concatenate([c1, np.zeros(1)], axis=0)
                assign[idx] = k
                k += 1
                if k % 10 == 0:
                    logger.info(f"Number of clusters increased to {k}")

            np.add.at(mu1, assign, features)
            np.add.at(c1, assign, 1)

        c1 = c1 + 1e-4
        mu1 = (mu1 / c1[:, None]).astype(np.float32)
        last_diff = float(np.linalg.norm(mu - mu1, axis=1).max())
        n_items = int(c1.sum())

        mu = mu1
        k = mu.shape[0]
        it += 1
        logger.info(f"ITER {it} done in {time()-start_time:.2f} seconds. "
                    f"nItems: {n_items}. lambda={l}. mu shape: "
                    f"{(1, k, d)}. Difference with last checkpoint: "
                    f"{last_diff}")
        if save:
            path_save = save_dir / f"checkpoint_{it}.pt"
            logger.info(f"Saving last checkpoint to {path_save}")
            save_clustering_checkpoint(mu[None], path_save, iter=it,
                                       last_diff=last_diff, mode="DPMean")
            old = save_dir / f"checkpoint_{it - save_last}.pt"
            if old.is_file():
                remove(old)
        if last_diff < EPSILON:
            logger.info(f"Clustering ended in {it} iterations out of "
                        f"{MAX_ITER}")
            break

    logger.info(f"{mu.shape[0]} clusters found for lambda = {l}")
    return jnp.asarray(mu)[None]


def KMean(C, k, MAX_ITER=100, EPSILON=1e-4, batchSize=1000):
    """In-memory Lloyd (reference `clustering.py:332-358`)."""
    C = jnp.asarray(np.asarray(C), jnp.float32)
    n, d = C.shape
    indexes = np.random.permutation(n)[:k]
    ck = C[jnp.asarray(indexes)]
    last_diff = float('inf')

    for it in range(MAX_ITER):
        sums, counts = _lloyd_accumulate(C, ck)
        # Deviation: the reference's per-cluster mean turns an EMPTY cluster
        # into a NaN centroid (torch mean of zero rows), which poisons every
        # later distance; the clamped denominator keeps it at the origin
        # instead. Also, on convergence this returns the UPDATED table where
        # the reference returns the stale one — the two differ by < EPSILON.
        ck1 = sums / jnp.maximum(counts[:, None], 1e-8)
        last_diff = float(jnp.max(jnp.linalg.norm(ck - ck1, axis=1)))
        if last_diff < EPSILON:
            print(f"Clustering ended in {it} iterations out of {MAX_ITER}")
            ck = ck1
            break
        ck = ck1
    print(f"Last diff {last_diff}")
    return ck[None]


def distanceEstimation(featureMaker, dataLoader, maxIndex=10,
                       maxSizeGroup=300):
    """Sampled pairwise-distance distribution for λ selection
    (reference `clustering.py:361-406`)."""
    out_data = []
    maxIndex = min(maxIndex, len(dataLoader))
    print("Computing the features...")
    for index, item in enumerate(dataLoader):
        features = np.asarray(featureMaker(item))
        n, s, c = features.shape
        out_data.append(features.reshape(n * s, c))
        if index > maxIndex:
            break
    print("Done")
    out_data = np.concatenate(out_data, axis=0)
    n_items = out_data.shape[0]
    out_data = out_data[np.random.permutation(n_items)]

    max_iter = n_items // maxSizeGroup
    if max_iter * maxSizeGroup < n_items:
        max_iter += 1

    out_dist = []
    print("Computing the distance...")
    for step in range(max_iter):
        min_born = step * maxSizeGroup
        max_born = min(min_born + maxSizeGroup, n_items)
        sum_data = out_data[min_born:max_born]
        loc = np.linalg.norm(sum_data[None, :, :] - sum_data[:, None, :],
                             axis=2)
        out_dist += loc[loc > 0].reshape(-1).tolist()
    print("Done")
    out_dist.sort()
    return out_dist
