"""Clustering-based auxiliary losses
(reference `cpc/criterion/research/clustering_criterion.py`).

Deferred cluster updates run through the TPU k-means/DP-means loops in
`clustering/clustering.py`; the losses themselves are pure jnp functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..clustering.clustering import (distanceEstimation, fastDPMean,
                                     kMeanCluster, kMeanGPU)
from ..models.layers import TorchLinear


class ClusteringLoss:
    """Base: k-means clusters updated every `clusterIter` steps after a
    `delay` (reference `clustering_criterion.py:16-85`)."""

    TARGET_QUANTILE = 0.05

    def __init__(self, k, d, delay, clusterIter, clusteringUpdate):
        self.clusters = kMeanCluster(np.zeros((1, k, d), np.float32))
        self.k = k
        self.d = d
        self.init = False
        self.delay = delay
        self.step = 0
        self.clusterIter = clusterIter
        available = ["kmean", "dpmean"]
        if clusteringUpdate not in available:
            raise ValueError(f"{clusteringUpdate} is an invalid clustering "
                             f"update option. Must be in {available}")
        print(f"Clustering update mode is {clusteringUpdate}")
        self.DP_MEAN = clusteringUpdate == "dpmean"

    def canRun(self):
        return self.step > self.delay

    def getOptimalLambda(self, dataLoader, model, MAX_ITER=10):
        dist_data = distanceEstimation(model, dataLoader, maxIndex=MAX_ITER,
                                       maxSizeGroup=300)
        n_data = len(dist_data)
        print(f"{n_data} samples analyzed")
        return dist_data[int(self.TARGET_QUANTILE * n_data)]

    def updateClusters(self, dataLoader, featureMaker, MAX_ITER=20,
                       EPSILON=1e-4):
        self.step += 1
        if not self.canRun():
            return
        if self.DP_MEAN:
            l_ = self.getOptimalLambda(dataLoader, featureMaker)
            clusters = fastDPMean(dataLoader, featureMaker, l_,
                                  MAX_ITER=MAX_ITER,
                                  perIterSize=self.clusterIter)
            self.k = clusters.shape[1]
        else:
            clusters = kMeanGPU(dataLoader, featureMaker, self.k,
                                MAX_ITER=MAX_ITER, EPSILON=EPSILON,
                                perIterSize=self.clusterIter)
        self.clusters = kMeanCluster(np.asarray(clusters))
        self.init = True

    # reference-spelled alias
    updateCLusters = updateClusters

    def assign_labels(self, x):
        """Hard cluster assignments for a (B, S, D) feature batch."""
        return jnp.argmin(self.clusters(x), axis=-1)


class DeepClustering(ClusteringLoss):
    """CE against cluster assignments (`clustering_criterion.py:88-102`).
    The linear classifier's params live in a small flax module applied
    functionally."""

    def __init__(self, *args):
        super().__init__(*args)
        self.classifier = TorchLinear(self.k)
        self._params = self.classifier.init(
            jax.random.PRNGKey(0), jnp.zeros((1, self.d)))

    def __call__(self, x, labels):
        if not self.canRun():
            return jnp.zeros((1, 1))
        b, s, d = x.shape
        logits = self.classifier.apply(self._params, x.reshape(-1, d))
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, labels.reshape(-1)[:, None],
                                 axis=-1)[:, 0]
        return -jnp.mean(ll).reshape(1, 1)


class CTCCLustering(ClusteringLoss):
    """CTC loss against collapsed cluster-label chains
    (`clustering_criterion.py:105-111`)."""

    def __init__(self, *args):
        super().__init__(*args)
        from ..losses import CTCPhoneCriterion
        self.main_module = CTCPhoneCriterion(dim_encoder=self.d,
                                             n_phones=self.k,
                                             on_encoder=False)
        frames = 16
        self._params = self.main_module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, frames, self.d)),
            jnp.zeros((1, frames, self.d)), jnp.zeros((1, frames), jnp.int32),
            train=False)

    def __call__(self, c_feature, label):
        loss, _ = self.main_module.apply(self._params, c_feature, None,
                                         label, train=True)
        return loss


class DeepEmbeddedClustering(ClusteringLoss):
    """DEC KL loss with learnable centroids
    (`clustering_criterion.py:114-168`)."""

    def __init__(self, lr, *args):
        self.lr = lr
        super().__init__(*args)

    def __call__(self, x):
        if not self.canRun():
            return jnp.zeros((1, 1))
        return self.loss(x, self.clusters.Ck)

    def loss(self, x, ck):
        b, s, d = x.shape
        dist = kMeanCluster(ck)(x).reshape(b * s, -1)
        dist = 1.0 / (1.0 + dist)
        qij = dist / jnp.sum(dist, axis=1, keepdims=True)
        q_factor = (qij ** 2) / jnp.sum(qij, axis=0, keepdims=True)
        pij = q_factor / jnp.sum(q_factor, axis=1, keepdims=True)
        return jnp.sum(pij * jnp.log(pij / qij)).reshape(1, 1)

    def updateClusters(self, dataLoader, model):
        if not self.init:
            super().updateClusters(dataLoader, model)
            self.init = True
            return
        self.step += 1
        if not self.canRun():
            return
        print("Updating the deep embedded clusters")
        ck = jnp.asarray(self.clusters.Ck)

        grad_fn = jax.jit(jax.grad(
            lambda c, feats: self.loss(feats, c).sum()))

        max_data = (len(dataLoader) if self.clusterIter <= 0
                    else self.clusterIter)
        for index, data in enumerate(dataLoader):
            if index > max_data:
                break
            feats = jnp.asarray(model(data))
            ck = ck - self.lr * grad_fn(ck, feats)
        self.clusters = kMeanCluster(np.asarray(ck))

    updateCLusters = updateClusters
