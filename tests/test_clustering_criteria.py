"""Direct coverage for the research clustering criteria
(`research/clustering_criterion.py`: ClusteringLoss / DeepClustering /
CTCCLustering / DeepEmbeddedClustering, reference
`cpc/criterion/clustering/clustering.py`) and the per-rank file sharding
used by distributed training (`train.py:filter_distributed`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cpc2_tpu.research.clustering_criterion import (CTCCLustering,
                                                    DeepClustering,
                                                    DeepEmbeddedClustering)


class TestClusteringLossBase:

    def test_delay_gates_loss(self):
        crit = DeepClustering(4, 8, 2, 1, "kmean")
        x = jnp.zeros((2, 3, 8))
        labels = jnp.zeros((2, 3), jnp.int32)
        # before the delay the loss is silent
        assert not crit.canRun()
        np.testing.assert_array_equal(np.asarray(crit(x, labels)),
                                      np.zeros((1, 1)))
        crit.step = 3
        assert crit.canRun()

    def test_invalid_update_mode(self):
        with pytest.raises(ValueError):
            DeepClustering(4, 8, 0, 1, "spectral")


class TestDeepClustering:

    def test_ce_loss_value(self):
        crit = DeepClustering(3, 6, 0, 1, "kmean")
        crit.step = 1
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(2, 5, 6).astype(np.float32))
        labels = jnp.asarray(rs.randint(0, 3, (2, 5)))
        loss = np.asarray(crit(x, labels))
        assert loss.shape == (1, 1) and np.isfinite(loss).all()
        assert loss[0, 0] > 0  # CE of random logits

    def test_assign_labels(self):
        crit = DeepClustering(2, 4, 0, 1, "kmean")
        from cpc2_tpu.clustering import kMeanCluster
        centers = np.stack([np.zeros(4), np.ones(4) * 5]).astype(np.float32)
        crit.clusters = kMeanCluster(centers[None])
        x = jnp.asarray(np.stack([np.zeros((3, 4)),
                                  np.ones((3, 4)) * 5]).astype(np.float32))
        labels = np.asarray(crit.assign_labels(x))
        np.testing.assert_array_equal(labels, [[0, 0, 0], [1, 1, 1]])


class TestCTCClustering:

    def test_ctc_loss_runs(self):
        crit = CTCCLustering(4, 8, 0, 1, "kmean")
        rs = np.random.RandomState(1)
        c = jnp.asarray(rs.randn(2, 16, 8).astype(np.float32))
        labels = jnp.asarray(rs.randint(0, 4, (2, 4)))
        # pad the label chain to the frame count as the trainer does
        labels = jnp.pad(labels, ((0, 0), (0, 12)), constant_values=0)
        loss = np.asarray(crit(c, labels))
        assert np.isfinite(loss).all() and (loss > 0).all()


class TestDEC:

    def test_kl_loss_zero_when_uniform(self):
        crit = DeepEmbeddedClustering(0.01, 2, 4, 0, 1, "kmean")
        crit.step = 1
        from cpc2_tpu.clustering import kMeanCluster
        ck = np.stack([np.ones(4), -np.ones(4)]).astype(np.float32)[None]
        crit.clusters = kMeanCluster(ck)
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(2, 6, 4).astype(np.float32))
        loss = np.asarray(crit(x))
        assert loss.shape == (1, 1)
        assert np.isfinite(loss).all() and loss[0, 0] >= 0  # KL >= 0

    def test_gated_before_delay(self):
        crit = DeepEmbeddedClustering(0.01, 2, 4, 5, 1, "kmean")
        np.testing.assert_array_equal(
            np.asarray(crit(jnp.zeros((1, 2, 4)))), np.zeros((1, 1)))


class TestPerRankSharding:
    """`train.py:457-468` splits the file list contiguously by rank; shards
    are disjoint, cover everything, and sizes differ by at most one."""

    @staticmethod
    def _filter(files, rank, world):
        start = len(files) * rank // world
        end = len(files) * (rank + 1) // world
        return files[start:end]

    @pytest.mark.parametrize("n,world", [(10, 3), (8, 8), (7, 2), (5, 8)])
    def test_partition(self, n, world):
        files = list(range(n))
        shards = [self._filter(files, r, world) for r in range(world)]
        flat = [x for s in shards for x in s]
        assert flat == files  # disjoint + ordered + complete
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1
