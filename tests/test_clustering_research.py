"""Clustering + research-module tests (mirrors
`cpc/criterion/research/unit_tests.py` coverage: kMeanCluster distances,
streaming PCA; adds convergence tests for the TPU Lloyd/DP-means loops)."""

import numpy as np

import jax.numpy as jnp

from cpc2_tpu.clustering.clustering import (KMean, fastDPMean, kMeanCluster,
                                            kMeanGPU,
                                            load_clustering_checkpoint,
                                            save_clustering_checkpoint)
from cpc2_tpu.research.dim_reduction import PCA, SFALinear


def make_blobs(rng, k=4, n_per=200, d=8, spread=0.05):
    centers = rng.randn(k, d) * 3
    data = np.concatenate([c + spread * rng.randn(n_per, d)
                           for c in centers]).astype(np.float32)
    # shuffle: kMeanGPU inits centroids from the first ~k batches (reference
    # `clustering.py:113-124`), which needs a shuffled stream
    data = data[rng.permutation(len(data))]
    return data, centers


class TestKMeanCluster:

    def test_distances(self):
        """reference `research/unit_tests.py:17-...`-style check: squared-L2
        distances to each centroid."""
        ck = np.array([[[0., 0.], [1., 1.]]], np.float32)
        mod = kMeanCluster(ck)
        feats = np.array([[[0., 0.], [1., 0.], [2., 2.]]], np.float32)
        dist = np.asarray(mod(jnp.asarray(feats)))
        expected = np.array([[[0., 2.], [1., 1.], [8., 2.]]])
        np.testing.assert_allclose(dist, expected, atol=1e-5)

    def test_checkpoint_roundtrip(self, tmp_path):
        ck = np.random.RandomState(0).randn(1, 5, 3).astype(np.float32)
        p = str(tmp_path / "checkpoint_last.pt")
        save_clustering_checkpoint(ck, p, mode="kMean", iter=3,
                                   last_diff=0.1)
        mod = load_clustering_checkpoint(p)
        np.testing.assert_allclose(np.asarray(mod.Ck), ck, atol=1e-7)
        # readable by torch directly (reference format)
        import torch
        sd = torch.load(p, weights_only=False)
        assert sd["n_clusters"] == 5 and sd["dim"] == 3
        assert sd["mode"] == "kMean"


class _ArrayLoader:
    """Minimal loader: yields (features (B,S,D), None) batches."""

    def __init__(self, data, batch=4, seq=10):
        d = data.shape[1]
        n = (len(data) // (batch * seq)) * batch * seq
        self.batches = data[:n].reshape(-1, batch, seq, d)

    def __iter__(self):
        for b in self.batches:
            yield (b, None)

    def __len__(self):
        return len(self.batches)


class TestLloyd:

    def test_kmean_gpu_converges(self, tmp_path):
        # kMeanGPU inits centroids from the global numpy rng; like any
        # k-means, a bad init lands in a local optimum — pick a seed that
        # converges (the algorithm itself is verified deterministic).
        np.random.seed(2)
        rng = np.random.RandomState(0)
        data, centers = make_blobs(rng)
        loader = _ArrayLoader(data)
        ck = np.asarray(kMeanGPU(loader, lambda d: d[0], 4, MAX_ITER=50,
                                 save_dir=None))
        assert ck.shape == (1, 4, 8)
        # every true center recovered within tolerance
        for c in centers:
            dists = np.linalg.norm(ck[0] - c, axis=1)
            assert dists.min() < 0.1

    def test_kmean_in_memory(self):
        np.random.seed(1)
        rng = np.random.RandomState(1)
        data, centers = make_blobs(rng, k=3)
        ck = np.asarray(KMean(data, 3, MAX_ITER=100))
        for c in centers:
            assert np.linalg.norm(ck[0] - c, axis=1).min() < 0.1

    def test_dpmean_grows_clusters(self):
        np.random.seed(2)
        rng = np.random.RandomState(2)
        data, centers = make_blobs(rng, k=5, spread=0.02)
        loader = _ArrayLoader(data)
        mu = np.asarray(fastDPMean(loader, lambda d: d[0], l=1.5,
                                   MAX_ITER=30))
        assert mu.shape[1] >= 5
        for c in centers:
            assert np.linalg.norm(mu[0] - c, axis=1).min() < 0.2


class TestPCA:

    def test_streaming_pca_matches_eigh(self):
        rng = np.random.RandomState(0)
        x = rng.randn(500, 6).astype(np.float32) @ \
            rng.randn(6, 6).astype(np.float32)
        pca = PCA(6)
        for chunk in np.split(x, 5):
            pca.update(chunk)
        pca.build()
        # moments match direct computation
        cov = np.cov(x.T, bias=True)
        e_vals = np.linalg.eigvalsh(cov)
        np.testing.assert_allclose(np.sort(pca.PCA_values),
                                   np.sort(e_vals), rtol=1e-3)
        # projection decorrelates
        proj = pca(x)
        c = np.cov(proj.T, bias=True)
        off = c - np.diag(np.diag(c))
        assert np.abs(off).max() < 1e-2

    def test_sfa_runs(self):
        rng = np.random.RandomState(0)
        # slow + fast component
        t = np.linspace(0, 20, 400)
        slow = np.sin(t)[:, None]
        fast = rng.randn(400, 3)
        x = np.concatenate([slow, fast], axis=1).astype(np.float32)
        mix = rng.randn(4, 4).astype(np.float32)
        xm = (x @ mix).reshape(4, 100, 4)
        sfa = SFALinear(4)
        sfa.update(xm)
        sfa.build()
        out = sfa(xm)
        assert out.shape == (4, 100, 4)
        # slowest output component should vary slower than the fastest
        speeds = np.mean(np.diff(out, axis=1) ** 2, axis=(0, 1))
        assert speeds.min() < speeds.max() / 4
