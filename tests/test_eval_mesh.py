"""Multi-device eval: the meshed eval stack must produce device-count-
invariant results (the reference DataParallel-izes k-means accumulation,
the separability probe, and the CTC eval — `clustering.py:132-134`,
`linear_separability.py:203,223`, `common_voices_eval.py:542,549`; here
the analogues are batch-sharded jit programs over the local mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh8():
    from cpc2_tpu.parallel.mesh import eval_mesh
    if len(jax.local_devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return eval_mesh()


class TestPadRows:

    def test_passthrough_when_divisible(self):
        from cpc2_tpu.parallel.mesh import pad_rows
        a = np.arange(16, dtype=np.float32).reshape(8, 2)
        out, w = pad_rows(a, multiple=8)
        assert out.shape == (8, 2) and w.sum() == 8

    def test_pads_and_masks(self):
        from cpc2_tpu.parallel.mesh import pad_rows
        a = np.ones((5, 3), np.float32)
        b = np.arange(5)
        pa, pb, w = pad_rows(a, b, multiple=4)
        assert pa.shape == (8, 3) and pb.shape == (8,)
        np.testing.assert_array_equal(w, [1, 1, 1, 1, 1, 0, 0, 0])
        np.testing.assert_array_equal(pa[5:], 0.0)


class TestShardedLloyd:

    def test_weighted_equals_unweighted_on_real_rows(self):
        from cpc2_tpu.clustering.clustering import (
            _lloyd_accumulate, _lloyd_accumulate_weighted)
        rs = np.random.RandomState(0)
        f = jnp.asarray(rs.randn(40, 6).astype(np.float32))
        ck = jnp.asarray(rs.randn(4, 6).astype(np.float32))
        s0, c0 = _lloyd_accumulate(f, ck)
        fpad = jnp.concatenate([f, jnp.zeros((8, 6))], axis=0)
        w = jnp.concatenate([jnp.ones(40), jnp.zeros(8)])
        s1, c1 = _lloyd_accumulate_weighted(fpad, ck, w)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

    def test_sharded_accumulate_matches_single_device(self, mesh8):
        from cpc2_tpu.clustering.clustering import (_EvalSharder,
                                                    _lloyd_accumulate)
        rs = np.random.RandomState(1)
        # N=100: NOT divisible by 8 -> exercises the pad-and-mask path
        f = rs.randn(100, 16).astype(np.float32)
        ck = rs.randn(10, 16).astype(np.float32)
        s_ref, c_ref = _lloyd_accumulate(jnp.asarray(f), jnp.asarray(ck))
        sharder = _EvalSharder(mesh8)
        assert sharder.n_dev == 8
        s_mesh, c_mesh = sharder.accumulate(f, sharder.replicated(ck))
        np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_mesh),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(c_ref),
                                      np.asarray(c_mesh))

    def test_kmeans_centroids_device_count_invariant(self, mesh8):
        """Full kMeanGPU fit: an 8-device mesh and the single-device path
        converge to the same centroids from the same init."""
        from cpc2_tpu.clustering.clustering import kMeanGPU
        rs = np.random.RandomState(2)
        centers = rs.randn(4, 8).astype(np.float32) * 3
        batches = []
        for _ in range(6):
            which = rs.randint(0, 4, size=20)
            feats = centers[which] + 0.1 * rs.randn(20, 8).astype(np.float32)
            batches.append((feats.reshape(4, 5, 8), None))

        def fit(mesh):
            return np.asarray(kMeanGPU(
                list(batches), lambda d: d[0], 4, MAX_ITER=5,
                start_clusters=centers.copy()[None], mesh=mesh))

        single = fit(None)
        meshed = fit(mesh8)
        np.testing.assert_allclose(single, meshed, rtol=1e-5, atol=1e-5)


class TestMeshedFeatureModule:

    def test_sharded_extraction_bitsafe(self, mesh8, tmp_path):
        """Feature extraction has no cross-example reduction: the meshed
        FeatureModule returns the same features as the single-device
        path for a divisible batch."""
        from tests.test_feature_api import _write_ckpt
        from cpc2_tpu.feature_loader import FeatureModule, loadModel
        _write_ckpt(tmp_path, 16, seed=0)
        ckpt = str(tmp_path / "checkpoint_3.pt")

        rs = np.random.RandomState(3)
        batch = rs.randn(8, 1, 4800).astype(np.float32) * 0.1

        bundle_a = loadModel([ckpt])[0]
        fm_plain = FeatureModule(bundle_a, False, mesh=None)
        ref = np.asarray(fm_plain((batch, None)))

        bundle_b = loadModel([ckpt])[0]
        fm_mesh = FeatureModule(bundle_b, False, mesh=mesh8)
        out = np.asarray(fm_mesh((batch, None)))
        np.testing.assert_allclose(ref, out, rtol=1e-6, atol=1e-6)

    def test_ragged_batch_falls_back(self, mesh8, tmp_path):
        from tests.test_feature_api import _write_ckpt
        from cpc2_tpu.feature_loader import FeatureModule, loadModel
        _write_ckpt(tmp_path, 16, seed=1)
        bundle = loadModel([str(tmp_path / "checkpoint_3.pt")])[0]
        fm = FeatureModule(bundle, False, mesh=mesh8)
        batch = np.random.RandomState(4).randn(3, 1, 4800).astype(np.float32)
        feats = np.asarray(fm((batch, None)))
        assert feats.shape[0] == 3


class TestShardedABXScorer:

    @pytest.mark.parametrize('symmetric', [False, True])
    def test_group_sharded_scores_exact(self, mesh8, symmetric):
        """The packed theta scorer with its G axis constrained over the
        mesh returns the same numerators as the unsharded program —
        groups are independent until the per-group reduction."""
        from cpc2_tpu.eval.abx import abx_group_computation as g
        rs = np.random.RandomState(8)
        G, N, S, D = 16, 4, 6, 5

        def block(key):
            feats = rs.randn(G, N, S, D).astype(np.float32)
            feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
            lengths = rs.randint(2, S + 1, size=(G, N)).astype(np.float32)
            valid = np.ones((G, N), np.float32)
            return feats, lengths, valid

        a, la, va = block(0)
        b, lb, vb = block(1)
        x, lx, vx = block(2)
        buf = np.concatenate([t.ravel() for t in
                              (a, b, x, la, lb, lx, va, vb, vx)])
        shapes = ((G, N, S, D),) * 3

        plain = g._make_fused_theta_packed('cosine', symmetric)
        meshed = g._make_fused_theta_packed('cosine', symmetric, mesh8)
        out_p = np.asarray(plain(jnp.asarray(buf), *shapes))
        out_m = np.asarray(meshed(jnp.asarray(buf), *shapes))
        np.testing.assert_allclose(out_p, out_m, rtol=1e-6, atol=1e-6)


class TestMeshedCTCEval:

    def test_cv_trajectory_device_count_invariant(self, mesh8):
        """The CTC eval's weighted train/val steps match the single-device
        math at 8 devices, ragged batches included."""
        import optax
        from cpc2_tpu.eval.common_voices_eval import (CTCPhoneCriterionCV,
                                                      CVSteps, IDModule)
        from cpc2_tpu.parallel.mesh import replicate

        rs = np.random.RandomState(6)
        model = IDModule()
        crit = CTCPhoneCriterionCV(dim_encoder=4, n_phones=5)
        frames = 16
        crit_vars = crit.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            jnp.zeros((2, frames, 4)), jnp.ones((2,), jnp.int32) * 8,
            jnp.zeros((2, 6), jnp.int32), jnp.ones((2,), jnp.int32),
            train=False)
        base = {'model': {}, 'criterion': crit_vars['params']}
        tx = optax.adam(1e-3)

        batches = []
        for i in range(3):
            b = 8 if i < 2 else 5
            seq = rs.randn(b, 4, frames).astype(np.float32)
            size_seq = np.full((b,), frames * 4, np.int32)
            phone = rs.randint(0, 5, size=(b, 6)).astype(np.int32)
            size_phone = rs.randint(1, 4, size=b).astype(np.int32)
            batches.append((seq, size_seq, phone, size_phone))
        rng = jax.random.PRNGKey(2)

        def run(mesh):
            params = jax.tree.map(jnp.asarray, base)
            opt_state = tx.init(params)
            if mesh is not None:
                params = replicate(mesh, params)
                opt_state = replicate(mesh, opt_state)
            steps = CVSteps(model, crit, tx, freeze=True, mesh=mesh)
            losses = []
            for i, (seq, ss, ph, sp) in enumerate(batches):
                params, opt_state, loss = steps.train_batch(
                    params, opt_state, seq, ss, ph, sp,
                    jax.random.fold_in(rng, i))
                losses.append(float(loss))
            vloss = float(steps.val_batch(params, *batches[-1]))
            pred = steps.predict_batch(params, batches[-1][0],
                                       batches[-1][1])
            return losses, vloss, pred

        l_s, v_s, p_s = run(None)
        l_m, v_m, p_m = run(mesh8)
        np.testing.assert_allclose(l_s, l_m, rtol=1e-5)
        np.testing.assert_allclose(v_s, v_m, rtol=1e-5)
        assert p_m.shape[0] == 5
        np.testing.assert_allclose(p_s, p_m, rtol=1e-5, atol=1e-6)


class TestMeshedProbe:

    def _setup(self, tmp_path, seed):
        from tests.test_feature_api import _write_ckpt
        from cpc2_tpu.feature_loader import loadModel
        from cpc2_tpu.losses import SpeakerCriterion
        import optax
        _write_ckpt(tmp_path, 16, seed=seed)
        bundle = loadModel([str(tmp_path / "checkpoint_3.pt")])[0]
        crit = SpeakerCriterion(dim_encoder=16, n_speakers=3)
        frames = 4800 // 160
        crit_vars = crit.init(jax.random.PRNGKey(1),
                              jnp.zeros((2, frames, 16)),
                              jnp.zeros((2, frames, 16)),
                              jnp.zeros((2,), jnp.int32), train=False)
        params = {'model': bundle.variables['params'],
                  'criterion': crit_vars['params']}
        tx = optax.adam(1e-3)
        return bundle, crit, params, tx

    def test_probe_trajectory_device_count_invariant(self, mesh8, tmp_path):
        """Same batches, same rng: the 8-device weighted probe step and
        the single-device step produce the same parameter trajectory
        (including a ragged 5-row batch through the pad-and-mask path)."""
        from cpc2_tpu.eval.linear_separability import ProbeSteps
        from cpc2_tpu.parallel.mesh import replicate

        rs = np.random.RandomState(5)
        batches = []
        for i in range(3):
            b = 8 if i < 2 else 5   # ragged tail
            audio = rs.randn(b, 2, 1, 4800).astype(np.float32) * 0.1
            label = rs.randint(0, 3, size=b)
            batches.append((audio, label))
        rng = jax.random.PRNGKey(0)

        def run(mesh):
            bundle, crit, params, tx = self._setup(tmp_path, seed=7)
            if mesh is not None:
                params = replicate(mesh, params)
                opt_state = replicate(mesh, tx.init(params))
            else:
                opt_state = tx.init(params)
            steps = ProbeSteps(bundle.module, crit, tx, False, mesh)
            losses = []
            for i, (audio, label) in enumerate(batches):
                params, opt_state, loss, acc = steps.train_batch(
                    params, opt_state, audio, label,
                    jax.random.fold_in(rng, i))
                losses.append(float(np.asarray(loss).mean()))
            vloss, vacc = steps.val_batch(params, *batches[0])
            return losses, float(np.asarray(vloss).mean()), params

        l_single, v_single, p_single = run(None)
        l_mesh, v_mesh, p_mesh = run(mesh8)
        np.testing.assert_allclose(l_single, l_mesh, rtol=1e-5)
        np.testing.assert_allclose(v_single, v_mesh, rtol=1e-5)
        flat_s = jax.tree_util.tree_leaves(p_single['criterion'])
        flat_m = jax.tree_util.tree_leaves(p_mesh['criterion'])
        for a, b in zip(flat_s, flat_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
