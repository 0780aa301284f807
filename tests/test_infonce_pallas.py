"""The fused InfoNCE negative-scoring kernel (`ops/infonce_pallas.py`)
must match the XLA gather+einsum formulation in values and gradients
(to fp32 association-order tolerance: same per-element products, the
kernel accumulates in a different order).
Runs in Pallas interpret mode on the CPU test backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc2_tpu.ops.infonce_pallas import negative_scores_pallas


def _einsum_reference(preds, z_flat, neg_idx):
    b, k_p, w, d = preds.shape
    n = neg_idx.shape[2]
    neg_z = z_flat[neg_idx.reshape(-1)].reshape(b, w, n, d)
    return jnp.einsum('bkwd,bwnd->bkwn', preds, neg_z,
                      preferred_element_type=jnp.float32)


def _case(b=2, k_p=3, w=13, s=16, d=40, n=24, seed=0):
    rs = np.random.RandomState(seed)
    preds = rs.randn(b, k_p, w, d).astype(np.float32)
    z = rs.randn(b * s, d).astype(np.float32)
    idx = rs.randint(0, b * s, size=(b, w, n)).astype(np.int32)
    return jnp.asarray(preds), jnp.asarray(z), jnp.asarray(idx)


class TestNegativeScoresKernel:

    def test_matches_einsum_formulation(self):
        preds, z, idx = _case()
        got = negative_scores_pallas(preds, z, idx, interpret=True)
        want = _einsum_reference(preds, z, idx)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=2e-5)

    def test_recipe_like_shapes(self):
        # aligned shapes exercise the no-padding path
        preds, z, idx = _case(b=2, k_p=4, w=16, s=64, d=128, n=128, seed=1)
        got = negative_scores_pallas(preds, z, idx, interpret=True)
        want = _einsum_reference(preds, z, idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=2e-5)

    def test_gradients_match(self):
        preds, z, idx = _case(seed=2)

        def loss_kernel(preds, z):
            out = negative_scores_pallas(preds, z, idx, interpret=True)
            return jnp.sum(jnp.tanh(out))

        def loss_ref(preds, z):
            return jnp.sum(jnp.tanh(_einsum_reference(preds, z, idx)))

        gk = jax.grad(loss_kernel, argnums=(0, 1))(preds, z)
        gr = jax.grad(loss_ref, argnums=(0, 1))(preds, z)
        for a, b_, name in zip(gk, gr, ('d_preds', 'd_z')):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=5e-5, err_msg=name)

    def test_repeated_and_colliding_indices(self):
        # repeated negatives must accumulate correctly in d_z
        rs = np.random.RandomState(3)
        preds = jnp.asarray(rs.randn(1, 2, 8, 16).astype(np.float32))
        z = jnp.asarray(rs.randn(12, 16).astype(np.float32))
        idx = jnp.asarray(np.full((1, 8, 8), 5, np.int32))  # all the same row

        got = negative_scores_pallas(preds, z, idx, interpret=True)
        want = _einsum_reference(preds, z, idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=2e-5)

        g = jax.grad(lambda zz: jnp.sum(
            negative_scores_pallas(preds, zz, idx, interpret=True)))(z)
        g_ref = jax.grad(lambda zz: jnp.sum(
            _einsum_reference(preds, zz, idx)))(z)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=5e-5)

    def test_jit_and_vjp_under_jit(self):
        preds, z, idx = _case(seed=4)

        @jax.jit
        def f(preds, z):
            out = negative_scores_pallas(preds, z, idx, interpret=True)
            return jnp.sum(out * out)

        v, g = jax.value_and_grad(f)(preds, z)
        assert np.isfinite(float(v))
        assert np.isfinite(np.asarray(g)).all()
