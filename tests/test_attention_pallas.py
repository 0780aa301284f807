"""Fused causal relpos attention kernel (`ops/attention_pallas.py`) vs the
XLA formulation in `models/transformer.py` — interpret mode on CPU,
dropout off (the on-chip PRNG has no CPU lowering; dropout-on paths are
exercised on real TPU by training runs)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc2_tpu.ops.attention_pallas import (fused_relpos_attention, _pick_nb)


def _xla_reference(q, k, v, krelpos, dk):
    """The module's XLA path: qk + causal-equivalent relpos + masked
    softmax + PV (dropout off)."""
    s = q.shape[1]
    qk = jnp.einsum('bik,bjk->bij', q, k,
                    preferred_element_type=jnp.float32)
    offs = jnp.clip(jnp.arange(s)[:, None] - jnp.arange(s)[None, :],
                    0, s - 1)
    w2 = jnp.take(krelpos[:, ::-1], offs, axis=1)
    qk = qk + jnp.einsum('brd,drc->brc', q, w2,
                         preferred_element_type=jnp.float32)
    causal = np.triu(np.full((s, s), -np.inf, np.float32), k=1)
    a = jax.nn.softmax(qk / math.sqrt(dk) + jnp.asarray(causal), axis=2)
    return jnp.einsum('bij,bjk->bik', a.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _w2(krelpos, s):
    offs = jnp.clip(jnp.arange(s)[:, None] - jnp.arange(s)[None, :],
                    0, s - 1)
    return jnp.take(krelpos[:, ::-1], offs, axis=1)


def _rand(rs, *shape):
    return jnp.asarray(rs.randn(*shape).astype(np.float32))


class TestFusedAttention:

    @pytest.mark.parametrize("n,s,dk", [(4, 12, 8), (6, 23, 4), (16, 116, 32)])
    def test_forward_matches_xla(self, n, s, dk):
        rs = np.random.RandomState(0)
        q, k, v = (_rand(rs, n, s, dk) for _ in range(3))
        krel = _rand(rs, dk, s)
        seed = jnp.zeros((1, 1), jnp.int32)
        out = fused_relpos_attention(q, k, v, _w2(krel, s), seed,
                                     0.0, True)
        ref = _xla_reference(q, k, v, krel, dk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_grads_match_xla(self):
        n, s, dk = 4, 17, 8
        rs = np.random.RandomState(1)
        q, k, v = (_rand(rs, n, s, dk) for _ in range(3))
        krel = _rand(rs, dk, s)
        seed = jnp.zeros((1, 1), jnp.int32)
        tgt = _rand(rs, n, s, dk)

        def loss_kernel(q, k, v, krel):
            out = fused_relpos_attention(q, k, v, _w2(krel, s), seed,
                                         0.0, True)
            return jnp.sum((out - tgt) ** 2)

        def loss_ref(q, k, v, krel):
            return jnp.sum((_xla_reference(q, k, v, krel, dk) - tgt) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, krel)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, krel)
        for a, b, name in zip(gk, gr, ['dq', 'dk', 'dv', 'dKrelpos']):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4, err_msg=name)

    def test_bf16_inputs(self):
        n, s, dk = 4, 12, 8
        rs = np.random.RandomState(2)
        q, k, v = (_rand(rs, n, s, dk).astype(jnp.bfloat16)
                   for _ in range(3))
        krel = _rand(rs, dk, s)
        seed = jnp.zeros((1, 1), jnp.int32)
        out = fused_relpos_attention(q, k, v, _w2(krel, s), seed,
                                     0.0, True)
        assert out.dtype == jnp.bfloat16
        ref = _xla_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                             v.astype(jnp.float32), krel, dk)
        np.testing.assert_allclose(
            np.asarray(out.astype(jnp.float32)), np.asarray(ref),
            atol=0.05, rtol=0.05)

    def test_nb_blocking(self):
        assert _pick_nb(16) == 8
        assert _pick_nb(6) == 2
        assert _pick_nb(7) == 1
        assert _pick_nb(96) == 8

    def test_vmapped_heads(self):
        """nn.vmap over prediction heads lifts the kernel with a leading
        grid dim; per-head Krelpos (and the dW2 accumulation) must stay
        independent."""
        kheads, n, s, dk = 3, 4, 9, 4
        rs = np.random.RandomState(3)
        q, k, v = (_rand(rs, n, s, dk) for _ in range(3))
        krels = _rand(rs, kheads, dk, s)
        seed = jnp.zeros((1, 1), jnp.int32)

        def one(krel):
            return fused_relpos_attention(q, k, v, _w2(krel, s), seed,
                                          0.0, True)

        def one_ref(krel):
            return _xla_reference(q, k, v, krel, dk)

        out = jax.vmap(one)(krels)
        ref = jax.vmap(one_ref)(krels)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        g = jax.grad(lambda ks: jnp.sum(jax.vmap(one)(ks) ** 2))(krels)
        g_ref = jax.grad(lambda ks: jnp.sum(jax.vmap(one_ref)(ks) ** 2))(
            krels)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=5e-4, rtol=1e-4)
