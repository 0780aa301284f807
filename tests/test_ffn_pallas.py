"""Fused FFN kernel (`ops/ffn_pallas.py`) vs the XLA formulation in
`models/transformer.py:FFNetwork` — interpret mode on CPU, dropout off
(the on-chip PRNG has no CPU lowering; dropout-on paths are exercised on
real TPU by training runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc2_tpu.ops.ffn_pallas import _pick_tiles, fused_ffn


def _xla_reference(x, w1, b1, w2, b2):
    """The module's XLA path (TorchLinear -> ReLU -> TorchLinear),
    dropout off, f32 accumulation."""
    h = jnp.einsum('md,fd->mf', x, w1.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    h = jnp.maximum(h + b1.astype(x.dtype), 0)
    y = jnp.einsum('mf,of->mo', h, w2.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y + b2.astype(x.dtype)


def _rand(rs, *shape):
    return jnp.asarray(rs.randn(*shape).astype(np.float32))


def _params(rs, din, dff, dout):
    return (_rand(rs, dff, din) * 0.1, _rand(rs, dff) * 0.1,
            _rand(rs, dout, dff) * 0.1, _rand(rs, dout) * 0.1)


SEED0 = jnp.zeros((1, 1), jnp.int32)


class TestFusedFFN:

    @pytest.mark.parametrize("m,din,dff,dout", [
        (16, 8, 32, 8),      # single tile
        (928, 16, 64, 16),   # recipe row count -> 2 row tiles
        (32, 8, 2048, 8),    # chunked dff (2 chunks of 1024)
    ])
    def test_forward_matches_xla(self, m, din, dff, dout):
        rs = np.random.RandomState(0)
        x = _rand(rs, m, din)
        w1, b1, w2, b2 = _params(rs, din, dff, dout)
        out = fused_ffn(x, w1, b1, w2, b2, SEED0, 0.0, True)
        ref = _xla_reference(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_grads_match_xla(self):
        m, din, dff, dout = 32, 8, 2048, 8   # exercises chunked dW/db/dx
        rs = np.random.RandomState(1)
        x = _rand(rs, m, din)
        w1, b1, w2, b2 = _params(rs, din, dff, dout)
        tgt = _rand(rs, m, dout)

        def loss_kernel(x, w1, b1, w2, b2):
            out = fused_ffn(x, w1, b1, w2, b2, SEED0, 0.0, True)
            return jnp.sum((out - tgt) ** 2)

        def loss_ref(x, w1, b1, w2, b2):
            return jnp.sum((_xla_reference(x, w1, b1, w2, b2) - tgt) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(
            x, w1, b1, w2, b2)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for a, b, name in zip(gk, gr, ['dx', 'dw1', 'db1', 'dw2', 'db2']):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4, err_msg=name)

    def test_row_tile_accumulation(self):
        """Multiple row tiles: dW/db accumulate across the inner row axis
        of the backward grid."""
        m, din, dff, dout = 928, 8, 32, 8    # 2 row tiles of 464
        rs = np.random.RandomState(2)
        x = _rand(rs, m, din)
        w1, b1, w2, b2 = _params(rs, din, dff, dout)

        def loss_kernel(w1, b1, w2, b2):
            return jnp.sum(fused_ffn(x, w1, b1, w2, b2, SEED0, 0.0,
                                     True) ** 2)

        def loss_ref(w1, b1, w2, b2):
            return jnp.sum(_xla_reference(x, w1, b1, w2, b2) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
        for a, b, name in zip(gk, gr, ['dw1', 'db1', 'dw2', 'db2']):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4, err_msg=name)

    def test_bf16_inputs(self):
        m, din, dff, dout = 16, 8, 32, 8
        rs = np.random.RandomState(3)
        x = _rand(rs, m, din).astype(jnp.bfloat16)
        w1, b1, w2, b2 = _params(rs, din, dff, dout)
        out = fused_ffn(x, w1, b1, w2, b2, SEED0, 0.0, True)
        assert out.dtype == jnp.bfloat16
        ref = _xla_reference(x, w1, b1, w2, b2)
        np.testing.assert_allclose(
            np.asarray(out.astype(jnp.float32)),
            np.asarray(ref.astype(jnp.float32)), atol=0.05, rtol=0.05)

    def test_vmapped_heads(self):
        """nn.vmap over prediction heads lifts the kernel with a leading
        grid dim; per-head weights and the dW accumulations must stay
        independent."""
        kheads, m, din, dff, dout = 3, 16, 8, 32, 8
        rs = np.random.RandomState(4)
        x = _rand(rs, m, din)
        w1s = _rand(rs, kheads, dff, din) * 0.1
        b1s = _rand(rs, kheads, dff) * 0.1
        w2s = _rand(rs, kheads, dout, dff) * 0.1
        b2s = _rand(rs, kheads, dout) * 0.1

        def one(w1, b1, w2, b2):
            return fused_ffn(x, w1, b1, w2, b2, SEED0, 0.0, True)

        def one_ref(w1, b1, w2, b2):
            return _xla_reference(x, w1, b1, w2, b2)

        out = jax.vmap(one)(w1s, b1s, w2s, b2s)
        ref = jax.vmap(one_ref)(w1s, b1s, w2s, b2s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        g = jax.grad(lambda ws: jnp.sum(jax.vmap(one)(
            ws, b1s, w2s, b2s) ** 2))(w1s)
        g_ref = jax.grad(lambda ws: jnp.sum(jax.vmap(one_ref)(
            ws, b1s, w2s, b2s) ** 2))(w1s)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=5e-4, rtol=1e-4)

    def test_pick_tiles(self):
        assert _pick_tiles(928, 2048) == (464, 512)
        assert _pick_tiles(512, 2048) == (512, 512)
        assert _pick_tiles(16, 32) == (16, 32)
        # ragged TAIL batches (m = b_tail*116, reference runs every
        # batch): no candidate divides -> full-dim row block, which is
        # the only other legal Mosaic tiling. Regression for a real-TPU
        # lowering failure: a 116-row tile (not a multiple of 8) crashed
        # the tail-batch program of real training runs.
        assert _pick_tiles(348, 2048) == (348, 512)
        for m in range(1, 1200):
            bm, _ = _pick_tiles(m, 2048)
            assert bm == m or bm % 16 == 0, m

    def test_tail_batch_row_counts(self):
        """Tail-batch row counts (m = b*116) run through the kernel."""
        rs = np.random.RandomState(7)
        for b in (1, 3, 5):
            m = b * 116
            x = _rand(rs, m, 8)
            w1, b1, w2, b2 = _params(rs, 8, 64, 8)
            out = fused_ffn(x, w1, b1, w2, b2, SEED0, 0.0, True)
            ref = _xla_reference(x, w1, b1, w2, b2)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=1e-5)

    def test_module_wiring_param_tree(self, monkeypatch):
        """FFNetwork's fused path must declare the identical param tree
        (scopes, names, shapes, init values) as the XLA path."""
        from cpc2_tpu.models.transformer import FFNetwork
        rs = np.random.RandomState(5)
        x = _rand(rs, 2, 16, 8)
        mod = FFNetwork(din=8, dout=8, dff=32, dropout=0.1)
        p_xla = mod.init({'params': jax.random.PRNGKey(7)}, x, True)
        monkeypatch.setenv('CPC2_FUSED_FFN', '1')
        monkeypatch.setenv('CPC2_FUSED_FFN_INTERPRET', '1')
        p_fused = mod.init({'params': jax.random.PRNGKey(7)}, x, True)
        assert jax.tree_util.tree_structure(p_xla) == \
            jax.tree_util.tree_structure(p_fused)
        for a, b in zip(jax.tree_util.tree_leaves(p_xla),
                        jax.tree_util.tree_leaves(p_fused)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # deterministic forward agrees between the two paths
        y_fused = mod.apply(p_fused, x, True)
        monkeypatch.delenv('CPC2_FUSED_FFN')
        y_xla = mod.apply(p_xla, x, True)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_xla),
                                   atol=2e-5, rtol=1e-5)
