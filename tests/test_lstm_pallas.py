"""Fused LSTM kernel (`ops/lstm_pallas.py`) vs the lax.scan formulation
in `models/ar.py:_lstm_scan` — interpret mode on CPU (no RNG in this
kernel, so coverage is complete here; speed is measured on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpc2_tpu.models.ar import _lstm_scan
from cpc2_tpu.ops.lstm_pallas import _pick_tc, fused_lstm


def _rand(rs, *shape):
    return jnp.asarray(rs.randn(*shape).astype(np.float32))


def _inputs(rs, b, t, h):
    gi = _rand(rs, b, t, 4 * h)
    h0 = _rand(rs, b, h)
    c0 = _rand(rs, b, h)
    w_hh = _rand(rs, 4 * h, h) * (1.0 / np.sqrt(h))
    b_hh = _rand(rs, 4 * h) * (1.0 / np.sqrt(h))
    return gi, h0, c0, w_hh, b_hh


class TestFusedLSTM:

    @pytest.mark.parametrize("b,t,h", [
        (2, 8, 8),       # single chunk
        (3, 64, 16),     # 2 chunks of 32
        (2, 116, 8),     # recipe-ish odd T -> tc=4
    ])
    def test_forward_matches_scan(self, b, t, h):
        rs = np.random.RandomState(0)
        gi, h0, c0, w_hh, b_hh = _inputs(rs, b, t, h)
        ys, hl, cl = fused_lstm(gi, h0, c0, w_hh, b_hh, True)
        ys_r, hl_r, cl_r = _lstm_scan(gi, h0, c0, w_hh, b_hh)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_r),
                                   atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(hl), np.asarray(hl_r),
                                   atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cl), np.asarray(cl_r),
                                   atol=2e-6, rtol=1e-5)

    @pytest.mark.parametrize("t", [8, 64])
    def test_grads_match_scan(self, t):
        b, h = 2, 8
        rs = np.random.RandomState(1)
        gi, h0, c0, w_hh, b_hh = _inputs(rs, b, t, h)
        tgt = _rand(rs, b, t, h)

        def loss(fn):
            def inner(gi, h0, c0, w_hh, b_hh):
                ys, hl, cl = fn(gi, h0, c0, w_hh, b_hh)
                # exercise every cotangent: ys, h_last AND c_last
                return (jnp.sum((ys - tgt) ** 2) + jnp.sum(hl ** 2)
                        + jnp.sum(cl * 0.5))
            return inner

        gk = jax.grad(loss(lambda *a: fused_lstm(*a, True)),
                      argnums=(0, 1, 2, 3, 4))(gi, h0, c0, w_hh, b_hh)
        gr = jax.grad(loss(_lstm_scan),
                      argnums=(0, 1, 2, 3, 4))(gi, h0, c0, w_hh, b_hh)
        for a, bb, name in zip(gk, gr, ['dgi', 'dh0', 'dc0', 'dw_hh',
                                        'db_hh']):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-4, rtol=1e-4, err_msg=name)

    def test_zero_carry(self):
        """h0 = c0 = 0, the training path."""
        b, t, h = 2, 32, 8
        rs = np.random.RandomState(2)
        gi, _, _, w_hh, b_hh = _inputs(rs, b, t, h)
        z = jnp.zeros((b, h), jnp.float32)
        ys, hl, cl = fused_lstm(gi, z, z, w_hh, b_hh, True)
        ys_r, hl_r, cl_r = _lstm_scan(gi, z, z, w_hh, b_hh)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_r),
                                   atol=2e-6, rtol=1e-5)

    def test_vmapped(self):
        """nn.vmap over prediction heads lifts the kernel with a leading
        grid dim (rnn_mode=LSTM predictors)."""
        k, b, t, h = 3, 2, 16, 8
        rs = np.random.RandomState(3)
        gis = _rand(rs, k, b, t, 4 * h)
        w_hhs = _rand(rs, k, 4 * h, h) * 0.3
        b_hhs = _rand(rs, k, 4 * h) * 0.3
        z = jnp.zeros((b, h), jnp.float32)

        def one(gi, w_hh, b_hh):
            return fused_lstm(gi, z, z, w_hh, b_hh, True)[0]

        def one_ref(gi, w_hh, b_hh):
            return _lstm_scan(gi, z, z, w_hh, b_hh)[0]

        out = jax.vmap(one)(gis, w_hhs, b_hhs)
        ref = jax.vmap(one_ref)(gis, w_hhs, b_hhs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6, rtol=1e-5)
        g = jax.grad(lambda ws: jnp.sum(jax.vmap(one)(
            gis, ws, b_hhs) ** 2))(w_hhs)
        g_ref = jax.grad(lambda ws: jnp.sum(jax.vmap(one_ref)(
            gis, ws, b_hhs) ** 2))(w_hhs)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)

    def test_pick_tc(self):
        assert _pick_tc(128, 8, 256) == 32
        # VMEM-aware: larger batches shrink the chunk (the backward's
        # (b, tc, 4H) blocks measured 21.6M/16M scoped-vmem at b=16
        # with tc=32)
        assert _pick_tc(128, 16, 256) == 16
        assert _pick_tc(128, 32, 256) == 8
        assert _pick_tc(128, 64, 256) == 128   # nothing fits -> gate off
        # no multiple-of-8 divisor -> whole T (legal full-dim block;
        # use_fused_lstm rejects it when T > 32 to bound the unroll)
        assert _pick_tc(116, 8, 256) == 116
        assert _pick_tc(7, 2, 8) == 7
        # Mosaic tiling: chunked blocks must be multiples of 8
        for t in range(2, 200):
            tc = _pick_tc(t, 2, 8)
            assert tc == t or tc % 8 == 0, t

    def test_gate_rejects_unchunkable_or_oversized(self, monkeypatch):
        from cpc2_tpu.ops.lstm_pallas import use_fused_lstm
        monkeypatch.setenv('CPC2_FUSED_LSTM_INTERPRET', '1')
        assert use_fused_lstm(8, 128, 256)
        assert use_fused_lstm(16, 128, 256)
        assert use_fused_lstm(32, 128, 256)
        assert not use_fused_lstm(64, 128, 256)  # no chunk fits VMEM
        assert use_fused_lstm(8, 16, 256)
        assert not use_fused_lstm(8, 116, 256)   # tail-ish T, no chunk

    def test_module_wiring(self, monkeypatch):
        """CPCAR through the fused path matches the scan path, including
        the threaded (h, c) carry."""
        from cpc2_tpu.models.ar import CPCAR
        b, t, d = 2, 32, 8
        rs = np.random.RandomState(4)
        x = _rand(rs, b, t, d)
        mod = CPCAR(dim_encoded=d, dim_output=d, keep_hidden=True,
                    n_levels=2, mode='LSTM')
        params = mod.init({'params': jax.random.PRNGKey(0)}, x)
        y_ref, hid_ref = mod.apply(params, x)
        y2_ref, _ = mod.apply(params, x, hid_ref)
        monkeypatch.setenv('CPC2_FUSED_LSTM_INTERPRET', '1')
        y, hid = mod.apply(params, x)
        y2, _ = mod.apply(params, x, hid)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-6, rtol=1e-5)
        for a, bb in zip(jax.tree_util.tree_leaves(hid),
                         jax.tree_util.tree_leaves(hid_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref),
                                   atol=2e-6, rtol=1e-5)
