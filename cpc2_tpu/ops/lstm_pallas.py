"""Fused LSTM recurrence (Pallas, TPU) for the CPC context net.

Replaces the `lax.scan` in `models/ar.py:_lstm_scan` (reference
`cpc/model.py:158-207`'s cuDNN LSTM) on the training/inference hot path.
The input-to-hidden projection stays an XLA einsum over all timesteps
(one large MXU matmul — `models/ar.py` design note); only the serial
hidden-to-hidden recurrence moves into the kernel:

* the grid iterates over TIME CHUNKS; h/c live in VMEM scratch, which
  persists across the TPU's sequential grid — the carry never
  round-trips HBM, and there is no per-step while-loop overhead (the
  chunk body is a static unroll);
* W_hh and b_hh stay resident in VMEM for the whole call (constant
  block index);
* the forward emits the per-step cell states and post-activation gates
  as residuals; the backward walks the chunks in REVERSE (reversed
  block index maps), accumulating dW_hh/db_hh in resident output
  blocks and emitting dgi for XLA's input-projection backward. The
  h_{t-1}/c_{t-1} each backward step needs arrive as SHIFTED sequences
  (`[h0, ys[:-1]]`) built by XLA, so chunk boundaries need no
  special-casing in-kernel;
* consumes/produces the module's natural (B, T, ·) layout — the XLA
  scan's (T, B, ·) swapaxes copies disappear.

Numerics: identical math to the XLA scan (same gate order i,f,g,o, f32
throughout); outputs match to fp-reordering tolerance, pinned by
tests/test_lstm_pallas.py (interpret mode, incl. gradients and the
(h0, c0) carry path used by `keepHidden` sequential sampling /
whole-file inference). No RNG anywhere, so the fused path changes no
training distribution — only scheduling.

Measured numbers live in docs/performance.md; gated by
`use_fused_lstm` (default on for the TPU backend, CPC2_FUSED_LSTM=0
opts out, =1 forces where lowerable).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .backend import tpu_backend_available
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tc(t: int, b: int, hdim: int) -> int:
    """Time-chunk size: a divisor of t bounding the static unroll AND the
    per-cell VMEM (the backward keeps ~4 (b, tc, 4H) chunk blocks plus
    their pipeline double-buffers resident — a (b*tc*4H) f32 chunk above
    1 MB measured 21.6M/16M scoped-vmem at batch 16). Candidates are
    multiples of 8 only — Mosaic requires the block's second-minor dim
    be a multiple of the dtype tile or the full array dim. When nothing
    fits, the whole t is returned (legal full-dim block) and
    use_fused_lstm decides."""
    for cand in (32, 16, 8):
        if t % cand == 0 and cand <= t and \
                b * cand * 4 * hdim * 4 <= 2 ** 20:
            return cand
    return t


def _cell(gi_t, h, c, w_hh_ref, b_hh_ref, hdim):
    """One LSTM step, torch gate order (i, f, g, o), f32."""
    gh = jax.lax.dot_general(
        h, w_hh_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    pre = gi_t + gh + b_hh_ref[...][0]
    i = jax.nn.sigmoid(pre[:, :hdim])
    f = jax.nn.sigmoid(pre[:, hdim:2 * hdim])
    g = jnp.tanh(pre[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(pre[:, 3 * hdim:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, i, f, g, o


def _fwd_kernel(gi_ref, h0_ref, c0_ref, w_hh_ref, b_hh_ref,
                ys_ref, cs_ref, ga_ref, hl_ref, cl_ref, h_scr, c_scr, *,
                tc, n_chunks, hdim):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _load_carry():
        h_scr[...] = h0_ref[...]
        c_scr[...] = c0_ref[...]

    h, c = h_scr[...], c_scr[...]
    for t in range(tc):                        # static unroll
        h, c, i, f, g, o = _cell(gi_ref[:, t], h, c, w_hh_ref, b_hh_ref,
                                 hdim)
        ys_ref[:, t] = h
        cs_ref[:, t] = c
        ga_ref[:, t] = jnp.concatenate([i, f, g, o], axis=-1)
    h_scr[...] = h
    c_scr[...] = c

    @pl.when(k == n_chunks - 1)
    def _store_last():
        hl_ref[...] = h
        cl_ref[...] = c


def _bwd_kernel(hp_ref, cp_ref, cs_ref, ga_ref, w_hh_ref, dys_ref,
                dhl_ref, dcl_ref,
                dgi_ref, dh0_ref, dc0_ref, dwhh_ref, dbhh_ref,
                dh_scr, dc_scr, *, tc, n_chunks, hdim):
    """Chunk k of the reversed walk (block maps feed chunks
    last-to-first); within the cell t runs tc-1 .. 0."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        dh_scr[...] = dhl_ref[...]
        dc_scr[...] = dcl_ref[...]
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[...] = jnp.zeros_like(dbhh_ref)

    dh_next, dc_next = dh_scr[...], dc_scr[...]
    dwhh = jnp.zeros_like(dwhh_ref)
    dbhh = jnp.zeros_like(dbhh_ref)
    for s in range(tc):                        # static unroll, reversed
        t = tc - 1 - s
        ga = ga_ref[:, t]
        i, f = ga[:, :hdim], ga[:, hdim:2 * hdim]
        g, o = ga[:, 2 * hdim:3 * hdim], ga[:, 3 * hdim:]
        tanh_c = jnp.tanh(cs_ref[:, t])
        dh = dys_ref[:, t] + dh_next
        do_pre = dh * tanh_c * o * (1.0 - o)
        dc = dc_next + dh * o * (1.0 - tanh_c * tanh_c)
        di_pre = dc * g * i * (1.0 - i)
        df_pre = dc * cp_ref[:, t] * f * (1.0 - f)
        dg_pre = dc * i * (1.0 - g * g)
        dgi = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
        dgi_ref[:, t] = dgi
        dh_next = jax.lax.dot_general(
            dgi, w_hh_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dc_next = dc * f
        dwhh = dwhh + jax.lax.dot_general(
            dgi, hp_ref[:, t], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbhh = dbhh + jnp.sum(dgi, axis=0, keepdims=True)
    dh_scr[...] = dh_next
    dc_scr[...] = dc_next
    dwhh_ref[...] = dwhh_ref[...] + dwhh
    dbhh_ref[...] = dbhh_ref[...] + dbhh

    @pl.when(k == n_chunks - 1)
    def _store_d0():
        dh0_ref[...] = dh_next
        dc0_ref[...] = dc_next


def _fwd_call(gi, h0, c0, w_hh, b_hh, interpret):
    b, t, g4 = gi.shape
    hdim = g4 // 4
    tc = _pick_tc(t, b, hdim)
    n_chunks = t // tc
    kern = functools.partial(_fwd_kernel, tc=tc, n_chunks=n_chunks,
                             hdim=hdim)
    f32 = jnp.float32
    ys, cs, ga, hl, cl = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b, tc, g4), lambda k: (0, k, 0)),
            pl.BlockSpec((b, hdim), lambda k: (0, 0)),
            pl.BlockSpec((b, hdim), lambda k: (0, 0)),
            pl.BlockSpec((g4, hdim), lambda k: (0, 0)),
            pl.BlockSpec((1, g4), lambda k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, tc, hdim), lambda k: (0, k, 0)),
            pl.BlockSpec((b, tc, hdim), lambda k: (0, k, 0)),
            pl.BlockSpec((b, tc, g4), lambda k: (0, k, 0)),
            pl.BlockSpec((b, hdim), lambda k: (0, 0)),
            pl.BlockSpec((b, hdim), lambda k: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, hdim), f32),
            jax.ShapeDtypeStruct((b, t, hdim), f32),
            jax.ShapeDtypeStruct((b, t, g4), f32),
            jax.ShapeDtypeStruct((b, hdim), f32),
            jax.ShapeDtypeStruct((b, hdim), f32),
        ],
        scratch_shapes=[pltpu.VMEM((b, hdim), f32),
                        pltpu.VMEM((b, hdim), f32)],
        interpret=interpret,
    )(gi, h0, c0, w_hh, b_hh.reshape(1, -1))
    return ys, cs, ga, hl, cl


def _bwd_call(hs_prev, cs_prev, cs, ga, w_hh, dys, dhl, dcl, interpret):
    b, t, hdim = cs.shape
    g4 = 4 * hdim
    tc = _pick_tc(t, b, hdim)
    n_chunks = t // tc
    kern = functools.partial(_bwd_kernel, tc=tc, n_chunks=n_chunks,
                             hdim=hdim)
    f32 = jnp.float32
    rev = n_chunks - 1
    dgi, dh0, dc0, dwhh, dbhh = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b, tc, hdim), lambda k: (0, rev - k, 0)),
            pl.BlockSpec((b, tc, hdim), lambda k: (0, rev - k, 0)),
            pl.BlockSpec((b, tc, hdim), lambda k: (0, rev - k, 0)),
            pl.BlockSpec((b, tc, g4), lambda k: (0, rev - k, 0)),
            pl.BlockSpec((g4, hdim), lambda k: (0, 0)),
            pl.BlockSpec((b, tc, hdim), lambda k: (0, rev - k, 0)),
            pl.BlockSpec((b, hdim), lambda k: (0, 0)),
            pl.BlockSpec((b, hdim), lambda k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, tc, g4), lambda k: (0, rev - k, 0)),
            pl.BlockSpec((b, hdim), lambda k: (0, 0)),
            pl.BlockSpec((b, hdim), lambda k: (0, 0)),
            pl.BlockSpec((g4, hdim), lambda k: (0, 0)),
            pl.BlockSpec((1, g4), lambda k: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, g4), f32),
            jax.ShapeDtypeStruct((b, hdim), f32),
            jax.ShapeDtypeStruct((b, hdim), f32),
            jax.ShapeDtypeStruct((g4, hdim), f32),
            jax.ShapeDtypeStruct((1, g4), f32),
        ],
        scratch_shapes=[pltpu.VMEM((b, hdim), f32),
                        pltpu.VMEM((b, hdim), f32)],
        interpret=interpret,
    )(hs_prev, cs_prev, cs, ga, w_hh, dys, dhl, dcl)
    return dgi, dh0, dc0, dwhh, dbhh.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_lstm(gi, h0, c0, w_hh, b_hh, interpret=False):
    """LSTM over precomputed input gates; (B, T, ·) layout throughout.

    gi: (B, T, 4H) = x @ W_ihᵀ + b_ih for every step; h0, c0: (B, H);
    w_hh: (4H, H) torch layout; b_hh: (4H,). All f32.
    Returns (ys (B, T, H), h_last, c_last) — same contract as
    `models/ar.py:_lstm_scan`.
    """
    ys, _cs, _ga, hl, cl = _fwd_call(gi, h0, c0, w_hh, b_hh, interpret)
    return ys, hl, cl


def _fl_fwd(gi, h0, c0, w_hh, b_hh, interpret):
    ys, cs, ga, hl, cl = _fwd_call(gi, h0, c0, w_hh, b_hh, interpret)
    return (ys, hl, cl), (ys, cs, ga, h0, c0, w_hh)


def _fl_bwd(interpret, res, g):
    ys, cs, ga, h0, c0, w_hh = res
    dys, dhl, dcl = g
    # h_{t-1}/c_{t-1} sequences: carry-in prepended, last step dropped.
    hs_prev = jnp.concatenate([h0[:, None, :], ys[:, :-1]], axis=1)
    cs_prev = jnp.concatenate([c0[:, None, :], cs[:, :-1]], axis=1)
    dgi, dh0, dc0, dwhh, dbhh = _bwd_call(
        hs_prev, cs_prev, cs, ga, w_hh, dys, dhl, dcl, interpret)
    return dgi, dh0, dc0, dwhh, dbhh


fused_lstm.defvjp(_fl_fwd, _fl_bwd)


def _interpret() -> bool:
    """Run the kernel in interpret mode (CPU tests of the module wiring)."""
    return os.environ.get('CPC2_FUSED_LSTM_INTERPRET', '') == '1'


def use_fused_lstm(b: int, t: int, hdim: int) -> bool:
    """Use the fused kernel? Default ON for the TPU backend (measured
    numbers in docs/performance.md). CPC2_FUSED_LSTM=0 disables, =1
    forces (backend-permitting); CPC2_FUSED_LSTM_INTERPRET=1 forces the
    interpreted kernel on any backend (test hook). Shape gate keeps the
    resident blocks inside VMEM: per-cell buffers scale with
    b*tc*8H + W_hh blocks."""
    env = os.environ.get('CPC2_FUSED_LSTM', '').lower()
    if env in ('0', 'off', 'false'):
        return False
    forced = env in ('1', 'on', 'true')
    if not forced:
        tc = _pick_tc(t, b, hdim)
        if tc > 32:
            # no fitting multiple-of-8 chunk divisor: a full-T block would
            # be legal but the unroll (and compile time) is unbounded
            return False
        # chunk blocks (gi/ga/dgi ~ b*tc*4H f32, pipeline double-buffered)
        # and the two (4H, H) weight blocks must fit in scoped VMEM
        if b * tc * 4 * hdim * 4 > 2 ** 20 or 4 * hdim * hdim * 4 > 2 ** 22:
            return False
    # forced=1 overrides the unroll/VMEM heuristics (an over-budget shape
    # fails loudly at compile time, never silently) but cannot fabricate
    # a TPU backend.
    if os.environ.get('CPC2_FUSED_LSTM_INTERPRET', '') == '1':
        return True
    return tpu_backend_available()
