"""Fused CPC conv encoder (Pallas, TPU): the whole 5-layer strided
conv -> ChannelNorm -> ReLU stack in one kernel, fwd and bwd.

Replaces the XLA path in `models/encoder.CPCEncoder` (reference
`cpc/model.py:63-108`: kernels 10/8/4/4/4, strides 5/4/2/2/2, pads
3/2/1/1/1, 160x downsampling) on the training hot path. The XLA
formulation is HBM-bound, not conv-bound: at the recipe it materializes
the (2B, 4096, C) first-layer activation (67 MB f32) plus every later
layer's activations/norm residuals in HBM on the forward AND reloads
them in the backward — ~0.85 ms/step of the profiled 4.6 ms step while
the conv custom-calls themselves are ~free (docs/performance.md).

This kernel keeps every intermediate in VMEM via a **polyphase
decomposition**: because the strides multiply to 160 and every layer's
remaining-stride product P_l divides its length, each layer's output
splits into P_l phase planes of exactly F = T/160 frames
(P = 32/8/4/2/1). Stored lane-interleaved as

    G_l[r, b*C:(b+1)*C] = h_l[P_l*(r-1) + (b - pad_{l+1})]

(with `k-s` duplicated edge blocks so taps that cross a frame-group
boundary stay lane-contiguous), every conv tap of the next layer becomes
a SINGLE aligned slice: layer l+1 phase q consumes
`G_l[1:F+1, s*q*C : (s*q+k)*C]` — one (F, k*C) x (k*C, C) MXU matmul per
phase, no strided access anywhere. The backward recomputes the forward
in VMEM (FLOPs are cheap here; bytes are not) and assembles each
lower-layer phase gradient from the <=2 (tap, phase) pairs that touch it
— all static slices.

Numerics: identical math to the XLA path under the default `bf16mix`
precision — conv inputs are rounded to bf16 exactly where XLA rounds
them (the stored activations), accumulation and all norm statistics are
f32, and there is no RNG — so outputs/gradients match to fp-reordering
tolerance (pinned by tests/test_encoder_pallas.py). Under
`--precision fp32` (matmul precision 'highest') the gate falls back to
the XLA path.

Measured on the v5-lite chip (docs/performance.md) the kernel is kept
**OPT-IN** (CPC2_FUSED_ENCODER=1): the forward wins (0.21 vs ~0.27 ms
inside the step) but the backward loses (1.08 vs ~0.54 ms) — the
recompute tax (3x the forward's MACs) plus Mosaic's per-dot issue
overhead at the polyphase's (F=128, .) granularity outweigh the HBM
traffic it eliminates, the same conclusion as the rejected fused
attention (`ops/attention_pallas.py`). Whole-step: 4.72 ms fused vs
4.59 ms XLA at the recipe. The polyphase decomposition itself is the
reusable result; an M-batched revision (phases stacked into the matmul
M dimension) would cut the dot count ~7x but its MAC floor still lands
within ~0.1 ms of the XLA backward, so it is not pursued.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .backend import tpu_backend_available
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Must equal models/encoder.CONV_STACK: (kernel, stride, padding) per layer.
CONV_STACK = ((10, 5, 3), (8, 4, 2), (4, 2, 1), (4, 2, 1), (4, 2, 1))
# Output phase counts P_l = prod of downstream strides.
PHASES = (32, 8, 4, 2, 1)
# G_l (output of layer l, l=0..3 here) lane-block counts B = P + k_next -
# s_next and block offset = pad_next.
GSPEC = ((36, 2), (10, 1), (6, 1), (4, 1))
# L1 consumes the x patch array G0 (F, W0): G0[u, m] = x[160u + m - 3];
# phase q reads lanes [5q, 5q+16) against a (16, C) zero-padded tap matrix.
W0 = 5 * 31 + 16  # = 171, padded to the next 16-multiple below
W0 = -(-W0 // 16) * 16  # 176


def _dotf(a, b):
    """(M, K) x (K, N) -> f32 (M, N)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _norm_stats(y, c, eps):
    """ChannelNorm statistics (unbiased variance, models/encoder.py)."""
    m = jnp.mean(y, axis=1, keepdims=True)
    d = y - m
    var = jnp.sum(d * d, axis=1, keepdims=True) / (c - 1)
    r = jax.lax.rsqrt(var + eps)
    return d * r, r  # normalized x-hat, rstd


def _store_phase(g_ref, h, q, p, boff, blocks, c, f):
    """Write phase q of a layer output into its G array: main block plus
    the duplicated edge blocks (row-shifted copies) that keep the next
    layer's boundary-crossing taps lane-contiguous."""
    g_ref[1:f + 1, (q + boff) * c:(q + boff + 1) * c] = h
    if q >= p - boff:               # left edge: c = q - p, rows shift +1
        b = q - p + boff
        g_ref[2:f + 2, b * c:(b + 1) * c] = h
    if q + p + boff < blocks:       # right edge: c = q + p, rows shift -1
        b = q + p + boff
        g_ref[0:f, b * c:(b + 1) * c] = h


def _forward_body(g0, w1_ref, w2_ref, w3_ref, w4_ref, w5_ref, bias_ref,
                  nw_ref, nb_ref, g_scr, c, f, eps):
    """Shared fwd walk. g0: (F, W0) f32 value. Fills the G scratches;
    returns the final (F, C) f32 output."""
    g1, g2, g3, g4 = g_scr
    for g in g_scr:
        g[...] = jnp.zeros(g.shape, g.dtype)

    def norm_relu(y, layer):
        xh, _ = _norm_stats(y, c, eps)
        a = xh * nw_ref[layer] + nb_ref[layer]
        return jnp.maximum(a, 0.0)

    w1 = w1_ref[...]
    for q in range(PHASES[0]):
        lhs = g0[:, 5 * q:5 * q + 16].astype(jnp.bfloat16)
        y = _dotf(lhs, w1) + bias_ref[0]
        _store_phase(g1, norm_relu(y, 0).astype(jnp.bfloat16), q,
                     PHASES[0], GSPEC[0][1], GSPEC[0][0], c, f)
    specs = ((g1, g2, w2_ref, 4, 8, 1), (g2, g3, w3_ref, 2, 4, 2),
             (g3, g4, w4_ref, 2, 4, 3))
    for g_in, g_out, w_ref, s, k, layer in specs:
        w = w_ref[...]
        p_out = PHASES[layer]
        blocks, boff = GSPEC[layer]
        for q in range(p_out):
            lhs = g_in[1:f + 1, s * q * c:(s * q + k) * c]
            y = _dotf(lhs, w) + bias_ref[layer]
            _store_phase(g_out, norm_relu(y, layer).astype(jnp.bfloat16),
                         q, p_out, boff, blocks, c, f)
    y = _dotf(g4[1:f + 1, 0:4 * c], w5_ref[...]) + bias_ref[4]
    return norm_relu(y, 4)


def _fwd_kernel(g0_ref, w1_ref, w2_ref, w3_ref, w4_ref, w5_ref,
                bias_ref, nw_ref, nb_ref, out_ref,
                g1, g2, g3, g4, *, c, f, eps):
    out_ref[0] = _forward_body(
        g0_ref[0], w1_ref, w2_ref, w3_ref, w4_ref, w5_ref, bias_ref,
        nw_ref, nb_ref, (g1, g2, g3, g4), c, f, eps)


def _dh_pairs(p, s, k, pad, p_in, p_out):
    """Static (phase q, tap j, row shift) list: which outputs of the
    consuming layer touch input phase p. m = P_in*u + (s*q + j - pad)."""
    out = []
    c_max = s * (p_out - 1) + k - 1 - pad
    for cc in (p - p_in, p, p + p_in):
        if cc < -pad or cc > c_max:
            continue
        for q in range(p_out):
            j = cc + pad - s * q
            if 0 <= j < k:
                out.append((q, j, (p - cc) // p_in))
    return out


def _bwd_kernel(g0_ref, gz_ref, w1_ref, w2_ref, w3_ref, w4_ref, w5_ref,
                bias_ref, nw_ref, nb_ref,
                dx_ref, dw1_ref, dw2_ref, dw3_ref, dw4_ref, dw5_ref,
                db_ref, dnw_ref, dnb_ref,
                g1, g2, g3, g4, dyp2, dyp3, dyp4, dyp5, dg0,
                *, c, f, eps):
    i = pl.program_id(0)
    g0 = g0_ref[0].astype(jnp.float32)
    g_scr = (g1, g2, g3, g4)
    _forward_body(g0, w1_ref, w2_ref, w3_ref, w4_ref, w5_ref, bias_ref,
                  nw_ref, nb_ref, g_scr, c, f, eps)

    for dyp in (dyp2, dyp3, dyp4, dyp5):
        dyp[...] = jnp.zeros(dyp.shape, dyp.dtype)

    db_rows, dnw_rows, dnb_rows = [None] * 5, [None] * 5, [None] * 5
    dw_acc = [None] * 5

    def layer_bwd(layer, lhs, dh):
        """relu -> affine -> ChannelNorm -> conv backward for one phase.
        lhs: (F, k*C) bf16 conv input; dh: (F, C) f32 grad at the layer
        output. Returns dy (grad at the conv output, f32)."""
        w_ref = (w1_ref, w2_ref, w3_ref, w4_ref, w5_ref)[layer]
        y = _dotf(lhs, w_ref[...]) + bias_ref[layer]
        xh, r = _norm_stats(y, c, eps)
        a = xh * nw_ref[layer] + nb_ref[layer]
        da = jnp.where(a > 0, dh, 0.0)
        _acc(dnw_rows, layer, jnp.sum(da * xh, axis=0))
        _acc(dnb_rows, layer, jnp.sum(da, axis=0))
        dxh = da * nw_ref[layer]
        dy = r * (dxh - jnp.mean(dxh, axis=1, keepdims=True)
                  - xh * (jnp.sum(dxh * xh, axis=1, keepdims=True)
                          / (c - 1)))
        _acc(db_rows, layer, jnp.sum(dy, axis=0))
        dw = jax.lax.dot_general(
            lhs, dy.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw_acc[layer] = dw if dw_acc[layer] is None else dw_acc[layer] + dw
        return dy

    def _acc(rows, layer, val):
        rows[layer] = val if rows[layer] is None else rows[layer] + val

    def dh_from(dyp, w_ref, p, spec):
        """Assemble the grad of input phase p from the consumer's stored
        dy planes (halo'd (P_out, F+2, C) bf16)."""
        s, k, pad, p_in, p_out = spec
        dh = jnp.zeros((f, c), jnp.float32)
        for q, j, du in _dh_pairs(p, s, k, pad, p_in, p_out):
            dy = dyp[q, 1 + du:1 + du + f, :]
            dh = dh + jax.lax.dot_general(
                dy, w_ref[j * c:(j + 1) * c, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return dh

    # L5 (single phase)
    dy = layer_bwd(4, g4[1:f + 1, 0:4 * c], gz_ref[0].astype(jnp.float32))
    dyp5[0, 1:f + 1, :] = dy.astype(jnp.bfloat16)
    # L4
    for p in range(PHASES[3]):
        dh = dh_from(dyp5, w5_ref, p, (2, 4, 1, 2, 1))
        dy = layer_bwd(3, g3[1:f + 1, 2 * p * c:(2 * p + 4) * c], dh)
        dyp4[p, 1:f + 1, :] = dy.astype(jnp.bfloat16)
    # L3
    for p in range(PHASES[2]):
        dh = dh_from(dyp4, w4_ref, p, (2, 4, 1, 4, 2))
        dy = layer_bwd(2, g2[1:f + 1, 2 * p * c:(2 * p + 4) * c], dh)
        dyp3[p, 1:f + 1, :] = dy.astype(jnp.bfloat16)
    # L2
    for p in range(PHASES[1]):
        dh = dh_from(dyp3, w3_ref, p, (2, 4, 1, 8, 4))
        dy = layer_bwd(1, g1[1:f + 1, 4 * p * c:(4 * p + 8) * c], dh)
        dyp2[p, 1:f + 1, :] = dy.astype(jnp.bfloat16)
    # L1 (+ dG0 for dx)
    dg0[...] = jnp.zeros(dg0.shape, dg0.dtype)
    for p in range(PHASES[0]):
        dh = dh_from(dyp2, w2_ref, p, (4, 8, 2, 32, 8))
        lhs = g0[:, 5 * p:5 * p + 16].astype(jnp.bfloat16)
        dy = layer_bwd(0, lhs, dh)
        dg0[:, 5 * p:5 * p + 16] = dg0[:, 5 * p:5 * p + 16] + \
            jax.lax.dot_general(
                dy.astype(jnp.bfloat16), w1_ref[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    dx_ref[0] = dg0[...]

    dnw = jnp.stack(dnw_rows)
    dnb = jnp.stack(dnb_rows)
    db = jnp.stack(db_rows)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = dw_acc[0]
        dw2_ref[...] = dw_acc[1]
        dw3_ref[...] = dw_acc[2]
        dw4_ref[...] = dw_acc[3]
        dw5_ref[...] = dw_acc[4]
        db_ref[...] = db
        dnw_ref[...] = dnw
        dnb_ref[...] = dnb

    @pl.when(i > 0)
    def _accum():
        dw1_ref[...] += dw_acc[0]
        dw2_ref[...] += dw_acc[1]
        dw3_ref[...] += dw_acc[2]
        dw4_ref[...] += dw_acc[3]
        dw5_ref[...] += dw_acc[4]
        db_ref[...] += db
        dnw_ref[...] += dnw
        dnb_ref[...] += dnb


# ---------------------------------------------------------------------------
# Host-side packing / calls
# ---------------------------------------------------------------------------

def _patches(x, f):
    """(N, T) waveform -> (N, F, W0) f32 with G0[u, m] = x[160u + m - 3]
    (zeros outside). Cheap XLA relayout of the tiny input."""
    n = x.shape[0]
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (3, W0 - 3)))
    a = xp[:, :160 * f].reshape(n, f, 160)
    b = xp[:, 160:160 + 160 * f].reshape(n, f, 160)[:, :, :W0 - 160]
    return jnp.concatenate([a, b], axis=2)


def _unpatch(dg0, t, f):
    """Adjoint of `_patches`: overlap-add (N, F, W0) -> (N, T)."""
    n = dg0.shape[0]
    xp = jnp.zeros((n, t + 3 + W0 - 3), jnp.float32)
    xp = xp.at[:, :160 * f].add(dg0[:, :, :160].reshape(n, -1))
    xp = xp.at[:, 160:160 + 160 * f].add(
        jnp.pad(dg0[:, :, 160:], ((0, 0), (0, 0), (0, 160 - (W0 - 160))))
        .reshape(n, -1))
    return xp[:, 3:3 + t]


def _pack(conv_w, conv_b, norm_w, norm_b, c):
    """Torch-layout params -> kernel operands (taps stacked along rows,
    j-major; L1 zero-padded 10 -> 16)."""
    w1 = jnp.transpose(conv_w[0][:, 0, :], (1, 0))           # (10, C)
    w1 = jnp.pad(w1, ((0, 6), (0, 0))).astype(jnp.bfloat16)  # (16, C)
    ws = [w1]
    for l in range(1, 5):
        k = CONV_STACK[l][0]
        ws.append(jnp.transpose(conv_w[l], (2, 1, 0))
                  .reshape(k * c, c).astype(jnp.bfloat16))
    bias = jnp.stack([b.astype(jnp.float32) for b in conv_b])
    nw = jnp.stack([w.astype(jnp.float32) for w in norm_w])
    nb = jnp.stack([b.astype(jnp.float32) for b in norm_b])
    return ws, bias, nw, nb


def _unpack_dw(dws, c):
    """Kernel dW outputs -> torch-layout conv weight grads."""
    out = [jnp.transpose(dws[0][:10, :], (1, 0)).reshape(c, 1, 10)]
    for l in range(1, 5):
        k = CONV_STACK[l][0]
        out.append(jnp.transpose(dws[l].reshape(k, c, c), (2, 1, 0)))
    return tuple(out)


def _scratches(c, f, bwd):
    bf = jnp.bfloat16
    g = [pltpu.VMEM((f + 2, blocks * c), bf) for blocks, _ in GSPEC]
    if not bwd:
        return g
    dyp = [pltpu.VMEM((PHASES[l], f + 2, c), bf) for l in (1, 2, 3, 4)]
    return g + dyp + [pltpu.VMEM((f, W0), jnp.float32)]


def _fwd_call(x, conv_w, conv_b, norm_w, norm_b, interpret):
    n, t = x.shape
    c = conv_w[0].shape[0]
    f = t // 160
    g0 = _patches(x, f)
    ws, bias, nw, nb = _pack(conv_w, conv_b, norm_w, norm_b, c)
    kern = functools.partial(_fwd_kernel, c=c, f=f, eps=1e-5)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, f, W0), lambda i: (i, 0, 0))]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in ws]
        + [pl.BlockSpec((5, c), lambda i: (0, 0))] * 3,
        out_specs=pl.BlockSpec((1, f, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, f, c), jnp.float32),
        scratch_shapes=_scratches(c, f, bwd=False),
        interpret=interpret,
    )(g0, *ws, bias, nw, nb)
    return out


def _bwd_call(x, conv_w, conv_b, norm_w, norm_b, gz, interpret):
    n, t = x.shape
    c = conv_w[0].shape[0]
    f = t // 160
    g0 = _patches(x, f)
    ws, bias, nw, nb = _pack(conv_w, conv_b, norm_w, norm_b, c)
    kern = functools.partial(_bwd_kernel, c=c, f=f, eps=1e-5)
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    outs = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, f, W0), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, f, c), lambda i: (i, 0, 0))]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in ws]
        + [pl.BlockSpec((5, c), lambda i: (0, 0))] * 3,
        out_specs=[pl.BlockSpec((1, f, W0), lambda i: (i, 0, 0))]
        + [pl.BlockSpec(s.shape, lambda i: (0, 0)) for s in dw_shapes]
        + [pl.BlockSpec((5, c), lambda i: (0, 0))] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, f, W0), jnp.float32)]
        + dw_shapes
        + [jax.ShapeDtypeStruct((5, c), jnp.float32)] * 3,
        scratch_shapes=_scratches(c, f, bwd=True),
        # The bwd cell's residents (G phase planes + resident dW blocks +
        # weights) sum just past Mosaic's default 16 MB scoped-vmem limit
        # at the recipe (measured 16.95 MB); the chip has far more VMEM
        # and the blocks are small, so raise the per-kernel cap instead
        # of splitting the kernel.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 2 ** 20) if not interpret else None,
        interpret=interpret,
    )(g0, gz, *ws, bias, nw, nb)
    dg0, dw1, dw2, dw3, dw4, dw5, db, dnw, dnb = outs
    dx = _unpatch(dg0, t, f).astype(x.dtype)
    d_conv_w = _unpack_dw([dw1, dw2, dw3, dw4, dw5], c)
    d_conv_b = tuple(db[l] for l in range(5))
    d_norm_w = tuple(dnw[l] for l in range(5))
    d_norm_b = tuple(dnb[l] for l in range(5))
    return dx, d_conv_w, d_conv_b, d_norm_w, d_norm_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_encoder(x, conv_w, conv_b, norm_w, norm_b, interpret=False):
    """5x (strided conv -> ChannelNorm -> ReLU) fused; torch-layout params.

    x: (N, T) waveform, T a multiple of 160; conv_w: 5-tuple of
    (C, C_in, K) kernels; conv_b / norm_w / norm_b: 5-tuples of (C,).
    Returns (N, T//160, C) f32 encoded frames.
    """
    return _fwd_call(x, conv_w, conv_b, norm_w, norm_b, interpret)


def _enc_fwd(x, conv_w, conv_b, norm_w, norm_b, interpret):
    out = _fwd_call(x, conv_w, conv_b, norm_w, norm_b, interpret)
    return out, (x, conv_w, conv_b, norm_w, norm_b)


def _enc_bwd(interpret, res, gz):
    x, conv_w, conv_b, norm_w, norm_b = res
    return _bwd_call(x, conv_w, conv_b, norm_w, norm_b,
                     gz.astype(jnp.float32), interpret)


fused_encoder.defvjp(_enc_fwd, _enc_bwd)


def _interpret() -> bool:
    """Run the kernel in interpret mode (CPU tests of the module wiring)."""
    return os.environ.get('CPC2_FUSED_ENCODER_INTERPRET', '') == '1'


def _vmem_bytes(c: int, f: int) -> int:
    """Rough peak VMEM of the backward cell (the bigger of the two)."""
    g = sum(blocks for blocks, _ in GSPEC) * (f + 2) * c * 2
    dyp = sum(PHASES[1:]) * (f + 2) * c * 2
    dg0 = f * W0 * 4
    weights = (16 + 20 * c) * c * 2
    dw = (16 + 20 * c) * c * 4
    blocks = 2 * (f * W0 * 4 + f * c * 4) * 2
    return g + dyp + dg0 + weights + dw + blocks


def use_fused_encoder(n: int, t: int, c: int,
                      conv_stack=None, norm_mode: str = 'layerNorm',
                      dtype=jnp.float32) -> bool:
    """Use the fused kernel? **OPT-IN** (CPC2_FUSED_ENCODER=1): measured
    SLOWER than the XLA path whole-step at the recipe (4.72 vs 4.59 ms —
    see the module docstring), so default OFF everywhere.

    Even when forced it falls back to the XLA path for: non-layerNorm
    encoders (the polyphase walk needs a per-timestep-local norm), a
    conv stack different from the reference architecture, T not a
    multiple of 160, channel counts off the 128-lane grid, f32-forced
    matmuls (`--precision fp32` wants XLA's multi-pass f32 convs; the
    kernel computes taps in bf16 exactly like the default bf16mix path),
    non-f32 inputs, VMEM-busting shapes, and non-TPU backends.
    CPC2_FUSED_ENCODER_INTERPRET=1 runs interpreted on any backend (test
    hook).
    """
    env = os.environ.get('CPC2_FUSED_ENCODER', '').lower()
    if env not in ('1', 'on', 'true') and not _interpret():
        return False
    if norm_mode != 'layerNorm':
        return False
    if conv_stack is not None and tuple(conv_stack) != CONV_STACK:
        return False
    if t % 160 or t <= 0 or c % 128 or dtype != jnp.float32:
        return False
    if _vmem_bytes(c, t // 160) > 18 * 2 ** 20:
        return False
    if _interpret():
        return True
    if not tpu_backend_available():
        return False
    try:
        if jax.config.jax_default_matmul_precision in ('highest',
                                                       'float32'):
            return False
        return True
    except Exception:
        return False
