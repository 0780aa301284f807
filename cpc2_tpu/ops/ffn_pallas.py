"""Fused position-wise FFN (lin1 -> ReLU -> dropout -> lin2) in Pallas.

Targets the prediction heads' FFNetwork (reference `cpc/transformers.py:
107-116`, ours `models/transformer.py:FFNetwork`), the hottest block of
the training step: the 12 vmapped heads each run a (B*W, 256) x
(256, 2048) x (2048, 256) chain whose 2048-wide hidden tensors are the
largest activations in the program (91 MB f32 per tensor per step at
batch 8 counting all heads). The XLA formulation materializes the hidden
(and its ReLU/dropout images) in HBM in the forward AND loads them back
in the backward — the profiled reason the heads are HBM-bound
(`docs/performance.md`).

This kernel computes the whole chain per (row-tile, dff-chunk) grid cell
with the hidden resident in VMEM, and the backward RECOMPUTES the hidden
from x flash-attention-style instead of loading it: HBM traffic reduces
to x/g/weights and the (small) outputs. Layout notes:

* weights are torch-layout, as stored in our params: W1 (Dff, Din),
  W2 (Dout, Dff); the kernel contracts accordingly, f32 accumulation.
* forward grid (rows, dff-chunks): the output block (row-tile, Dout) is
  revisited across the INNER chunk axis, accumulating partial h@W2
  products — legal on TPU because the block index stays constant across
  consecutive grid steps.
* backward grid (dff-chunks, rows): dW1/dW2 chunk blocks stay resident
  across the inner row axis and accumulate; dx cannot accumulate there
  (its block index varies on the inner axis), so the kernel emits
  per-chunk partials dx_p (n_chunks, rows, Din) summed by XLA — a tiny
  (2, M, 256) tensor at the recipe's shapes.
* dropout uses the per-core hardware PRNG (`pltpu.prng_seed` /
  `prng_random_bits`), seeded per grid cell from a caller-supplied base
  seed; forward and backward regenerate bit-identical masks from the
  same seed. Same stance as the training CLI's `--prng rbg` default and
  `ops/attention_pallas.py`: the mask REALIZATION differs from the
  host/XLA path, the distribution (iid Bernoulli(rate), inverted
  scaling) is identical. With dropout off the kernel is numerically
  equivalent to the XLA chain (tested, incl. gradients, in
  tests/test_ffn_pallas.py).

Whether the kernel actually beats XLA at a given shape is an empirical
question (the fused attention kernel LOST at the recipe's shapes —
`attention_pallas.use_fused_attention`); it is wired opt-in via
CPC2_FUSED_FFN=1 and the measured numbers live in docs/performance.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .backend import tpu_backend_available
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(m: int, dff: int):
    """(row-tile, dff-chunk) sizes. The backward cell keeps ~3 hidden-chunk
    buffers plus 4 weight-chunk blocks (double-buffered) resident, so the
    hidden chunk is capped at 1 MB — a 2 MB cap measured 204 KB over the
    16 MB scoped-vmem limit at batch 32 (12 heads, m=3712).

    Mosaic requires the last-two block dims be multiples of the dtype
    tile (8/16 x 128) OR equal to the full array dim, so every row-tile
    candidate is a multiple of 16 (bf16-safe); when none divides m —
    e.g. ragged TAIL batches, m = b_tail*116 — the row tile falls back
    to the whole (legal) m and the VMEM gate in use_fused_ffn decides."""
    bm = m
    for cand in (512, 464, 256, 128):
        if m % cand == 0 and cand <= m:
            bm = cand
            break
    cff = dff
    for cand in (1024, 512, 256):
        if dff % cand == 0 and bm * cand * 4 <= 2 ** 20:
            cff = cand
            break
    return bm, cff


def _hidden_chunk(x, w1c, b1c, seed, rate, cell_idx):
    """relu(x @ W1cᵀ + b1c) with dropout, all f32, one dff chunk."""
    h = jax.lax.dot_general(
        x, w1c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b1c[0]
    h = jnp.maximum(h, 0.0)
    if rate > 0.0:
        pltpu.prng_seed(seed + cell_idx)
        bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
        drop = bits < np.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))
        h = jnp.where(drop, 0.0, h / (1.0 - rate))
    return h


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                rate, n_c):
    j = pl.program_id(0)
    c = pl.program_id(1)
    x = x_ref[...].astype(jnp.float32)
    h = _hidden_chunk(x, w1_ref[...].astype(jnp.float32),
                      b1_ref[...].astype(jnp.float32),
                      seed_ref[0, 0], rate, j * n_c + c)
    part = jax.lax.dot_general(
        h, w2_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # The out block is f32 regardless of activation dtype so the chunk
    # accumulation rounds once at the end (matching the XLA einsum's
    # single f32->activation-dtype rounding); the caller casts back.
    @pl.when(c == 0)
    def _init():
        o_ref[...] = part + b2_ref[...].astype(jnp.float32)[0]

    @pl.when(c > 0)
    def _acc():
        o_ref[...] = o_ref[...] + part


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                dxp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, rate, n_c):
    c = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    w1c = w1_ref[...].astype(jnp.float32)
    # recompute the hidden chunk (pre-activation kept for the ReLU grad)
    h_pre = jax.lax.dot_general(
        x, w1c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...].astype(
            jnp.float32)[0]
    h = jnp.maximum(h_pre, 0.0)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + j * n_c + c)
        bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
        drop = bits < np.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))
        keep_inv = 1.0 / (1.0 - rate)
        h_drop = jnp.where(drop, 0.0, h * keep_inv)
    else:
        h_drop = h
    # dW2 chunk += gᵀ-contracted hidden: (Dout, cff)
    dw2_part = jax.lax.dot_general(
        g, h_drop, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dh through dropout + ReLU
    dh = jax.lax.dot_general(
        g, w2_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rate > 0.0:
        dh = jnp.where(drop, 0.0, dh * keep_inv)
    dh = jnp.where(h_pre > 0.0, dh, 0.0)
    # dW1 chunk += dhᵀ x: (cff, Din); db1 chunk += Σ_rows dh
    dw1_part = jax.lax.dot_general(
        dh, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_part = jnp.sum(dh, axis=0, keepdims=True)
    # dx partial for this chunk: (bm, Din)
    dxp_ref[0] = jax.lax.dot_general(
        dh, w1c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxp_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dw1_ref[...] = dw1_part
        db1_ref[...] = db1_part
        dw2_ref[...] = dw2_part

    @pl.when(j > 0)
    def _acc():
        dw1_ref[...] = dw1_ref[...] + dw1_part
        db1_ref[...] = db1_ref[...] + db1_part
        dw2_ref[...] = dw2_ref[...] + dw2_part

    # db2 = Σ_rows g: accumulate on the chunk axis only once (c == 0),
    # across rows via the same resident-block trick (db2's index map is
    # constant, so the block stays in VMEM for the whole grid).
    @pl.when(jnp.logical_and(c == 0, j == 0))
    def _init_db2():
        db2_ref[...] = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(c == 0, j > 0))
    def _acc_db2():
        db2_ref[...] = db2_ref[...] + jnp.sum(g, axis=0, keepdims=True)


def _fwd_call(x, w1, b1, w2, b2, seed, rate, interpret):
    m, din = x.shape
    dff, dout = w1.shape[0], w2.shape[0]
    bm, cff = _pick_tiles(m, dff)
    n_c = dff // cff
    kern = functools.partial(_fwd_kernel, rate=rate, n_c=n_c)
    out = pl.pallas_call(
        kern,
        grid=(m // bm, n_c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, din), lambda j, c: (j, 0)),
            pl.BlockSpec((cff, din), lambda j, c: (c, 0)),
            pl.BlockSpec((1, cff), lambda j, c: (0, c)),
            pl.BlockSpec((dout, cff), lambda j, c: (0, c)),
            pl.BlockSpec((1, dout), lambda j, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, dout), lambda j, c: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((m, dout), jnp.float32),
        interpret=interpret,
    )(seed, x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out.astype(x.dtype)


def _bwd_call(x, w1, b1, w2, seed, g, rate, interpret):
    m, din = x.shape
    dff, dout = w1.shape[0], w2.shape[0]
    bm, cff = _pick_tiles(m, dff)
    n_c = dff // cff
    kern = functools.partial(_bwd_kernel, rate=rate, n_c=n_c)
    dxp, dw1, db1, dw2, db2 = pl.pallas_call(
        kern,
        grid=(n_c, m // bm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, din), lambda c, j: (j, 0)),
            pl.BlockSpec((cff, din), lambda c, j: (c, 0)),
            pl.BlockSpec((1, cff), lambda c, j: (0, c)),
            pl.BlockSpec((dout, cff), lambda c, j: (0, c)),
            pl.BlockSpec((bm, dout), lambda c, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, din), lambda c, j: (c, j, 0)),
            pl.BlockSpec((cff, din), lambda c, j: (c, 0)),
            pl.BlockSpec((1, cff), lambda c, j: (0, c)),
            pl.BlockSpec((dout, cff), lambda c, j: (0, c)),
            pl.BlockSpec((1, dout), lambda c, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_c, m, din), jnp.float32),
            jax.ShapeDtypeStruct((dff, din), jnp.float32),
            jax.ShapeDtypeStruct((1, dff), jnp.float32),
            jax.ShapeDtypeStruct((dout, dff), jnp.float32),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
        ],
        interpret=interpret,
    )(seed, x, w1, b1.reshape(1, -1), w2, g)
    dx = jnp.sum(dxp, axis=0).astype(x.dtype)
    return dx, dw1, db1.reshape(-1), dw2, db2.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_ffn(x, w1, b1, w2, b2, seed, dropout_rate=0.0, interpret=False):
    """lin2(dropout(relu(lin1(x)))) fused; torch-layout weights.

    x: (M, Din); w1: (Dff, Din); b1: (Dff,); w2: (Dout, Dff); b2: (Dout,);
    seed: (1, 1) int32 base dropout seed (ignored when dropout_rate == 0).
    Returns (M, Dout) in x's dtype, f32 accumulation throughout.
    """
    return _fwd_call(x, w1, b1, w2, b2, seed, dropout_rate, interpret)


def _ffn_fwd(x, w1, b1, w2, b2, seed, rate, interpret):
    out = _fwd_call(x, w1, b1, w2, b2, seed, rate, interpret)
    return out, (x, w1, b1, w2, seed)


def _ffn_bwd(rate, interpret, res, g):
    x, w1, b1, w2, seed = res
    dx, dw1, db1, dw2, db2 = _bwd_call(x, w1, b1, w2, seed, g, rate,
                                       interpret)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2, jnp.zeros(seed.shape,
                                                 jax.dtypes.float0))


fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def _interpret() -> bool:
    """Run the kernel in interpret mode (CPU tests of the module wiring)."""
    return os.environ.get('CPC2_FUSED_FFN_INTERPRET', '') == '1'


def use_fused_ffn(m: int, din: int, dff: int,
                  dropout_rate: float = 0.0, dout: int = 0) -> bool:
    """Use the fused kernel? Default ON for the TPU backend — measured
    faster than the XLA chain at every batch tried on the target chip
    (6.9%/6.5%/4% whole-step at batch 8/32/128; docs/performance.md),
    with deterministic forwards matching to fp-reordering (~5e-7) and
    the identical param tree.

    Overrides / fallbacks:
    * CPC2_FUSED_FFN=0 disables, =1 forces (backend-permitting) — the
      same env convention as CPC2_FUSED_ATTENTION.
    * with dropout ACTIVE the kernel draws masks from the on-chip
      hardware PRNG. Under the default `--prng rbg` that is the session's
      stance already; under `--prng threefry` (chosen for exact
      stream-replay debugging) auto mode falls back to the XLA chain so
      threefry reproducibility holds end to end.
    * non-TPU backends fall back (honours an active
      `jax.default_device(cpu)` during model init, like
      `attention_pallas.use_fused_attention`).
    * CPC2_FUSED_FFN_INTERPRET=1 forces the interpreted kernel on any
      backend (test hook).
    """
    env = os.environ.get('CPC2_FUSED_FFN', '').lower()
    if env in ('0', 'off', 'false'):
        return False
    forced = env in ('1', 'on', 'true')
    bm, cff = _pick_tiles(m, dff)
    if m % bm or dff % cff:
        return False
    # VMEM sanity for the chosen tiles: the backward keeps ~3 hidden-chunk
    # (bm, cff) buffers plus the weight-chunk blocks resident (the
    # measured budget behind _pick_tiles). Reject shapes whose hidden
    # chunk couldn't be capped, or whose (dout, cff) W2/dW2 blocks are
    # outsized — e.g. the multihead trunk's dout = nClassifiers*dmodel.
    if bm * cff * 4 > 2 ** 20:
        return False
    if dout and dout * cff * 4 > 2 * 2 ** 20:
        return False
    if _interpret():
        return True
    if not tpu_backend_available():
        return False
    try:
        if (not forced and dropout_rate > 0.0 and
                'rbg' not in str(jax.config.jax_default_prng_impl)):
            return False
        return True
    except Exception:
        return False
