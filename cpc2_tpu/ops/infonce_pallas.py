"""Fused InfoNCE negative scoring: one-hot selection kernels, no gather.

Replaces the XLA formulation in `losses/criterion.py` (gather N whole
encoding rows per position, then a batched dot):

    neg_z = z_flat[neg_idx]            # (B, W, N, D) — 121 MB materialized
    neg   = einsum('bkwd,bwnd->bkwn', preds, neg_z)

whose backward scatter-add of d(neg_z) profiled 1.2 ms/step (15% of the
train step) on a v5-lite chip, with the forward gather another 0.36 ms.

Here nothing is ever row-gathered or scattered, and (since round 3)
nothing (B, W, K, P)-shaped ever touches HBM either:

  forward   ONE kernel per (batch row, 8-window block):
            scores = preds_block @ zᵀ on the MXU with the whole
            (P, D) encoding pool VMEM-resident, split into three bf16
            planes (hi/mid/lo >= 24 mantissa bits) IN REGISTERS, then the
            N sampled candidates SELECTED by a per-position one-hot
            matmul. One-hot multiplies each addend by exactly 1.0/0.0,
            so summing the three selected planes reassembles the f32
            score. The all-pool score matrix and its bf16 planes —
            47 + 70 MB/step at the recipe — exist only in VMEM.

  backward  the same fusion in reverse: per position the transposed
            one-hot matmul SPREADS the cotangent to pool coordinates
            (hi/lo bf16 split keeps it f32-exact), and the block's
            (K·8, P) spread matrix immediately contracts against the
            resident pool for d_preds and against the preds block into a
            VMEM-accumulated (P, D) d_z — the dense (B, W, K, P)
            d_scores tensor (47 MB written + read twice by the two XLA
            einsums it replaced) never exists.

The kernels do no dynamic indexing at all: the grid's BlockSpec pipeline
DMAs the (b, w-block) slices, which is what makes the per-position
one-hot formulation cheap, and d_z uses a constant-index output block —
accumulated across the sequential TPU grid like the LSTM kernel's
weight gradients.

Values match the XLA path to fp32 association-order tolerance (same
per-element products, different accumulation order). Validated against
the einsum formulation in tests/test_infonce_pallas.py (interpret mode on
CPU + gradient checks).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .backend import tpu_backend_available
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WB = 8  # window positions per grid cell (matches the sublane tile)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _onehot(idx_row, p, n):
    """(P, N) bf16 one-hot: column j selects pool row idx_row[j]."""
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
    return (iota_p == idx_row.reshape(1, n)).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Forward kernel: out[b, w, k, n] = preds[b, k, w, :] . z[idx[b, w, n], :]
# ---------------------------------------------------------------------------

def _fwd_kernel(preds_ref, z_ref, idx_ref, out_ref, *, k_p, wb, p, n):
    # Blocks: preds (1, K, WB, D), z (P, D) resident, idx (1, WB, N),
    # out (1, WB, K, N).
    d = preds_ref.shape[3]
    pr = preds_ref[0].reshape(k_p * wb, d)             # rows: k·wb + w
    scores = jax.lax.dot_general(
        pr, z_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (K·WB, P) f32
    # f32 -> three bf16 planes, in VMEM only
    hi = scores.astype(jnp.bfloat16)
    rem = scores - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    hi3 = hi.reshape(k_p, wb, p)
    mid3 = mid.reshape(k_p, wb, p)
    lo3 = lo.reshape(k_p, wb, p)
    for w in range(wb):
        onehot = _onehot(idx_ref[0, w, :], p, n)       # (P, N)
        stacked = jnp.concatenate(
            [hi3[:, w], mid3[:, w], lo3[:, w]], axis=0)  # (3K, P)
        sel = jax.lax.dot_general(
            stacked, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (3K, N)
        out_ref[0, w] = sel[:k_p] + sel[k_p:2 * k_p] + sel[2 * k_p:]


def _fwd_call(preds, z, idx, interpret):
    b, k_p, w_p, d = preds.shape
    p = z.shape[0]
    n = idx.shape[2]
    wb = _WB
    kern = functools.partial(_fwd_kernel, k_p=k_p, wb=wb, p=p, n=n)
    return pl.pallas_call(
        kern,
        grid=(b, w_p // wb),
        in_specs=[
            pl.BlockSpec((1, k_p, wb, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wb, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wb, k_p, n), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w_p, k_p, n), jnp.float32),
        interpret=interpret,
    )(preds, z, idx)


# ---------------------------------------------------------------------------
# Backward kernel: spread g to pool coords, contract for dpreds and dz
# ---------------------------------------------------------------------------

def _bwd_kernel(g_ref, idx_ref, preds_ref, z_ref, dpreds_ref, dz_ref,
                dsc_scratch, *, k_p, wb, p, n):
    # Blocks: g (1, WB, K, N) f32, idx (1, WB, N), preds (1, K, WB, D),
    # z (P, D) resident; outputs dpreds (1, K, WB, D), dz (P, D)
    # accumulated across the whole sequential grid.
    d = preds_ref.shape[3]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_dz():
        dz_ref[...] = jnp.zeros_like(dz_ref)

    for w in range(wb):
        # hi/lo bf16 split keeps the spread gradient f32-accurate; the
        # extra rows are free (the matmul pads to 128 rows regardless).
        g_w = g_ref[0, w]                              # (K, N) f32
        g_hi = g_w.astype(jnp.bfloat16)
        g_lo = (g_w - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        stacked = jnp.concatenate([g_hi, g_lo], axis=0)  # (2K, N)
        onehot = _onehot(idx_ref[0, w, :], p, n)       # (P, N)
        dsc = jax.lax.dot_general(
            stacked, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (2K, P)
        dsc_scratch[:, w, :] = dsc[:k_p] + dsc[k_p:]   # rows k·wb + w
    dsc_all = dsc_scratch[...].reshape(k_p * wb, p)    # (K·WB, P) f32
    dpreds_ref[0] = jax.lax.dot_general(
        dsc_all, z_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(k_p, wb, d)
    pr = preds_ref[0].reshape(k_p * wb, d)
    dz_ref[...] = dz_ref[...] + jax.lax.dot_general(
        dsc_all, pr, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (P, D)


def _bwd_call(g, idx, preds, z, interpret):
    b, k_p, w_p, d = preds.shape
    p = z.shape[0]
    n = idx.shape[2]
    wb = _WB
    kern = functools.partial(_bwd_kernel, k_p=k_p, wb=wb, p=p, n=n)
    return pl.pallas_call(
        kern,
        grid=(b, w_p // wb),
        in_specs=[
            pl.BlockSpec((1, wb, k_p, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wb, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_p, wb, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_p, wb, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            # accumulated across all grid cells (sequential TPU grid;
            # the block index is constant so the block stays in VMEM)
            pl.BlockSpec((p, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_p, w_p, d), jnp.float32),
            jax.ShapeDtypeStruct((p, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((k_p, wb, p), jnp.float32)],
        interpret=interpret,
    )(g, idx, preds, z)


# ---------------------------------------------------------------------------
# custom_vjp wrapper (operates on padded, aligned shapes)
# ---------------------------------------------------------------------------

def _scores_fwd_impl(preds, z, idx, interpret):
    out = _fwd_call(preds, z, idx, interpret)      # (B, Wp, K, N)
    return jnp.transpose(out, (0, 2, 1, 3))        # (B, K, Wp, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _negative_scores_padded(preds, z, idx, interpret):
    return _scores_fwd_impl(preds, z, idx, interpret)


def _padded_fwd(preds, z, idx, interpret):
    return _scores_fwd_impl(preds, z, idx, interpret), (preds, z, idx)


def _padded_bwd(interpret, res, g):
    preds, z, idx = res
    g_wk = jnp.transpose(g, (0, 2, 1, 3))               # (B, Wp, K, N)
    dpreds, dz = _bwd_call(g_wk, idx, preds, z, interpret)
    return dpreds, dz, jnp.zeros(idx.shape, jax.dtypes.float0)


_negative_scores_padded.defvjp(_padded_fwd, _padded_bwd)


def negative_scores_pallas(preds, z_flat, neg_idx, interpret: bool = False):
    """neg[b, k, w, n] = preds[b, k, w, :] . z_flat[neg_idx[b, w, n], :].

    preds: (B, K, W, D) f32; z_flat: (P, D) f32; neg_idx: (B, W, N) int32
    flat indices into P. Returns (B, K, W, N) f32 (raw dot, no scaling).
    Shapes are padded internally to TPU tile alignment and the result is
    sliced back; padded index rows select row 0 and are discarded (their
    cotangent is zero, so they contribute nothing to dz/dpreds).
    """
    b, k_p, w, d = preds.shape
    p = z_flat.shape[0]
    n = neg_idx.shape[2]
    w_pad = _round_up(w, _WB)
    n_pad = _round_up(n, 128)
    p_pad = _round_up(p, 128)

    preds_p = jnp.pad(preds.astype(jnp.float32),
                      ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
    z_p = jnp.pad(z_flat.astype(jnp.float32), ((0, p_pad - p), (0, 0)))
    idx_p = jnp.pad(neg_idx.astype(jnp.int32),
                    ((0, 0), (0, w_pad - w), (0, n_pad - n)))
    out = _negative_scores_padded(preds_p, z_p, idx_p, interpret)
    return out[:, :, :w, :n]


def use_pallas_negatives() -> bool:
    """Kernel is profitable (and compiled, not interpreted) on TPU only.

    Also honours an active `jax.default_device(cpu)` context: model/criterion
    init runs on the CPU backend (see `feature_loader.init_model`), where a
    compiled pallas_call cannot lower. CPC2_FUSED_INFONCE=0 opts out (the
    same env convention as the other fused kernels — used by
    `scripts/bench_kernel_ab.py` and for debugging)."""
    if os.environ.get('CPC2_FUSED_INFONCE', '').lower() in ('0', 'off',
                                                            'false'):
        return False
    return tpu_backend_available()
