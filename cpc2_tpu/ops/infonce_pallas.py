"""Fused InfoNCE negative scoring: one-hot selection kernels, no gather.

Replaces the XLA formulation in `losses/criterion.py` (gather N whole
encoding rows per position, then a batched dot):

    neg_z = z_flat[neg_idx]            # (B, W, N, D) — 121 MB materialized
    neg   = einsum('bkwd,bwnd->bkwn', preds, neg_z)

whose backward scatter-add of d(neg_z) profiled 1.2 ms/step (15% of the
train step) on a v5-lite chip, with the forward gather another 0.36 ms.

Here nothing is ever row-gathered or scattered:

  forward   scores_all = preds @ z^T — one dense MXU contraction (XLA).
            The N sampled candidates are then SELECTED by a per-position
            one-hot matmul in a Pallas kernel (grid (B, W); the one-hot
            lives only in VMEM). To keep the selected scores exact in f32
            on the bf16 MXU, scores_all is split into three bf16 planes
            (hi/mid/lo >= 24 mantissa bits); one-hot multiplies each
            addend by exactly 1.0/0.0, so summing the three selected
            planes reassembles the f32 score.

  backward  a second kernel SPREADS d_neg back to pool coordinates with
            the transposed one-hot matmul (dsc[b,k,w,p]); d_preds and d_z
            are then plain dense einsums — the scatter disappears.

The selection/spread kernels do no dynamic indexing at all: the grid's
BlockSpec pipeline DMAs the (b, w) slices, which is what makes the
per-position one-hot formulation cheap.

Values match the XLA path to fp32 association-order tolerance (same
per-element products, different accumulation order). Validated against
the einsum formulation in tests/test_infonce_pallas.py (interpret mode on
CPU + gradient checks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split_planes(scores: jax.Array) -> jax.Array:
    """f32 (..., P) -> bf16 (3, ..., P) hi/mid/lo planes summing to f32."""
    hi = scores.astype(jnp.bfloat16)
    rem = scores - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack([hi, mid, lo], axis=0)


# ---------------------------------------------------------------------------
# Selection kernel: out[b, :, w, n] = sum_planes planes[b, :, w, idx[b,w,n]]
# ---------------------------------------------------------------------------

def _select_kernel(planes_ref, idx_ref, out_ref):
    # Blocks: planes (3, 1, 1, K, P), idx (1, 1, 1, N), out (1, 1, K, N) —
    # the w axis sits OUTSIDE the minor-most two dims so the pipeline can
    # DMA per-position slices without tile-alignment constraints, and the
    # plane axis LEADS so jnp.stack(axis=0) never relayouts the planes.
    _, _, _, k_p, p = planes_ref.shape
    n = idx_ref.shape[3]
    idx_row = idx_ref[0, 0, 0, :].reshape(1, n)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
    onehot = (iota_p == idx_row).astype(jnp.bfloat16)          # (P, N)
    stacked = planes_ref[:, 0, 0].reshape(3 * k_p, p)          # (3K, P)
    sel = jax.lax.dot_general(
        stacked, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (3K, N)
    out_ref[0, 0] = sel[:k_p] + sel[k_p:2 * k_p] + sel[2 * k_p:]


def _select_call(planes, idx, interpret):
    _, b, w_p, k_p, p = planes.shape
    n = idx.shape[3]
    return pl.pallas_call(
        _select_kernel,
        grid=(b, w_p),
        in_specs=[
            pl.BlockSpec((3, 1, 1, k_p, p), lambda i, w: (0, i, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda i, w: (i, w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k_p, n), lambda i, w: (i, w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w_p, k_p, n), jnp.float32),
        interpret=interpret,
    )(planes, idx)


# ---------------------------------------------------------------------------
# Spread kernel (backward): dsc[b, k, w, p] = sum_n g[b,k,w,n] [idx==p]
# ---------------------------------------------------------------------------

def _spread_kernel(g_ref, idx_ref, dsc_ref):
    k_p, n = g_ref.shape[2:]
    p = dsc_ref.shape[3]
    idx_row = idx_ref[0, 0, 0, :].reshape(1, n)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
    onehot = (iota_p == idx_row).astype(jnp.bfloat16)          # (P, N)
    # hi/lo bf16 split keeps the spread gradient f32-accurate; the extra
    # rows are free (the matmul pads to 128 rows regardless).
    g_w = g_ref[0, 0]                                          # (K, N) f32
    g_hi = g_w.astype(jnp.bfloat16)
    g_lo = (g_w - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    stacked = jnp.concatenate([g_hi, g_lo], axis=0)            # (2K, N)
    dsc = jax.lax.dot_general(
        stacked, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (2K, P)
    dsc_ref[0, 0] = dsc[:k_p] + dsc[k_p:]


def _spread_call(g, idx, p, interpret):
    b, w_p, k_p, n = g.shape
    return pl.pallas_call(
        _spread_kernel,
        grid=(b, w_p),
        in_specs=[
            pl.BlockSpec((1, 1, k_p, n), lambda i, w: (i, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda i, w: (i, w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k_p, p), lambda i, w: (i, w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w_p, k_p, p), jnp.float32),
        interpret=interpret,
    )(g, idx)


# ---------------------------------------------------------------------------
# custom_vjp wrapper (operates on padded, aligned shapes)
# ---------------------------------------------------------------------------

def _scores_fwd_impl(preds, z, idx, interpret):
    scores = jnp.einsum('bkwd,pd->bwkp', preds, z,
                        preferred_element_type=jnp.float32)  # (B, Wp, K, P)
    planes = _split_planes(scores)                 # (3, B, Wp, K, P)
    out = _select_call(planes, idx, interpret)     # (B, Wp, K, N)
    return jnp.transpose(out, (0, 2, 1, 3))        # (B, K, Wp, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _negative_scores_padded(preds, z, idx, interpret):
    return _scores_fwd_impl(preds, z, idx, interpret)


def _padded_fwd(preds, z, idx, interpret):
    return _scores_fwd_impl(preds, z, idx, interpret), (preds, z, idx)


def _padded_bwd(interpret, res, g):
    preds, z, idx = res
    g_wk = jnp.transpose(g, (0, 2, 1, 3))               # (B, Wp, K, N)
    dsc = _spread_call(g_wk, idx, z.shape[0], interpret)  # (B, Wp, K, P)
    dpreds = jnp.einsum('bwkp,pd->bkwd', dsc, z,
                        preferred_element_type=jnp.float32)
    dz = jnp.einsum('bwkp,bkwd->pd', dsc, preds,
                    preferred_element_type=jnp.float32)
    return dpreds, dz, jnp.zeros(idx.shape, jax.dtypes.float0)


_negative_scores_padded.defvjp(_padded_fwd, _padded_bwd)


def negative_scores_pallas(preds, z_flat, neg_idx, interpret: bool = False):
    """neg[b, k, w, n] = preds[b, k, w, :] . z_flat[neg_idx[b, w, n], :].

    preds: (B, K, W, D) f32; z_flat: (P, D) f32; neg_idx: (B, W, N) int32
    flat indices into P. Returns (B, K, W, N) f32 (raw dot, no scaling).
    Shapes are padded internally to TPU tile alignment and the result is
    sliced back; padded index rows select row 0 and are discarded.
    """
    b, k_p, w, d = preds.shape
    p = z_flat.shape[0]
    n = neg_idx.shape[2]
    w_pad = _round_up(w, 8)
    n_pad = _round_up(n, 128)
    p_pad = _round_up(p, 128)

    preds_p = jnp.pad(preds.astype(jnp.float32),
                      ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
    z_p = jnp.pad(z_flat.astype(jnp.float32), ((0, p_pad - p), (0, 0)))
    idx_p = jnp.pad(neg_idx.astype(jnp.int32),
                    ((0, 0), (0, w_pad - w), (0, n_pad - n)))[:, :, None, :]
    out = _negative_scores_padded(preds_p, z_p, idx_p, interpret)
    return out[:, :, :w, :n]


def use_pallas_negatives() -> bool:
    """Kernel is profitable (and compiled, not interpreted) on TPU only.

    Also honours an active `jax.default_device(cpu)` context: model/criterion
    init runs on the CPU backend (see `feature_loader.init_model`), where a
    compiled pallas_call cannot lower."""
    try:
        if jax.default_backend() in ('cpu', 'gpu'):
            return False
        default_dev = getattr(jax.config, 'jax_default_device', None)
        if default_dev is not None and \
                getattr(default_dev, 'platform', None) != 'tpu':
            return False
        return True
    except Exception:
        return False
