"""Pallas TPU kernel for batched DTW with path-length normalization.

Same semantics as `ops/dtw.py:dtw_normalized` (which is itself validated
against the reference Cython DP `cpc/eval/ABX/dtw.pyx`), expressed as a
hand-written TPU kernel:

* the distance matrix is **skewed** into diagonal-major layout
  `skewed[k, b, i] = dist[b, i, k-i]` with a pure pad+reshape (no gather,
  which Mosaic does not lower for 3-D operands), so each DP step is a plain
  leading-axis dynamic slice;
* grid over blocks of pairs — each program keeps its wavefront stripes
  (two cost diagonals + two path-length diagonals) in VMEM scratch and never
  touches HBM inside the DP loop;
* the anti-diagonal recurrence is a `fori_loop` of pure VPU ops (shifted
  selects + minima) over S1+S2-1 steps;
* the tie-break rule (diag <= left <= up) reproduces the reference's
  backtracked path length forward, exactly as in `ops/dtw.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _skew(dist: jax.Array) -> jax.Array:
    """(B, S1, S2) -> (K, B, S1) with skewed[k, b, i] = dist[b, i, k-i]
    (junk where k-i is out of [0, S2)), via pad + reshape only."""
    b, s1, s2 = dist.shape
    k = s1 + s2 - 1
    x = jnp.pad(dist, ((0, 0), (0, 0), (0, s1)))       # (B, S1, S2+S1)
    x = x.reshape(b, s1 * (s2 + s1))
    x = x[:, :s1 * (s2 + s1 - 1)]
    x = x.reshape(b, s1, s2 + s1 - 1)                  # row i shifted by i
    return jnp.transpose(x[:, :, :k], (2, 0, 1))       # (K, B, S1)


def _dtw_kernel(diag_ref, n1_ref, n2_ref, out_ref,
                prev_c, prev2_c, prev_l, prev2_l):
    """One program handles a (K, BLOCK, S1) slab of skewed distances."""
    n_diag, block, s1 = diag_ref.shape
    s2 = n_diag - s1 + 1

    i_idx = jax.lax.broadcasted_iota(jnp.int32, (block, s1), 1)

    prev_c[:] = jnp.full((block, s1), _BIG, jnp.float32)
    prev2_c[:] = jnp.full((block, s1), _BIG, jnp.float32)
    prev_l[:] = jnp.zeros((block, s1), jnp.float32)
    prev2_l[:] = jnp.zeros((block, s1), jnp.float32)
    out_ref[:] = jnp.zeros((block, 2), jnp.float32)

    n1 = n1_ref[:, 0]                                  # (BLOCK,)
    n2 = n2_ref[:, 0]
    k_final = (n1 + n2 - 2)[:, None]                   # (BLOCK, 1)

    def shift_right(x, fill):
        # x[:, i-1] with x[:, -1] := fill
        return jnp.concatenate(
            [jnp.full((block, 1), fill, x.dtype), x[:, :-1]], axis=1)

    def body(k, _):
        j_idx = k - i_idx                              # (BLOCK, S1)
        valid = (j_idx >= 0) & (j_idx < s2)
        d_k = diag_ref[k]                              # (BLOCK, S1)

        c_left = prev_c[:]
        c_up = shift_right(prev_c[:], _BIG)
        c_diag = shift_right(prev2_c[:], _BIG)
        l_left = prev_l[:]
        l_up = shift_right(prev_l[:], 0.0)
        l_diag = shift_right(prev2_l[:], 0.0)

        at_i0 = i_idx == 0
        at_j0 = j_idx == 0
        c_left = jnp.where(at_j0, _BIG, c_left)
        c_up = jnp.where(at_i0, _BIG, c_up)
        c_diag = jnp.where(at_i0 | at_j0, _BIG, c_diag)

        best = jnp.minimum(c_diag, jnp.minimum(c_left, c_up))
        origin = at_i0 & at_j0
        cost_k = d_k + jnp.where(origin, 0.0, best)

        take_diag = (c_diag <= c_left) & (c_diag <= c_up)
        take_left = jnp.logical_and(~take_diag, c_left <= c_up)
        pred_l = jnp.where(take_diag, l_diag,
                           jnp.where(take_left, l_left, l_up))
        len_k = jnp.where(origin, 1.0, pred_l + 1.0)

        cost_k = jnp.where(valid, cost_k, _BIG)
        len_k = jnp.where(valid, len_k, 0.0)

        # capture the final cell (n1-1, n2-1) when its diagonal comes by
        is_final = (k_final == k) & (i_idx == (n1[:, None] - 1))
        final_c = jnp.sum(jnp.where(is_final, cost_k, 0.0), axis=1)
        final_l = jnp.sum(jnp.where(is_final, len_k, 0.0), axis=1)
        out_ref[:, 0] += final_c
        out_ref[:, 1] += final_l

        prev2_c[:] = prev_c[:]
        prev2_l[:] = prev_l[:]
        prev_c[:] = cost_k
        prev_l[:] = len_k
        return 0

    jax.lax.fori_loop(0, n_diag, body, 0)


# Mosaic double-buffers grid inputs; keep the per-program slab small
_VMEM_BUDGET = 3 * 1024 * 1024
# the smallest tiling-friendly block is 8 pairs; a bucket whose 8-pair
# slab cannot fit a safe share of scoped VMEM (~16 MB total, double-
# buffered input) must not reach the kernel at all
_MIN_BLOCK = 8
_SLAB_LIMIT = 6 * 1024 * 1024


def _per_pair_bytes(s1: int, s2: int) -> int:
    return (s1 + s2 - 1) * s1 * 4


def fits_vmem(s1: int, s2: int) -> bool:
    """True when the minimum-block (8-pair) skewed-input slab fits the
    VMEM share this kernel budgets for itself; callers fall back to the
    `lax.scan` wavefront otherwise instead of failing to compile."""
    return _MIN_BLOCK * _per_pair_bytes(s1, s2) <= _SLAB_LIMIT


def _pick_block(b: int, s1: int, s2: int) -> int:
    per_pair = _per_pair_bytes(s1, s2)
    block = min(128, max(_VMEM_BUDGET // max(per_pair, 1), 1))
    if block < _MIN_BLOCK:
        # still within fits_vmem's bound: the floor slab stays <= the
        # slab limit, just past the soft per-buffer budget
        block = _MIN_BLOCK
    # round down to a power of two for tiling friendliness
    p = _MIN_BLOCK
    while p * 2 <= block:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=('interpret',))
def dtw_normalized_pallas(dist, n1, n2, interpret: bool = False):
    """(B, S1, S2), (B,), (B,) -> (B,) normalized DTW; Pallas TPU kernel."""
    b, s1, s2 = dist.shape
    block = _pick_block(b, s1, s2)
    pad_b = (b + block - 1) // block * block
    if pad_b != b:
        dist = jnp.pad(dist, ((0, pad_b - b), (0, 0), (0, 0)))
        n1 = jnp.pad(n1, (0, pad_b - b), constant_values=1)
        n2 = jnp.pad(n2, (0, pad_b - b), constant_values=1)

    skewed = _skew(dist.astype(jnp.float32))           # (K, padB, S1)
    n_diag = s1 + s2 - 1

    out = pl.pallas_call(
        _dtw_kernel,
        grid=(pad_b // block,),
        in_specs=[
            pl.BlockSpec((n_diag, block, s1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_b, 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block, s1), jnp.float32),
            pltpu.VMEM((block, s1), jnp.float32),
            pltpu.VMEM((block, s1), jnp.float32),
            pltpu.VMEM((block, s1), jnp.float32),
        ],
        interpret=interpret,
    )(skewed, n1.astype(jnp.int32)[:, None], n2.astype(jnp.int32)[:, None])

    cost = out[:b, 0]
    length = out[:b, 1]
    return cost / jnp.maximum(length, 1.0)
