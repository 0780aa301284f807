"""Batched DTW with backtracked path-length normalization.

Replaces the reference's only native component, the Cython kernel
`cpc/eval/ABX/dtw.pyx` (O(N*M) per-pair DP + backtracking on the host).

TPU-first design
----------------
The DP runs as a `lax.scan` over **anti-diagonals**: every cell on a diagonal
depends only on the two previous diagonals, so a whole diagonal of all B
pairs updates in one vector op — (B, S1) lanes per step, S1+S2-1 steps,
instead of the reference's per-cell Python/C loop per pair.

Path-length normalization without backtracking: the reference backtracks with
the tie-break order diag <= left <= up (`dtw.pyx:60-75`). The same local rule
applied *forward* — `L[i,j] = 1 + L[pred(i,j)]`, where pred is chosen by that
exact comparison on the accumulated costs — yields the identical path length,
because backtracking makes the same decision at each visited cell. Border
cells have a single predecessor, matching the `i==0`/`j==0` tail additions.

All shapes static: callers pad (S1, S2) to buckets and pass true lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_BIG = jnp.float32(1e30)


@jax.jit
def dtw_normalized(dist: Array, n1: Array, n2: Array) -> Array:
    """Normalized DTW scores for a batch of padded distance matrices.

    Args:
      dist: (B, S1, S2) pairwise frame distances (padding values ignored).
      n1:   (B,) true lengths along axis 1 (>= 1).
      n2:   (B,) true lengths along axis 2 (>= 1).
    Returns:
      (B,) DTW(dist[b, :n1[b], :n2[b]]) / backtracked_path_length.
    """
    b, s1, s2 = dist.shape
    n_diag = s1 + s2 - 1
    i_idx = jnp.arange(s1)

    def step(carry, k):
        prev_c, prev2_c, prev_l, prev2_l = carry
        j_idx = k - i_idx                              # (S1,)
        valid = (j_idx >= 0) & (j_idx < s2)
        d_k = jnp.take_along_axis(
            dist, jnp.clip(j_idx, 0, s2 - 1)[None, :, None], axis=2)[..., 0]
        # (B, S1): d_k[:, i] = dist[:, i, k-i]

        c_left = prev_c                                 # (i, j-1): diag k-1, i
        c_up = jnp.concatenate(                         # (i-1, j): diag k-1, i-1
            [jnp.full((b, 1), _BIG), prev_c[:, :-1]], axis=1)
        c_diag = jnp.concatenate(                       # (i-1, j-1): diag k-2
            [jnp.full((b, 1), _BIG), prev2_c[:, :-1]], axis=1)
        l_left, l_up = prev_l, jnp.concatenate(
            [jnp.zeros((b, 1)), prev_l[:, :-1]], axis=1)
        l_diag = jnp.concatenate(
            [jnp.zeros((b, 1)), prev2_l[:, :-1]], axis=1)

        at_i0 = (i_idx == 0)[None, :]                   # top row: only left
        at_j0 = (j_idx == 0)[None, :]                   # first col: only up
        c_left = jnp.where(at_j0, _BIG, c_left)
        c_up = jnp.where(at_i0, _BIG, c_up)
        c_diag = jnp.where(at_i0 | at_j0, _BIG, c_diag)

        best = jnp.minimum(c_diag, jnp.minimum(c_left, c_up))
        origin = at_i0 & at_j0                          # cell (0, 0)
        cost_k = d_k + jnp.where(origin, 0.0, best)

        # Backtracking tie-break: diag if c_diag <= both, else left if
        # c_left <= c_up, else up (`dtw.pyx:64-70`).
        take_diag = (c_diag <= c_left) & (c_diag <= c_up)
        take_left = (~take_diag) & (c_left <= c_up)
        pred_l = jnp.where(take_diag, l_diag,
                           jnp.where(take_left, l_left, l_up))
        len_k = jnp.where(origin, 1.0, pred_l + 1.0)

        cost_k = jnp.where(valid[None, :], cost_k, _BIG)
        len_k = jnp.where(valid[None, :], len_k, 0.0)
        return (cost_k, prev_c, len_k, prev_l), (cost_k, len_k)

    init = (jnp.full((b, s1), _BIG), jnp.full((b, s1), _BIG),
            jnp.zeros((b, s1)), jnp.zeros((b, s1)))
    _, (costs, lens) = jax.lax.scan(step, init, jnp.arange(n_diag))
    # costs/lens: (n_diag, B, S1); final cell (n1-1, n2-1) on diag n1+n2-2.
    k_final = n1 + n2 - 2                               # (B,)
    batch = jnp.arange(b)
    final_cost = costs[k_final, batch, n1 - 1]
    final_len = lens[k_final, batch, n1 - 1]
    return final_cost / jnp.maximum(final_len, 1.0)


def _bucket(n: int, sizes=(8, 16, 32, 64, 128, 256, 512, 1024)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return int(np.ceil(n / 1024) * 1024)


def dtw_batch(x, y, sx, sy, dist_mat, ignore_diag: bool = False,
              symetric: bool = False):
    """Drop-in equivalent of the Cython `dtw.dtw_batch`
    (`dtw.pyx:16-36`): dist_mat (Nx, Ny, S1, S2) -> (Nx, Ny) normalized DTW
    distances. `x`/`y` are accepted for signature parity and unused.

    The full (Nx*Ny) batch runs in one wavefront scan; `symetric` matrices
    are symmetric by construction (DTW of a transposed cost matrix is the
    transpose), and `ignore_diag` entries are zeroed like the reference.
    """
    dist_mat = np.asarray(dist_mat, dtype=np.float32)
    nx, ny, s1, s2 = dist_mat.shape
    sx = np.asarray(sx).astype(np.int32)
    sy = np.asarray(sy).astype(np.int32)

    p1, p2 = _bucket(s1), _bucket(s2)
    if (p1, p2) != (s1, s2):
        dist_mat = np.pad(dist_mat, ((0, 0), (0, 0), (0, p1 - s1),
                                     (0, p2 - s2)))

    flat = dist_mat.reshape(nx * ny, p1, p2)
    n1 = np.repeat(sx, ny)
    n2 = np.tile(sy, nx)
    out = np.array(dtw_normalized_auto(
        jnp.asarray(flat), jnp.asarray(n1),
        jnp.asarray(n2))).reshape(nx, ny)
    if ignore_diag:
        np.fill_diagonal(out, 0.0)
    return out


_USE_PALLAS = None


def dtw_normalized_auto(dist, n1, n2):
    """Dispatch: hand-written Pallas kernel on TPU backends (bit-identical,
    ~10% faster, validated in tests), lax.scan wavefront elsewhere. Falls
    back to the scan for sequence-length buckets whose per-program slab
    cannot fit VMEM (`dtw_pallas.fits_vmem`)."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        from .backend import tpu_backend_available
        _USE_PALLAS = tpu_backend_available()
    if _USE_PALLAS:
        from .dtw_pallas import dtw_normalized_pallas, fits_vmem
        if fits_vmem(dist.shape[1], dist.shape[2]):
            return dtw_normalized_pallas(dist, n1, n2)
    return dtw_normalized(dist, n1, n2)
