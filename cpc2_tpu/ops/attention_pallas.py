"""Fused causal relative-position attention (Pallas, TPU).

Replaces the XLA formulation in `models/transformer.py`'s
ScaledDotProductAttention (reference `cpc/transformers.py:10-70`) for the
training hot path. The XLA path materializes every (N, S, S) intermediate
in HBM — qk logits, relative-position logits, softmax probabilities, the
dropout mask, and their backward counterparts. At the published recipe's
shapes under the 12 vmapped prediction heads (N = 12·B·8 attention units,
S = 116) those tensors reach 660 MB EACH at batch 64, and the attention
chain profiled ~15 ms of a 73 ms step — all of it HBM traffic, none of it
MXU work (`docs/performance.md`).

Here one kernel instance computes a whole attention unit in VMEM:

  scores   = q @ kᵀ                                   (MXU, f32 accum)
  rel      = Σ_d q[:, d] · W2[d]                      (VPU fma loop)
  probs    = softmax((scores + rel)/√dk  + causal)    (f32, rowwise)
  probs    = dropout(probs)                           (on-chip PRNG)
  out      = probs @ v                                (MXU)

and the backward recomputes probs flash-attention-style instead of
loading them back — the only HBM traffic is q/k/v/g rows and the small
relpos table. W2 is the causal-equivalent expansion of the reference's
Krelpos zero-diagonal shift (`transformers.py:61-66`):
W2[d, r, c] = Krelpos[d, s-1-(r-c)] for c <= r (see
`models/transformer.py` — masked positions only ever see -inf), built
OUTSIDE the kernel from the (dk, s) parameter so dKrelpos flows through
`jnp.take`'s autodiff.

Dropout uses the per-core hardware PRNG (`pltpu.prng_seed` /
`prng_random_bits`), seeded per attention unit from a caller-supplied
base seed — the same stance as the training CLI's `--prng rbg` default:
mask REALIZATION differs from the host/XLA path, the distribution (iid
Bernoulli(rate), inverted scaling) is identical, and forward/backward
regenerate bit-identical masks from the same seed. Numerics with dropout
off are tested against the XLA formulation in
tests/test_attention_pallas.py (interpret mode on CPU + gradient checks).
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


def _pick_nb(n: int, max_nb: int = 8) -> int:
    """Units per grid cell: largest power of two <= max_nb dividing n."""
    nb = 1
    while nb * 2 <= max_nb and n % (nb * 2) == 0:
        nb *= 2
    return nb


def _unit_probs(q, k, w2_ref, s, dk, scale):
    """Recompute the masked softmax probabilities for one unit (f32)."""
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (S, S)
    rel = jnp.zeros((s, s), jnp.float32)
    for d in range(dk):                                      # static unroll
        rel = rel + q[:, d:d + 1] * w2_ref[d]
    logits = (scores + rel) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    logits = jnp.where(cols <= rows, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _drop_mask(seed, s, rate):
    """Bernoulli(rate) drop mask from the on-chip PRNG (True = drop)."""
    pltpu.prng_seed(seed)
    bits = pltpu.bitcast(pltpu.prng_random_bits((s, s)), jnp.uint32)
    return bits < np.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, w2_ref, o_ref, *,
                nb, s, dk, rate):
    scale = 1.0 / (dk ** 0.5)
    pid = pl.program_id(0)
    for u in range(nb):
        q = q_ref[u].astype(jnp.float32)
        k = k_ref[u].astype(jnp.float32)
        p = _unit_probs(q, k, w2_ref, s, dk, scale)
        if rate > 0.0:
            drop = _drop_mask(seed_ref[0, 0] + pid * nb + u, s, rate)
            p = jnp.where(drop, 0.0, p / (1.0 - rate))
        v = v_ref[u]
        o_ref[u] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, w2_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dw2_ref, dqrel_scratch, *,
                nb, s, dk, rate):
    scale = 1.0 / (dk ** 0.5)
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _zero_dw2():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    for u in range(nb):
        q = q_ref[u].astype(jnp.float32)
        k = k_ref[u].astype(jnp.float32)
        v = v_ref[u].astype(jnp.float32)
        g = g_ref[u].astype(jnp.float32)
        p = _unit_probs(q, k, w2_ref, s, dk, scale)
        if rate > 0.0:
            drop = _drop_mask(seed_ref[0, 0] + pid * nb + u, s, rate)
            keep_inv = 1.0 / (1.0 - rate)
            p_drop = jnp.where(drop, 0.0, p * keep_inv)
        else:
            p_drop = p
        # dv = p̃ᵀ g
        dv_ref[u] = jax.lax.dot_general(
            p_drop, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # dp̃ = g vᵀ, through dropout, then the softmax backward
        dpd = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (S, S)
        if rate > 0.0:
            dp = jnp.where(drop, 0.0, dpd * keep_inv)
        else:
            dp = dpd
        row = jnp.sum(dp * p, axis=1, keepdims=True)
        dsp = (p * (dp - row)) * scale                       # (S, S)
        # dq = dsp @ k  +  Σ_c dsp[r, c] · W2[:, r, c]
        dq = jax.lax.dot_general(
            dsp, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (S, DK)
        for d in range(dk):                                  # static unroll
            dqrel_scratch[d:d + 1, :] = jnp.sum(
                dsp * w2_ref[d], axis=1, keepdims=True).reshape(1, s)
            # dW2[d] accumulates q[:, d] ⊗ dsp across every unit/cell
            dw2_ref[d] = dw2_ref[d] + q[:, d:d + 1] * dsp
        dq_ref[u] = (dq + dqrel_scratch[...].T).astype(dq_ref.dtype)
        # dk = dspᵀ @ q
        dk_ref[u] = jax.lax.dot_general(
            dsp, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _fwd_call(q, k, v, w2, seed, rate, interpret):
    n, s, dk = q.shape
    nb = _pick_nb(n)
    kern = functools.partial(_fwd_kernel, nb=nb, s=s, dk=dk, rate=rate)
    return pl.pallas_call(
        kern,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((dk, s, s), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, dk), v.dtype),
        interpret=interpret,
    )(seed, q, k, v, w2)


def _bwd_call(q, k, v, w2, seed, g, rate, interpret):
    n, s, dk = q.shape
    nb = _pick_nb(n)
    kern = functools.partial(_bwd_kernel, nb=nb, s=s, dk=dk, rate=rate)
    return pl.pallas_call(
        kern,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((dk, s, s), lambda i: (0, 0, 0)),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((nb, s, dk), lambda i: (i, 0, 0)),
            # accumulated across all grid cells (sequential TPU grid;
            # the block index is constant so the block stays in VMEM)
            pl.BlockSpec((dk, s, s), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s, dk), q.dtype),
            jax.ShapeDtypeStruct((n, s, dk), k.dtype),
            jax.ShapeDtypeStruct((n, s, dk), v.dtype),
            jax.ShapeDtypeStruct((dk, s, s), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((dk, s), jnp.float32)],
        interpret=interpret,
    )(seed, q, k, v, w2, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_relpos_attention(q, k, v, w2, seed, dropout_rate=0.0,
                           interpret=False):
    """out[n] = dropout(softmax(causal((q@kᵀ + rel)/√dk))) @ v, fused.

    q, k, v: (N, S, DK); w2: (DK, S, S) causal relpos table (see module
    docstring); seed: (1, 1) int32 — base dropout seed, ignored when
    dropout_rate == 0 (the 2-D shape keeps the batched SMEM block legal
    when the call is vmapped over prediction heads). Returns (N, S, DK)
    in v's dtype.
    """
    return _fwd_call(q, k, v, w2, seed, dropout_rate, interpret)


def _fra_fwd(q, k, v, w2, seed, rate, interpret):
    return _fwd_call(q, k, v, w2, seed, rate, interpret), (q, k, v, w2, seed)


def _fra_bwd(rate, interpret, res, g):
    q, k, v, w2, seed = res
    dq, dk, dv, dw2 = _bwd_call(q, k, v, w2, seed, g, rate, interpret)
    return dq, dk, dv, dw2, jnp.zeros(seed.shape, jax.dtypes.float0)


fused_relpos_attention.defvjp(_fra_fwd, _fra_bwd)


def use_fused_attention(s: int, dk: int) -> bool:
    """Kernel lowerable AND explicitly requested (CPC2_FUSED_ATTENTION=1).

    Default OFF: measured on the target chip (v5 lite, batch 8 and 64,
    controlled same-session on/off), the fused kernel LOSES ~25% step
    time to the XLA formulation. The recipe's attention units are tiny
    (S=116, dk=32): XLA batches all N units into a handful of large MXU
    matmuls, while this kernel runs them through a sequential grid where
    the dk-unrolled relative-position fma loop is VPU-bound. The kernel's
    HBM savings would matter on cores where the (N, S, S) intermediates
    spill thrash — keep it available for such regimes, opt-in, with the
    numbers in docs/performance.md.

    Also requires the TPU backend (same gating as
    `infonce_pallas.use_pallas_negatives` — honours an active
    `jax.default_device(cpu)` during model init) and shapes that fit the
    VMEM-resident (dk, s, s) relpos table."""
    if os.environ.get('CPC2_FUSED_ATTENTION', '').lower() not in (
            '1', 'on', 'true'):
        return False
    if s > 512 or dk > 128 or dk * s * s * 4 > 8 * 2 ** 20:
        return False
    return tpu_backend_available()
