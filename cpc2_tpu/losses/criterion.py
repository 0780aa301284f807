"""Training criteria (reference `cpc/criterion/criterion.py`).

TPU-first design of the InfoNCE loss
------------------------------------
The reference materializes per-step candidate tensors
`[positive_k ‖ 128 negatives]` of shape (B, 1+N, W, D) and runs 12 separate
CrossEntropy calls (`criterion.py:237-363`). Here the whole loss is a single
fused XLA program, shaped by profiling on real TPU hardware:

1. all K prediction heads produce one tensor `preds (B, K, W, D)`;
2. the K positive candidates are **shifted slices** of z (no gather at
   all); the N negatives are **whole D-dim rows** gathered from
   z.reshape(B*S, D) — contiguous, DMA-friendly reads;
3. two MXU dot_generals score predictions against positives and negatives
   (batch dims (b, w), contracting D). An earlier formulation computed one
   (B*K*W, B*S) all-scores matmul and selected pos/neg with element-wise
   gathers — same FLOPs, but the 1.4M-element gather (fwd) and its
   scatter (bwd) profiled ~33 of 41 ms/step on TPU; row-gather + matmul
   runs the same step in ~10 ms;
4. a negative that samples the positive frame is patched with the
   positive's score so the reference's single-bmm tie-break
   (`pos >= max(neg)` counts as correct) is preserved bit-exactly;
5. softmax-CE over the (1+N) candidates reduces to
   `logsumexp([pos ‖ negs]) - pos`.

Negative-sampling *semantics* are preserved exactly
(`criterion.py:237-286`): for every (batch, window, sample) draw
`batchIdx ~ U[0,B)`, `seqIdx = (U[1,S) + w) mod S`, negatives shared across
the K prediction steps, collisions with positives allowed.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.ar import _StackedRNN
from ..models.layers import Dropout, TorchLinear, torch_linear_init
from ..models.transformer import TransformerAR, MultiHeadTransformerAR
from .custom_layers import EqualizedLinear

Array = jax.Array


# ---------------------------------------------------------------------------
# Prediction networks
# ---------------------------------------------------------------------------

class FFNetwork(nn.Module):
    """`criterion.py:11-20`: EqualizedLinear -> ReLU -> Dropout ->
    EqualizedLinear."""
    dout: int
    dff: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = EqualizedLinear(self.dff, name='lin1')(x)
        y = Dropout(self.dropout, name='drop')(nn.relu(y), deterministic)
        return EqualizedLinear(self.dout, name='lin2')(y)


class ShiftedConv(nn.Module):
    """Causal (left-padded) equalized Conv1d predictor
    (`criterion.py:23-41`). Input NWC; params at this scope (torch's nested
    `.module.module.` wrappers are flattened by the checkpoint converter)."""
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size
        weight = self.param('weight', nn.initializers.normal(1.0),
                            (self.features, in_features, self.kernel_size))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        kernel = jnp.transpose(weight, (2, 1, 0))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,),
            padding=[(self.kernel_size - 1, 0)],
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.float32)
        return y * math.sqrt(2.0 / fan_in) + bias


def _linear_predictor_init(dim_ar: int, dim_enc: int, residual_std: float = 0.01):
    """Default linear predictor init (`criterion.py:144-150`): torch Linear
    default unless dim_enc > dim_ar, in which case [randn(ar,ar);
    0.01*randn(residual,ar)]."""
    if dim_enc <= dim_ar:
        return torch_linear_init(dim_ar)

    def init(key, shape, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        top = jax.random.normal(k1, (dim_ar, dim_ar), dtype)
        bottom = residual_std * jax.random.normal(
            k2, (dim_enc - dim_ar, dim_ar), dtype)
        return jnp.concatenate([top, bottom], axis=0)
    return init


def _remat_policy(head_remat):
    """Map a `head_remat` config value to a jax.checkpoint policy (or None
    when remat is off). True is the historical spelling of 'nothing'."""
    if not head_remat:
        return None
    name = 'nothing' if head_remat is True else str(head_remat)
    policies = {'nothing': jax.checkpoint_policies.nothing_saveable,
                'dots': jax.checkpoint_policies.dots_saveable}
    if name not in policies:
        raise ValueError(f"unknown head_remat policy {head_remat!r}; "
                         f"expected one of {sorted(policies)}")
    return policies[name]


class PredictionNetwork(nn.Module):
    """K independent prediction heads (`criterion.py:97-173`).

    TPU-first: all K heads run as ONE `nn.vmap`-lifted module with stacked
    parameters (leading axis K) — XLA batches the K heads' matmuls into
    single kernels instead of emitting K sequential graphs. The per-head
    parameter tensors live stacked under the `predictors` scope; the
    checkpoint converter splits/stacks them to the reference's
    `predictors.{k}.*` names.

    Returns the stacked predictions `(B, K, W, dim_enc)`; the score
    computation (reference `outK = (locC*candidates[k]).mean(dim=3)`)
    moves into the fused criterion.
    """
    n_predicts: int
    dim_ar: int
    dim_enc: int
    rnn_mode: Optional[str] = None
    dropout: bool = False
    size_input_seq: int = 116
    # Rematerialize the head stack in the backward pass (`--head_remat`):
    # the K heads' intermediate activations (FFN hiddens, attention probs)
    # are recomputed instead of stored, cutting HBM traffic on the
    # bandwidth-bound head FFNs. Bit-identical gradients. Values:
    # False (store everything), True/'nothing' (recompute everything —
    # jax nothing_saveable), 'dots' (save matmul outputs, recompute only
    # the elementwise chains — dots_saveable; trades far fewer FLOPs for
    # most of the HBM saving).
    head_remat: Any = False

    @nn.compact
    def __call__(self, c: Array, train: bool = True) -> Array:
        det = not train
        vmap_kw = dict(variable_axes={'params': 0},
                       split_rngs={'params': True, 'dropout': True},
                       in_axes=None, out_axes=0,
                       axis_size=self.n_predicts)

        if self.rnn_mode == 'RNN':
            # Reference quirk kept: nn.RNN without batch_first receives
            # (B, W, C) and scans over axis 0 (treats batch as time).
            net = nn.vmap(_StackedRNN, **vmap_kw)(
                self.dim_ar, self.dim_enc, 1, 'RNN', name='predictors')
            ys, _ = net(jnp.swapaxes(c, 0, 1))   # (K, W, B, D)
            ys = jnp.transpose(ys, (2, 0, 1, 3))
        elif self.rnn_mode == 'LSTM':
            net = nn.vmap(_StackedRNN, **vmap_kw)(
                self.dim_ar, self.dim_enc, 1, 'LSTM', name='predictors')
            ys, _ = net(c)                        # (K, B, W, D)
            ys = jnp.swapaxes(ys, 0, 1)
        elif self.rnn_mode == 'ffd':
            net = nn.vmap(FFNetwork, **vmap_kw)(
                self.dim_enc, self.dim_enc, 0.0, name='predictors')
            # NOTE: args must be positional — nn.vmap does not forward kwargs
            ys = jnp.swapaxes(net(c, det), 0, 1)
        elif self.rnn_mode in ('conv4', 'conv8', 'conv12'):
            ksize = int(self.rnn_mode[4:])
            net = nn.vmap(ShiftedConv, **vmap_kw)(
                self.dim_enc, ksize, name='predictors')
            ys = jnp.swapaxes(net(c), 0, 1)
        elif self.rnn_mode == 'transformer':
            # static_argnums counts the lifted scope as arg 0, so `train`
            # (x=1, hidden=2) sits at 3.
            policy = _remat_policy(self.head_remat)
            head_cls = (nn.remat(TransformerAR, static_argnums=(3,),
                                 policy=policy)
                        if policy is not None else TransformerAR)
            net = nn.vmap(head_cls, **vmap_kw)(
                dim_encoded=self.dim_enc, dim_ar=self.dim_ar, n_layers=1,
                size_seq=self.size_input_seq, abspos=False,
                name='predictors')
            # --precision bf16: run the head stack with bf16 activations
            # (params stay f32; norms/softmax stats stay f32). f32 default
            # path is untouched.
            from ..utils.misc import activation_dtype
            adt = activation_dtype()
            # positional args: nn.vmap does not forward kwargs to the target
            ys, _ = net(c.astype(adt) if adt is not None else c, None, train)
            if adt is not None:
                ys = ys.astype(jnp.float32)       # (K, B, W, D)
            ys = jnp.swapaxes(ys, 0, 1)
        else:  # 'linear' / None / False
            net = nn.vmap(TorchLinear, **vmap_kw)(
                self.dim_enc, use_bias=False,
                kernel_init=_linear_predictor_init(self.dim_ar,
                                                   self.dim_enc),
                name='predictors')
            ys = jnp.swapaxes(net(c), 0, 1)
        if self.dropout:
            # reference: independent 0.5 dropout per head output
            ys = Dropout(0.5, name='drop')(ys, det)
        return ys  # (B, K, W, D)


class MultiHeadPredictionNetwork(nn.Module):
    """Shared transformer trunk with K classifier heads
    (`criterion.py:44-94`)."""
    n_predicts: int
    dim_ar: int
    dim_enc: int
    rnn_mode: str = 'transformer'
    dropout: bool = False
    size_input_seq: int = 116
    head_remat: Any = False

    @nn.compact
    def __call__(self, c: Array, train: bool = True) -> Array:
        if self.rnn_mode != 'transformer':
            raise ValueError(f"unknown mode {self.rnn_mode}")
        policy = _remat_policy(self.head_remat)
        trunk_cls = (nn.remat(MultiHeadTransformerAR, static_argnums=(2,),
                              policy=policy)
                     if policy is not None else MultiHeadTransformerAR)
        net = trunk_cls(dim_encoded=self.dim_enc,
                        dim_ar=self.dim_ar, n_layers=1,
                        size_seq=self.size_input_seq,
                        n_heads_out=self.n_predicts,
                        abspos=False, name='predictor')
        # positional: static_argnums on the remat wrapper needs it
        y = net(c, train)                             # (B, W, K, D)
        y = jnp.transpose(y, (0, 2, 1, 3))            # (B, K, W, D)
        if self.dropout:
            y = Dropout(0.5, name='drop')(y, not train)
        return y


# ---------------------------------------------------------------------------
# InfoNCE criterion
# ---------------------------------------------------------------------------

def sample_negative_indices(rng: Array, batch_size: int, seq_size: int,
                            n_negative: int, window_size: int,
                            pool_batch: Optional[int] = None,
                            pool_group: Optional[int] = None) -> Array:
    """Negative sample flat indices into z.reshape(B*S, D), reference
    semantics (`criterion.py:237-267`): per (b, n, w) draw a random batch
    element and a random frame `(U[1,S) + w) mod S`. Returns (B, N, W) int32.

    `pool_batch` widens the batch-element draw beyond the local batch (the
    global-negatives extension: the pool spans the whole data-parallel
    batch). `pool_group` NARROWS it instead: batch element b draws only
    from its group of `pool_group` contiguous elements — the semantics of
    the reference's DataParallel/DDP runs, where each of the nGPU workers
    samples negatives within its own batchSizeGPU-window shard
    (`criterion.py:247-267` sees only the local shard). Mutually
    exclusive with `pool_batch`."""
    k1, k2 = jax.random.split(rng)
    shape = (batch_size, n_negative, window_size)
    if pool_group:
        assert pool_batch is None and batch_size % pool_group == 0
        group_base = ((jnp.arange(batch_size, dtype=jnp.int32) // pool_group)
                      * pool_group)[:, None, None]
        batch_idx = group_base + jax.random.randint(k1, shape, 0, pool_group)
    else:
        batch_idx = jax.random.randint(k1, shape, 0,
                                       pool_batch or batch_size)
    seq_idx = jax.random.randint(k2, shape, 1, seq_size)
    base = jnp.arange(window_size, dtype=jnp.int32)[None, None, :]
    seq_idx = jnp.remainder(seq_idx + base, seq_size)
    return seq_idx + batch_idx * seq_size


class BaseCriterion(nn.Module):
    def warm_up(self):
        return False

    def update(self):
        return


class NoneCriterion(BaseCriterion):
    """`criterion.py:185-191`."""

    @nn.compact
    def __call__(self, c_feature, encoded_data, label, signal_quality=None,
                 train: bool = True, example_weights=None):
        return jnp.zeros((1, 1)), jnp.zeros((1, 1))


class CPCUnsupervisedCriterion(BaseCriterion):
    """Multi-step InfoNCE (`criterion.py:193-363`); see module docstring for
    the fused TPU formulation."""
    n_predicts: int
    dim_ar: int
    dim_enc: int
    negative_sampling_ext: int
    mode: Optional[str] = None
    rnn_mode: Any = False
    dropout: bool = False
    n_speakers: int = 0
    size_input_seq: int = 116
    multihead_rnn: bool = False
    n_skipped: int = 0
    growth_rate: Optional[float] = None
    inflection_point_x: Optional[float] = None
    # Extension beyond the reference (SURVEY §2.6): draw negatives from the
    # GLOBAL batch across the data-parallel mesh axis instead of the local
    # shard (the reference's DDP semantics). The encodings are all_gathered
    # over ICI inside the shard_map program. Requires being traced with the
    # axis bound (init clones with global_negatives=False).
    global_negatives: bool = False
    # Extension: sample each batch element's negatives within its group of
    # `neg_pool_group` contiguous elements instead of the whole local batch
    # (0 = whole batch). A single chip running batch G*g with groups of g
    # then trains with EXACTLY the reference's G-GPU DataParallel
    # semantics (each GPU's criterion samples within its own
    # batchSizeGPU=g shard, reference `criterion.py:247-267`) — and every
    # group's pool stays small enough for the VMEM all-scores kernel, so
    # large batches keep the batch-8 per-window step cost (see the
    # grouped branch in __call__).
    neg_pool_group: int = 0
    data_axis: str = 'data'
    pool_axis_size: int = 1
    head_remat: Any = False
    # Model-parallel extension (beyond the reference, which is DP-only —
    # SURVEY §2.6): shard the K prediction heads over a mesh axis. This
    # instance then computes only its local `n_predicts` heads;
    # `n_predicts_total` is the global K (sets the context window), and
    # `head_axis` names the mesh axis whose index selects the head block.
    n_predicts_total: Optional[int] = None
    head_axis: Optional[str] = None

    def setup(self):
        if self.mode not in (None, "reverse"):
            raise ValueError("Invalid mode")
        if self.head_axis is not None and self.n_skipped:
            raise ValueError("head-sharded mode handles n_skipped in the "
                             "training body, not the criterion")
        if self.head_axis is not None and self.n_predicts_total is None:
            # Without the global K the per-shard slice starts exceed the
            # valid range and dynamic_slice_in_dim CLAMPS them silently —
            # every head on the last shard would score the same z frames.
            raise ValueError("head_axis requires n_predicts_total (the "
                             "global prediction-step count)")
        k_total = self.n_predicts_total or self.n_predicts
        kwargs = dict(n_predicts=self.n_predicts, dim_ar=self.dim_ar,
                      dim_enc=self.dim_enc, rnn_mode=self.rnn_mode,
                      dropout=self.dropout,
                      size_input_seq=self.size_input_seq - k_total,
                      head_remat=self.head_remat)
        if self.multihead_rnn:
            self.wPrediction = MultiHeadPredictionNetwork(**kwargs)
        else:
            self.wPrediction = PredictionNetwork(**kwargs)

    def _oriented(self, c_feature: Array, encoded_data: Array):
        if self.mode == "reverse":
            return jnp.flip(c_feature, 1), jnp.flip(encoded_data, 1)
        return c_feature, encoded_data

    def _predictions(self, c_feature: Array, train: bool
                     ) -> Tuple[Array, int]:
        b, s, _ = c_feature.shape
        w = s - (self.n_predicts_total or self.n_predicts)
        return self.wPrediction(c_feature[:, :w], train=train), w

    def _pos_z(self, encoded_data: Array, w: int):
        """Stacked positive slices (B, K_local, W, D) plus the absolute
        prediction-step indices. Under head sharding the slices start at
        this shard's absolute head block (offset
        axis_index(head_axis) * n_predicts), so every caller — the loss
        AND cosine_distances — scores against the right z frames."""
        k_p = self.n_predicts
        if self.head_axis is not None:
            k0 = jax.lax.axis_index(self.head_axis) * k_p
            pos_z = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(encoded_data, k0 + k, w,
                                              axis=1)
                 for k in range(1, k_p + 1)], axis=1)        # (B, Kl, W, D)
            karange = k0 + jnp.arange(1, k_p + 1, dtype=jnp.int32)
        else:
            pos_z = jnp.stack([encoded_data[:, k:k + w]
                               for k in range(1, k_p + 1)], axis=1)
            karange = jnp.arange(1, k_p + 1, dtype=jnp.int32)
        return pos_z, karange

    @staticmethod
    def _pos_dot(preds: Array, pos_z: Array) -> Array:
        """pos[b,k,w] = dot(pred[b,k,w], pos_z[b,k,w]) / D — the one
        positive-scoring formula, shared by the training loss and
        cosine_distances so the two paths cannot drift."""
        d = pos_z.shape[-1]
        return jnp.einsum('bkwd,bkwd->bkw', preds, pos_z,
                          preferred_element_type=jnp.float32) / d

    def _positive_scores(self, preds: Array, encoded_data: Array,
                         w: int) -> Array:
        """pos[b,k,w] = dot(pred[b,k,w], z[b, w+k+1]) / D — the positive
        candidates are *shifted slices* of z, so this is slice + elementwise
        dot; no gather kernels (`criterion.py:286-300` of the reference)."""
        pos_z, _ = self._pos_z(encoded_data, w)
        return self._pos_dot(preds, pos_z)

    def __call__(self, c_feature: Array, encoded_data: Array, label=None,
                 signal_quality: Optional[Array] = None, train: bool = True,
                 negative_indices: Optional[Array] = None,
                 example_weights: Optional[Array] = None):
        c_feature, encoded_data = self._oriented(c_feature, encoded_data)
        b, s, _ = c_feature.shape
        d = encoded_data.shape[-1]
        preds, w = self._predictions(c_feature, train)

        # Candidate rows per (b, w): the K positives (z frames w+1..w+K of
        # the same batch element — pure shifted slices) then the N sampled
        # negatives (whole D-dim rows gathered from z, contiguous and
        # DMA-friendly). One MXU contraction scores all of them — like the
        # reference's single bmm over (1+N) candidates, so a negative that
        # lands on the positive frame ties bit-exactly. Gathering the 1-by-1
        # scores out of a precomputed (B*K*W, B*S) score matrix instead
        # profiled ~30 ms/step on TPU (element-gather fwd + scatter bwd).
        pool = encoded_data
        pool_batch = b
        shard_offset = 0
        if self.global_negatives and self.pool_axis_size > 1:
            pool = jax.lax.all_gather(encoded_data, self.data_axis,
                                      axis=0, tiled=True)
            pool_batch = b * self.pool_axis_size
            shard_offset = jax.lax.axis_index(self.data_axis) * b * s

        group = self.neg_pool_group
        if group:
            assert not (self.global_negatives and self.pool_axis_size > 1), \
                "neg_pool_group and global_negatives are mutually exclusive"
        if group and (b <= group or b % group):
            # Batches at or below the group size (init dummies, ragged
            # tails) pool over the whole batch — exactly what a reference
            # DataParallel worker holding a short tail shard does.
            group = 0
        if negative_indices is not None:
            neg_idx = negative_indices
        else:
            rng = self.make_rng('negatives')
            neg_idx = sample_negative_indices(rng, b, s,
                                              self.negative_sampling_ext, w,
                                              pool_batch=(None if group
                                                          else pool_batch),
                                              pool_group=group or None)
        k_p = self.n_predicts
        pos_z, karange = self._pos_z(encoded_data, w)
        z_flat = pool.reshape(pool_batch * s, d)
        neg_idx_wn = jnp.transpose(neg_idx, (0, 2, 1))       # (B, W, N)
        # Separate positive/negative contractions (batch (b,w), contract d)
        # instead of one over a concatenated (B, K+N, W, D) tensor — the
        # concat's backward split/copied ~0.5 GB per step. The reference
        # scores positives and negatives in a single bmm, so a negative
        # that lands on the positive frame ties exactly; separate
        # contractions round differently, so collisions are patched
        # explicitly below with the positive's score.
        pos = self._pos_dot(preds, pos_z)
        from ..ops.infonce_pallas import (negative_scores_pallas,
                                          use_pallas_negatives)
        if (group and group < b and use_pallas_negatives()
                and group * s <= 1024 and negative_indices is None):
            # (negative_indices is None: the rebase below is only valid
            # for indices we drew group-local ourselves; caller-supplied
            # indices take the general gather path.)
            # Grouped pools: every batch element's negatives live in its
            # own group's (group*s)-row pool, so the VMEM all-scores
            # kernel applies PER GROUP regardless of the total batch —
            # vmap prepends the group axis to the kernel grid. Indices
            # are rebased from local-batch-flat to group-flat rows.
            n_groups = b // group
            n_neg = self.negative_sampling_ext
            base = (jnp.arange(n_groups, dtype=jnp.int32)
                    * (group * s))[:, None, None, None]
            neg = jax.vmap(negative_scores_pallas)(
                preds.reshape(n_groups, group, k_p, w, d),
                z_flat.reshape(n_groups, group * s, d),
                neg_idx_wn.reshape(n_groups, group, w, n_neg) - base,
            ).reshape(b, k_p, w, n_neg) / d
        elif use_pallas_negatives() and z_flat.shape[0] <= 1024:
            # Fused Pallas kernel: the encoding pool stays in VMEM; the
            # backward is dense matmuls instead of a scatter-add (which
            # profiled 1.2 ms/step — `ops/infonce_pallas.py`). The kernel
            # scores every (query, pool-row) pair, so its cost is
            # QUADRATIC in the pool: profitable at the default recipe's
            # 1024-row pool (batch 8 x 128 frames), a measured blowup at
            # 2048/4096 rows (16.2/42.1 ms/step at batch 16/32 vs a
            # near-linear gather path). Larger pools take the XLA
            # row-gather below.
            neg = negative_scores_pallas(preds, z_flat, neg_idx_wn) / d
        else:
            # XLA path: gather whole rows (B, W, N, D) — the backward
            # d(neg_z) reshapes straight into the (rows, D) scatter
            # operand without a relayout copy.
            neg_z = z_flat.at[neg_idx_wn.reshape(-1)].get(
                mode='promise_in_bounds').reshape(
                b, w, self.negative_sampling_ext, d)         # (B, W, N, D)
            neg = jnp.einsum('bkwd,bwnd->bkwn', preds, neg_z,
                             preferred_element_type=jnp.float32) / d
        pos_flat_idx = (jnp.arange(b, dtype=jnp.int32)[:, None, None] * s
                        + karange[None, :, None]
                        + jnp.arange(w, dtype=jnp.int32)[None, None, :]
                        + shard_offset)  # local rows in pool coordinates
        collides = (jnp.transpose(neg_idx, (0, 2, 1))[:, None]   # (B,1,W,N)
                    == pos_flat_idx[..., None])                  # (B,K,W,N)
        neg = jnp.where(collides, pos[..., None], neg)

        # Softmax-CE over (1+N) candidates, positive at index 0.
        cat = jnp.concatenate([pos[..., None], neg], axis=-1)
        lse = jax.nn.logsumexp(cat, axis=-1)
        losses = lse - pos                                   # (B, K, W)
        # torch argmax picks the first maximal index, so ties favour index 0.
        correct = (pos >= jnp.max(neg, axis=-1))             # (B, K, W)

        if signal_quality is not None:
            q = jnp.mean(signal_quality, axis=1)             # (B,)
            weight = 1e-5 + jax.nn.sigmoid(
                self.growth_rate * (q - self.inflection_point_x))
            losses = losses * weight[:, None, None]

        if example_weights is not None:
            # Padded-batch mode (multi-host ragged tails,
            # `training.build_steps(example_weighted=True)`): per-example
            # means over the window, WEIGHTED SUMS over the batch — the
            # caller divides by the global psum of weights, so zero-weight
            # pad rows contribute nothing to loss, metrics, or gradients.
            ew = example_weights.astype(losses.dtype)
            out_losses = jnp.sum(jnp.mean(losses, axis=2) * ew[:, None],
                                 axis=0)                 # (K,)
            out_acc = jnp.sum(
                jnp.mean(correct.astype(jnp.float32), axis=2)
                * ew[:, None], axis=0)
        else:
            out_losses = jnp.mean(losses, axis=(0, 2))       # (K,)
            out_acc = jnp.mean(correct.astype(jnp.float32), axis=(0, 2))
        out_losses = out_losses[self.n_skipped:][None, :]
        out_acc = out_acc[self.n_skipped:][None, :]
        return out_losses, out_acc

    def cosine_distances(self, c_feature: Array, encoded_data: Array) -> Array:
        """Positives-only scores (`criterion.py:304-327`): (B, K, W)."""
        c_feature, encoded_data = self._oriented(c_feature, encoded_data)
        preds, w = self._predictions(c_feature, train=False)
        return self._positive_scores(preds, encoded_data, w)

    # reference-spelled alias (`criterion.py:304`)
    getCosineDistances = cosine_distances


# Reference-spelled alias (the reference class is `CPCUnsupersivedCriterion`).
CPCUnsupersivedCriterion = CPCUnsupervisedCriterion


# ---------------------------------------------------------------------------
# Supervised probes
# ---------------------------------------------------------------------------

def _cross_entropy(logits: Array, labels: Array) -> Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


class SpeakerCriterion(BaseCriterion):
    """Linear speaker classifier on the last context frame
    (`criterion.py:366-387`)."""
    dim_encoder: int
    n_speakers: int

    @nn.compact
    def __call__(self, c_feature: Array, other_encoded: Array, label: Array,
                 signal_quality=None, train: bool = True,
                 example_weights=None):
        feats = c_feature[:, -1, :]
        logits = TorchLinear(self.n_speakers,
                             name='linearSpeakerClassifier')(feats)
        ce = _cross_entropy(logits, label)
        hit = (jnp.argmax(logits, -1) == label).astype(jnp.float32)
        if example_weights is not None:
            ew = example_weights.astype(ce.dtype)
            return (jnp.sum(ce * ew).reshape(1, 1),
                    jnp.sum(hit * ew).reshape(1, 1))
        return jnp.mean(ce).reshape(1, 1), jnp.mean(hit).reshape(1, 1)


class AdvSpeakerCriterion(BaseCriterion):
    """Adversarial speaker criterion (`criterion.py:390-422`): mean-pooled
    features; entropy loss when label is None."""
    dim_encoder: int
    n_speakers: int
    on_encoder: bool = False

    @nn.compact
    def __call__(self, c_feature: Array, other_encoded: Array,
                 label: Optional[Array], signal_quality=None,
                 train: bool = True):
        feats = other_encoded if self.on_encoder else c_feature
        feats = jnp.mean(feats, axis=1)
        logits = TorchLinear(self.n_speakers,
                             name='linearSpeakerClassifier')(feats)
        if label is None:
            logp = jax.nn.log_softmax(logits, axis=1)
            p = jax.nn.softmax(logits, axis=1)
            loss = jnp.sum(logp * p, axis=1).reshape(-1)
            acc = jnp.zeros((1, 1))
        else:
            loss = jnp.mean(_cross_entropy(logits, label)).reshape(1, 1)
            acc = jnp.mean((jnp.argmax(logits, -1) == label)
                           .astype(jnp.float32)).reshape(1, 1)
        return loss, acc


class PhoneCriterion(BaseCriterion):
    """Frame-wise phone classifier (`criterion.py:425-460`)."""
    dim_encoder: int
    n_phones: int
    on_encoder: bool = False
    n_layers: int = 1

    def setup(self):
        if self.n_layers == 1:
            self.classifiers = (TorchLinear(
                self.n_phones, name='PhoneCriterionClassifier'),)
        else:
            # torch Sequential [Linear, ReLU, Linear, ...] — ReLUs hold no
            # params, so torch key indices are 0, 2, 4, ...
            layers = [TorchLinear(self.n_phones,
                                  name='PhoneCriterionClassifier_0')]
            for l in range(self.n_layers - 1):
                layers.append(TorchLinear(
                    self.n_phones,
                    name=f'PhoneCriterionClassifier_{2 * l + 2}'))
            self.classifiers = tuple(layers)

    def get_prediction(self, c_feature: Array) -> Array:
        x = self.classifiers[0](c_feature)
        for layer in self.classifiers[1:]:
            x = layer(nn.relu(x))
        return x

    # reference-spelled alias (`criterion.py:456,475`)
    getPrediction = get_prediction

    def __call__(self, c_feature: Array, other_encoded: Array, label: Array,
                 signal_quality=None, train: bool = True,
                 example_weights=None):
        feats = other_encoded if self.on_encoder else c_feature
        logits = self.get_prediction(feats)
        ce = _cross_entropy(logits.reshape(-1, logits.shape[-1]),
                            label.reshape(-1)).reshape(label.shape)
        hit = (jnp.argmax(logits, -1) == label).astype(jnp.float32)
        if example_weights is not None:
            # per-example mean over frames, weighted sum over the batch
            ew = example_weights.astype(ce.dtype)
            return (jnp.sum(jnp.mean(ce, axis=-1) * ew).reshape(1, 1),
                    jnp.sum(jnp.mean(hit, axis=-1) * ew).reshape(1, 1))
        return jnp.mean(ce).reshape(1, 1), jnp.mean(hit).reshape(1, 1)


def collapse_label_chain_padded(labels: Array) -> Tuple[Array, Array]:
    """jit-friendly collapseLabelChain: collapse runs of equal labels,
    left-compacted and zero-padded to the input length. Returns
    (collapsed (N, T), sizes (N,))."""
    n, t = labels.shape
    status = jnp.concatenate(
        [jnp.ones((n, 1), bool), labels[:, 1:] != labels[:, :-1]], axis=1)
    sizes = jnp.sum(status, axis=1)
    # Stable sort: valid positions first, preserving order.
    order = jnp.argsort(~status, axis=1, stable=True)
    collapsed = jnp.take_along_axis(labels, order, axis=1)
    mask = jnp.arange(t)[None, :] < sizes[:, None]
    return jnp.where(mask, collapsed, 0), sizes


class CTCPhoneCriterion(BaseCriterion):
    """Linear (nPhones+1) head + CTC loss, blank = nPhones
    (`criterion.py:463-496`)."""
    dim_encoder: int
    n_phones: int
    on_encoder: bool = False

    @nn.compact
    def __call__(self, c_feature: Array, other_encoded: Array, label: Array,
                 signal_quality=None, train: bool = True,
                 example_weights=None):
        if self.on_encoder:
            raise ValueError("On encoder version not implemented yet")
        import optax
        b, s, _ = c_feature.shape
        logits = TorchLinear(self.n_phones + 1,
                             name='PhoneCriterionClassifier')(c_feature)
        labels, sizes = collapse_label_chain_padded(label)
        logit_paddings = jnp.zeros((b, s))
        label_paddings = (jnp.arange(labels.shape[1])[None, :]
                          >= sizes[:, None]).astype(jnp.float32)
        loss = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                              blank_id=self.n_phones)
        # torch nn.CTCLoss parity (reference `criterion.py:469,494`):
        # reduction='mean' divides each sample's loss by its target length
        # before the batch mean, and zero_infinity=True zeroes samples with
        # no feasible alignment. optax reports infeasible samples as large
        # FINITE values, not inf, so the feasibility test is explicit: the
        # collapsed chain has no adjacent repeats by construction, so torch's
        # T >= S + repeats condition reduces to frames >= collapsed size.
        feasible = sizes <= s
        loss = jnp.where(feasible & jnp.isfinite(loss), loss, 0.0)
        loss = loss / jnp.maximum(sizes.astype(loss.dtype), 1)
        if example_weights is not None:
            ew = example_weights.astype(loss.dtype)
            return jnp.sum(loss * ew).reshape(1, 1), jnp.zeros((1, 1))
        return jnp.mean(loss).reshape(1, 1), jnp.zeros((1, 1))


class ModelCriterionCombined(nn.Module):
    """Single-module fusion of model+criterion (reference
    `criterion.py:499-508`; defined but unused by train.py there too)."""
    model: nn.Module
    criterion: nn.Module

    @nn.compact
    def __call__(self, data, label, train: bool = True):
        c_feature, encoded_data, label, _ = self.model(data, label,
                                                       train=train)
        loss, acc = self.criterion(c_feature, encoded_data, label,
                                   train=train)
        return loss, acc
