"""Masked-position InfoNCE for BERT-style CPC
(reference `cpc/criterion/research/bert.py:11-54`).

jit-friendly reformulation: the reference gathers the dynamic set of masked
positions; here the loss is computed at every position with fixed shapes and
masked-averaged, and negatives are drawn uniformly over *unmasked* frames via
`jax.random.categorical` with -inf logits at masked frames — the same
distribution as the reference's rejection-free indexing into the unmasked
subset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import TorchLinear
from .criterion import BaseCriterion

Array = jax.Array


class CPCBertCriterion(BaseCriterion):
    dim_ar: int
    dim_enc: int
    negative_sampling_ext: int

    @nn.compact
    def __call__(self, c_feature: Array, encoded_data: Array, label: Array,
                 signal_quality=None, train: bool = True,
                 example_weights=None):
        b, s, _ = c_feature.shape
        d = encoded_data.shape[-1]
        mask = label.astype(bool)                       # (B, S) True = masked
        n_pos = jnp.maximum(jnp.sum(mask), 1)

        preds = TorchLinear(self.dim_enc, use_bias=False,
                            name='wPrediction')(c_feature)  # (B, S, D)

        # Negatives: uniform over unmasked frames of the whole batch.
        rng = self.make_rng('negatives')
        flat_mask = mask.reshape(-1)
        logits = jnp.where(flat_mask, -jnp.inf, 0.0)
        neg_idx = jax.random.categorical(
            rng, logits, shape=(b * s, self.negative_sampling_ext))
        z_flat = encoded_data.reshape(b * s, d)

        pos_scores = jnp.mean(preds * encoded_data, axis=-1)    # (B, S)
        neg_z = z_flat[neg_idx]                                 # (B*S, N, D)
        neg_scores = jnp.mean(
            preds.reshape(b * s, 1, d) * neg_z, axis=-1
        ).reshape(b, s, self.negative_sampling_ext)

        cat = jnp.concatenate([pos_scores[..., None], neg_scores], axis=-1)
        lse = jax.nn.logsumexp(cat, axis=-1)
        losses = lse - pos_scores                               # (B, S)
        correct = pos_scores >= jnp.max(neg_scores, axis=-1)

        w = mask.astype(jnp.float32)
        if example_weights is not None:
            # per-example mean over that example's masked positions,
            # weighted sum over the batch (caller normalizes globally)
            ew = example_weights.astype(jnp.float32)
            per_n = jnp.maximum(jnp.sum(w, axis=1), 1)
            per_loss = jnp.sum(losses * w, axis=1) / per_n
            per_acc = jnp.sum(correct.astype(jnp.float32) * w,
                              axis=1) / per_n
            return (jnp.sum(per_loss * ew).reshape(1, 1),
                    jnp.sum(per_acc * ew).reshape(1, 1))
        loss = jnp.sum(losses * w) / n_pos
        acc = jnp.sum(correct.astype(jnp.float32) * w) / n_pos
        return loss.reshape(1, 1), acc.reshape(1, 1)
