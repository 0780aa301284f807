"""CPC model wrappers (reference `cpc/model.py:279-465`).

The model is a pure function: `apply(params, batch, label, hidden) ->
(cFeature, encodedData, label, hidden)`. Stateful bits of the reference become
explicit data flow:

* the AR hidden carry (`keepHidden`) is threaded by the caller;
* wav2vec2-style span masks (`cpc/model.py:300-369`) are sampled **host-side**
  (numpy, exactly the reference algorithm — it was host-side numpy there too)
  and passed in as a boolean array so the jitted step stays static.

Submodule attributes are named `gEncoder`/`gAR` so flax scopes (and therefore
converted checkpoints) match the reference state dict keys.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def compute_mask_indices(shape: Tuple[int, int], mask_prob: float,
                         mask_length: int, min_masks: int = 0,
                         rng: Optional[np.random.RandomState] = None
                         ) -> np.ndarray:
    """Random span masks, reference parity (`cpc/model.py:300-369`).

    Note the reference's `mask_prob * 100 * all_sz / mask_length` — the x100
    factor is kept for behavioural parity.
    """
    rng = rng or np.random
    bsz, all_sz = shape
    mask = np.full((bsz, all_sz), False)

    all_num_mask = int(mask_prob * 100 * all_sz / float(mask_length)
                       + rng.rand())
    all_num_mask = max(min_masks, all_num_mask)

    mask_idcs = []
    for _ in range(bsz):
        sz = all_sz
        num_mask = all_num_mask
        lengths = np.full(num_mask, mask_length)
        if sum(lengths) == 0:
            lengths[0] = min(mask_length, sz - 1)
        min_len = min(lengths)
        if sz - min_len <= num_mask:
            min_len = sz - num_mask - 1
        mask_idc = rng.choice(sz - min_len, num_mask, replace=False)
        mask_idc = np.asarray([mask_idc[j] + offset
                               for j in range(len(mask_idc))
                               for offset in range(lengths[j])])
        mask_idcs.append(np.unique(mask_idc[mask_idc < sz]))

    min_len = min(len(m) for m in mask_idcs)
    nb_masked = 0
    for i, mask_idc in enumerate(mask_idcs):
        if len(mask_idc) > min_len:
            mask_idc = rng.choice(mask_idc, min_len, replace=False)
        mask[i, mask_idc] = True
        nb_masked += len(mask_idc)

    percentage_masked = nb_masked / (bsz * all_sz)
    if percentage_masked > 0.6:
        warnings.warn("We detected that %.2f of all encoded frames have been "
                      "masked. This might be too much." % percentage_masked)
    return mask


def compute_bert_mask(shape: Tuple[int, int], n_mask_sentence: int,
                      block_size: int,
                      rng: Optional[np.random.RandomState] = None
                      ) -> np.ndarray:
    """Block masks for BERT-style CPC (`cpc/model.py:406-430`)."""
    rng = rng or np.random
    bsz, seq = shape
    mask = np.zeros((bsz, seq), dtype=bool)
    for b in range(bsz):
        starts = rng.randint(0, seq // block_size,
                             size=n_mask_sentence) * block_size
        for s in starts:
            mask[b, s:s + block_size] = True
    return mask


class CPCModel(nn.Module):
    """Encoder + AR context network (`cpc/model.py:279-390`)."""
    gEncoder: nn.Module
    gAR: nn.Module
    mask_prob: float = 0.0
    mask_length: int = 10

    @nn.compact
    def __call__(self, batch: Array, label: Any = None, hidden=None,
                 train: bool = True, mask_indices: Optional[Array] = None):
        encoded = self.gEncoder(batch, train=train)
        if self.mask_prob > 0.0:
            dim = encoded.shape[-1]
            mask_emb = self.param('mask_emb', nn.initializers.uniform(1.0),
                                  (dim,))
            if mask_indices is not None:
                # Reference parity: `getMask` writes mask_emb into
                # encodedData IN PLACE (`model.py:375-378`), so the masked
                # tensor is BOTH the AR input and the returned InfoNCE
                # targets/negative pool — positives at masked steps are
                # mask_emb, not the true encodings.
                # Documented deviation: the reference resamples a mask on
                # EVERY forward whenever mask_prob > 0, including feature
                # extraction from a trained checkpoint (making eval
                # features stochastic); here no mask is applied unless the
                # caller passes mask_indices, so inference is
                # deterministic.
                encoded = jnp.where(mask_indices[..., None], mask_emb,
                                    encoded)
        c_feature, hidden = self.gAR(encoded, hidden=hidden, train=train)
        return c_feature, encoded, label, hidden


class CPCBertModel(nn.Module):
    """BERT-style CPC (`cpc/model.py:393-446`): zero masked blocks, return the
    mask as the label. Mask computed host-side and passed in."""
    gEncoder: nn.Module
    gAR: nn.Module
    n_mask_sentence: int = 2
    block_size: int = 12
    supervised: bool = False

    @nn.compact
    def __call__(self, batch: Array, label: Any = None, hidden=None,
                 train: bool = True, mask_indices: Optional[Array] = None):
        encoded = self.gEncoder(batch, train=train)
        if not self.supervised and mask_indices is not None:
            partial = jnp.where(mask_indices[..., None], 0.0, encoded)
            c_feature, hidden = self.gAR(partial, hidden=hidden, train=train)
            return c_feature, encoded, mask_indices, hidden
        c_feature, hidden = self.gAR(encoded, hidden=hidden, train=train)
        return c_feature, encoded, label, hidden


class ConcatenatedModel(nn.Module):
    """Run several CPC models, concatenate features channel-wise
    (`cpc/model.py:449-465`). Submodels are scoped `models_{i}`."""
    models: Sequence[nn.Module]

    @nn.compact
    def __call__(self, batch: Array, label: Any = None, hidden=None,
                 train: bool = True, mask_indices: Optional[Array] = None):
        hidden = hidden if hidden is not None else [None] * len(self.models)
        feats, encs, hiddens = [], [], []
        for i, m in enumerate(self.models):
            c, e, label, h = m(batch, label, hidden=hidden[i], train=train,
                               mask_indices=mask_indices)
            feats.append(c)
            encs.append(e)
            hiddens.append(h)
        return (jnp.concatenate(feats, axis=2),
                jnp.concatenate(encs, axis=2), label, hiddens)
