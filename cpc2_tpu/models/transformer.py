"""Blockwise causal transformer context/prediction networks
(reference `cpc/transformers.py`).

TPU-first design notes
----------------------
* The reference chops sequences into fixed `sizeSeq` blocks
  (`transformers.py:38-50`), which keeps every attention matmul a static
  `(sizeSeq, sizeSeq)` shape — already ideal for XLA, so we keep the scheme.
  For the published recipe sizeSeq equals the whole 128-frame window, so one
  fused attention per layer.
* Attention is computed in one `einsum` per projection; the causal mask and
  relative-position logits are added pre-softmax, letting XLA fuse
  mask+softmax+matmul.

Behaviour parity notes
----------------------
* Post-LN layer structure, the `last_linear` dimension-reducing projection,
  the relative-position `Krelpos` zero-diagonal shift trick
  (`transformers.py:61-66`), sinusoidal `StaticPositionEmbedding`, and the
  multi-classifier head (`transformers.py:137-158`) are reproduced exactly.
* Param names mirror torch (`multihead.Wq.weight`, `ln_multihead.weight`,
  sequential indices '0', '1', ...) for mechanical checkpoint conversion.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Dropout, LayerNorm, TorchLinear

Array = jax.Array


def _krelpos_init(dk: int):
    stdv = 1.0 / math.sqrt(dk)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


class ScaledDotProductAttention(nn.Module):
    """Causal attention over fixed-size blocks (`transformers.py:10-70`)."""
    size_seq: int
    dk: int
    dropout: float
    relpos: bool = False

    def _prepare(self, x: Array) -> Array:
        # (N, S, k) -> zero-pad S to a multiple of size_seq, then fold blocks
        # into the batch: (N * S/size_seq, size_seq, k).
        n, s, k = x.shape
        r = s % self.size_seq
        if r > 0:
            x = jnp.pad(x, ((0, 0), (0, self.size_seq - r), (0, 0)))
            s += self.size_seq - r
        return x.reshape(n * (s // self.size_seq), self.size_seq, k)

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 deterministic: bool = True) -> Array:
        n, s_orig, dk = q.shape
        q, k, v = self._prepare(q), self._prepare(k), self._prepare(v)
        s = self.size_seq

        if self.relpos:
            from ..ops.attention_pallas import (fused_relpos_attention,
                                                use_fused_attention)
            if use_fused_attention(s, dk):
                # Fused Pallas path (OPT-IN via CPC2_FUSED_ATTENTION=1):
                # the whole (S, S) logits/softmax/dropout chain lives in
                # VMEM per attention unit and the backward recomputes it —
                # no (N, S, S) HBM tensors at all
                # (`ops/attention_pallas.py`, measured SLOWER than the
                # XLA paths on v5-lite at this recipe's shapes — see
                # use_fused_attention). Dropout masks come from the
                # on-chip PRNG (distribution-identical, realization
                # differs — same stance as `--prng rbg`).
                krelpos = self.param('Krelpos', _krelpos_init(dk), (dk, s))
                offs = jnp.clip(
                    jnp.arange(s)[:, None] - jnp.arange(s)[None, :],
                    0, s - 1)
                w2 = jnp.take(krelpos[:, ::-1], offs, axis=1)  # (dk, s, s)
                rate = 0.0 if deterministic else float(self.dropout)
                if rate > 0.0:
                    seed = jax.random.randint(
                        self.make_rng('dropout'), (1, 1), 0,
                        np.iinfo(np.int32).max, dtype=jnp.int32)
                else:
                    seed = jnp.zeros((1, 1), jnp.int32)
                out = fused_relpos_attention(q, k, v, w2, seed,
                                             dropout_rate=rate)
                return out.reshape(n, -1, dk)[:, :s_orig]

        qk = jnp.einsum('bik,bjk->bij', q, k,
                        preferred_element_type=jnp.float32)

        if self.relpos:
            krelpos = self.param('Krelpos', _krelpos_init(dk), (dk, s))
            if q.shape[0] >= 256:
                # Causal-equivalent form of the reference's zero-diagonal
                # shift (`transformers.py:61-66`). The shift computes
                # rel[r, c] = q[r] . Krelpos[:, s-1-(r-c)] at every c <= r,
                # and garbage (next row's values / zeros) at c > r —
                # positions the causal mask sends to -inf anyway. Gathering
                # the small (dk, s) table into a static (dk, s, s) tensor
                # and contracting once yields the same masked logits
                # WITHOUT materializing the (N, S, S) qp tensor three more
                # times in the pad+reshape+slice chain. Profitable only
                # once those materializations dominate: same-session bench,
                # batch 64 (N=512 units/head call) 65.4 -> 62.2 ms/step,
                # but batch 8 (N=64) REGRESSES 6.3 -> 7.3 ms — at small N
                # XLA fuses the shift chain well and the extra
                # (N,S,dk)x(dk,S,S) batched contraction costs more than it
                # saves. Equivalence (logits and grads) is pinned by
                # tests/test_parity_torch.py.
                offs = jnp.clip(
                    jnp.arange(s)[:, None] - jnp.arange(s)[None, :],
                    0, s - 1)
                w2 = jnp.take(krelpos[:, ::-1], offs, axis=1)  # (dk, s, s)
                qk = qk + jnp.einsum('brd,drc->brc', q, w2,
                                     preferred_element_type=jnp.float32)
            else:
                # Reference formulation: zero-diagonal shift trick
                # (`transformers.py:61-66`) — prepend a zero column,
                # reshape (S, S+1) -> (S+1, S), drop the first row.
                bsz = q.shape[0]
                qp = jnp.einsum('bik,kj->bij', q, krelpos,
                                preferred_element_type=jnp.float32)
                z = jnp.zeros((bsz, s, 1), qp.dtype)
                qp = jnp.concatenate([z, qp], axis=2)
                qk = qk + qp.reshape(bsz, s + 1, s)[:, 1:, :]

        # Causal mask: -inf above the diagonal.
        causal = np.triu(np.full((s, s), -np.inf, np.float32), k=1)
        # qk and the softmax stay f32 for stability; the probabilities are
        # cast to the value dtype so the PV matmul (and its traffic) follow
        # the activation precision.
        a = jax.nn.softmax(qk / math.sqrt(dk) + jnp.asarray(causal), axis=2)
        a = Dropout(self.dropout, name='drop')(a, deterministic)
        out = jnp.einsum('bij,bjk->bik', a.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        # Unfold blocks and truncate the padding.
        return out.reshape(n, -1, dk)[:, :s_orig]


class MultiHeadAttention(nn.Module):
    """`transformers.py:73-104`."""
    size_seq: int
    dropout: float
    dmodel: int
    nheads: int
    abspos: bool

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 deterministic: bool = True) -> Array:
        dk = self.dmodel // self.nheads

        def split_heads(x):
            b, t, _ = x.shape
            return (x.reshape(b, t, self.nheads, dk)
                     .transpose(0, 2, 1, 3)
                     .reshape(b * self.nheads, t, dk))

        def merge_heads(x):
            bh, t, _ = x.shape
            b = bh // self.nheads
            return (x.reshape(b, self.nheads, t, dk)
                     .transpose(0, 2, 1, 3)
                     .reshape(b, t, self.nheads * dk))

        q = split_heads(TorchLinear(self.dmodel, use_bias=False, name='Wq')(q))
        k = split_heads(TorchLinear(self.dmodel, use_bias=False, name='Wk')(k))
        v = split_heads(TorchLinear(self.dmodel, use_bias=False, name='Wv')(v))
        att = ScaledDotProductAttention(self.size_seq, dk, self.dropout,
                                        relpos=not self.abspos, name='Att')
        y = merge_heads(att(q, k, v, deterministic))
        return TorchLinear(self.dmodel, use_bias=False, name='Wo')(y)


class _TorchLinearParams(nn.Module):
    """Declares TorchLinear's params (same scope path, names, shapes, and
    init — flax derives param init keys from the scope path, so values are
    identical) WITHOUT running the matmul, for fused kernels that consume
    the raw torch-layout weights."""
    features: int

    @nn.compact
    def __call__(self, fan_in: int):
        from .layers import torch_linear_init
        w = self.param('weight', torch_linear_init(fan_in),
                       (self.features, fan_in))
        b = self.param('bias', torch_linear_init(fan_in), (self.features,))
        return w, b


class FFNetwork(nn.Module):
    """`transformers.py:107-116`."""
    din: int
    dout: int
    dff: int
    dropout: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        from ..ops.ffn_pallas import fused_ffn, use_fused_ffn, _interpret
        m = int(np.prod(x.shape[:-1]))
        rate = 0.0 if deterministic else float(self.dropout)
        if use_fused_ffn(m, x.shape[-1], self.dff, rate, dout=self.dout):
            # Fused Pallas path (default on TPU; CPC2_FUSED_FFN=0 opts
            # out): the whole lin1 -> ReLU -> dropout -> lin2 chain runs
            # per VMEM tile and the backward recomputes the 2048-wide
            # hidden instead of loading it from HBM (`ops/ffn_pallas.py`).
            # Param tree is identical to the XLA path (same scopes/names/
            # init). Dropout masks come from the on-chip PRNG
            # (distribution-identical, realization differs — same stance
            # as `--prng rbg`; auto mode falls back to XLA under
            # threefry so stream replay stays exact).
            w1, b1 = _TorchLinearParams(self.dff, name='lin1')(x.shape[-1])
            w2, b2 = _TorchLinearParams(self.dout, name='lin2')(self.dff)
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng('dropout'), (1, 1), 0,
                    np.iinfo(np.int32).max, dtype=jnp.int32)
            else:
                seed = jnp.zeros((1, 1), jnp.int32)
            y = fused_ffn(x.reshape(m, x.shape[-1]), w1, b1, w2, b2, seed,
                          dropout_rate=rate, interpret=_interpret())
            return y.reshape(*x.shape[:-1], self.dout)
        y = TorchLinear(self.dff, name='lin1')(x)
        y = Dropout(self.dropout, name='drop')(nn.relu(y), deterministic)
        return TorchLinear(self.dout, name='lin2')(y)


class TransformerLayer(nn.Module):
    """Post-LN block with a dimension-reducing output projection
    (`transformers.py:119-134`)."""
    size_seq: int = 32
    dmodel: int = 512
    dout: int = 512
    dff: int = 2048
    dropout: float = 0.1
    nheads: int = 8
    abspos: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        mha = MultiHeadAttention(self.size_seq, self.dropout, self.dmodel,
                                 self.nheads, self.abspos, name='multihead')
        y = LayerNorm(self.dmodel, name='ln_multihead')(
            x + mha(x, x, x, deterministic))
        ff = FFNetwork(self.dmodel, self.dmodel, self.dff, self.dropout,
                       name='ffnetwork')(y, deterministic)
        z = TorchLinear(self.dout, name='last_linear')(y + ff)
        return LayerNorm(self.dout, name='ln_ffnetwork')(z)


class MultiClassifierTransformerHead(nn.Module):
    """One attention trunk emitting K classifier outputs in a single FF
    (`transformers.py:137-158`). Output: (B, S, K, dout)."""
    nclassifiers: int
    size_seq: int = 32
    dmodel: int = 512
    dout: int = 512
    dff: int = 2048
    dropout: float = 0.1
    nheads: int = 8
    abspos: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        mha = MultiHeadAttention(self.size_seq, self.dropout, self.dmodel,
                                 self.nheads, self.abspos, name='multihead')
        y = LayerNorm(self.dmodel, name='ln_multihead')(
            x + mha(x, x, x, deterministic))
        b, s, _ = y.shape
        ff = FFNetwork(self.dmodel, self.dmodel * self.nclassifiers, self.dff,
                       self.dropout, name='ffnetwork')(y, deterministic)
        ff = ff.reshape(b, s, self.nclassifiers, self.dmodel)
        y_exp = jnp.broadcast_to(y[:, :, None, :],
                                 (b, s, self.nclassifiers, self.dmodel))
        z = TorchLinear(self.dout, name='last_linear')(ff + y_exp)
        return LayerNorm(self.dout, name='ln_ffnetwork')(z)


class StaticPositionEmbedding(nn.Module):
    """Sinusoidal positions (`transformers.py:161-173`)."""
    seqlen: int
    dmodel: int

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        pos = np.arange(self.seqlen, dtype=np.float64)[:, None]
        dim = np.arange(self.dmodel, dtype=np.float64)[None, :]
        div = np.exp(-math.log(10000.0) * (2 * (dim // 2) / self.dmodel))
        pe = pos * div
        pe[:, 0::2] = np.sin(pe[:, 0::2])
        pe[:, 1::2] = np.cos(pe[:, 1::2])
        table = jnp.asarray(pe.astype(np.float32)).astype(x.dtype)
        return x + table[None, :x.shape[1], :]


class TransformerAR(nn.Module):
    """Sequential stack mirroring `buildTransformerAR`
    (`transformers.py:176-187`). Submodules are named '0', '1', ... to match
    torch nn.Sequential state-dict keys."""
    dim_encoded: int
    dim_ar: int
    n_layers: int
    size_seq: int
    abspos: bool = False

    @property
    def dim_output(self) -> int:
        return self.dim_encoded

    @nn.compact
    def __call__(self, x: Array, hidden=None, train: bool = True):
        det = not train
        idx = 0
        if self.abspos:
            x = StaticPositionEmbedding(self.size_seq, self.dim_ar,
                                        name=str(idx))(x)
            idx += 1
        for _ in range(self.n_layers):
            x = TransformerLayer(size_seq=self.size_seq, dmodel=self.dim_ar,
                                 dout=self.dim_encoded, abspos=self.abspos,
                                 name=str(idx))(x, det)
            idx += 1
        return x, None


class MultiHeadTransformerAR(nn.Module):
    """Mirrors `buildMultHeadTransformerAR` (`transformers.py:190-212`):
    (nLayers-1) TransformerLayers then a MultiClassifierTransformerHead.
    Output: (B, S, nHeads, dim_encoded)."""
    dim_encoded: int
    dim_ar: int
    n_layers: int
    size_seq: int
    n_heads_out: int
    abspos: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        det = not train
        idx = 0
        if self.abspos:
            x = StaticPositionEmbedding(self.size_seq, self.dim_ar,
                                        name=str(idx))(x)
            idx += 1
        for _ in range(self.n_layers - 1):
            x = TransformerLayer(size_seq=self.size_seq, dmodel=self.dim_ar,
                                 dout=self.dim_encoded, abspos=self.abspos,
                                 name=str(idx))(x, det)
            idx += 1
        head = MultiClassifierTransformerHead(
            self.n_heads_out, size_seq=self.size_seq, dmodel=self.dim_ar,
            dout=self.dim_encoded, abspos=self.abspos, name=str(idx))
        return head(x, det)


def build_transformer_ar(dim_encoded: int, dim_ar: int, n_layers: int,
                         size_seq: int, abspos: bool) -> TransformerAR:
    return TransformerAR(dim_encoded=dim_encoded, dim_ar=dim_ar,
                         n_layers=n_layers, size_seq=size_seq, abspos=abspos)


def build_multihead_transformer_ar(dim_encoded: int, dim_ar: int,
                                   n_layers: int, size_seq: int, abspos: bool,
                                   n_heads: int) -> MultiHeadTransformerAR:
    return MultiHeadTransformerAR(dim_encoded=dim_encoded, dim_ar=dim_ar,
                                  n_layers=n_layers, size_seq=size_seq,
                                  n_heads_out=n_heads, abspos=abspos)
