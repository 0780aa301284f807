"""Waveform encoders.

TPU-first design notes
----------------------
* Layout is **NWC** (batch, time, channels) throughout — channels-last is the
  layout XLA:TPU tiles onto the MXU for convolutions, and it removes every
  transpose between the conv stack and the recurrent context network.
* The five strided convolutions (reference: `cpc/model.py:63-108`, kernels
  10/8/4/4/4, strides 5/4/2/2/2, pads 3/2/1/1/1, 160x total downsampling) are
  expressed with `lax.conv_general_dilated` so XLA lowers them to implicit-GEMM
  MXU kernels and fuses the per-timestep normalization + ReLU into the conv
  epilogue.
* Parameters keep the reference's names (`conv0..conv4`, `batchNorm0..4`) and
  PyTorch's tensor layouts — conv kernels are stored `(C_out, C_in, K)` — so
  checkpoint interop is a pure name-map with no transposition bookkeeping
  spread around the code (the single layout adapter lives here).

Behaviour parity notes
----------------------
* `ChannelNorm` matches `cpc/model.py:27-60`: per-(sample, timestep)
  normalization across channels using the **unbiased** variance (torch's
  `Tensor.var` default), eps 1e-5, learned affine.
* `normMode` selects batchNorm / instanceNorm / ID / layerNorm(=ChannelNorm)
  exactly as `cpc/model.py:71-82`.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

DOWNSAMPLING = 160

# (kernel, stride, padding) per layer of the strided conv stack.
CONV_STACK = ((10, 5, 3), (8, 4, 2), (4, 2, 1), (4, 2, 1), (4, 2, 1))


def encoded_seq_len(size_window: int) -> int:
    """Number of encoded frames produced for a raw window of `size_window`."""
    length = size_window
    for k, s, p in CONV_STACK:
        length = (length + 2 * p - k) // s + 1
    return length


class ChannelNorm(nn.Module):
    """Per-timestep normalization over the channel axis (reference
    `cpc/model.py:27-60`). Input is NWC; normalizes the last axis with the
    unbiased variance to match torch's `Tensor.var` default."""
    num_features: int
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def materialize(self):
        """Create/fetch the affine params without computing (used by the
        fused-encoder path, which consumes them directly)."""
        if not self.affine:
            return None, None
        weight = self.param('weight', nn.initializers.ones,
                            (self.num_features,))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.num_features,))
        return weight, bias

    def __call__(self, x: Array) -> Array:
        weight, bias = self.materialize()
        mean = jnp.mean(x, axis=-1, keepdims=True)
        # Unbiased variance (N-1 denominator) for parity with torch.var.
        n = x.shape[-1]
        var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / max(n - 1, 1)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            y = y * weight + bias
        return y


class InstanceNorm(nn.Module):
    """InstanceNorm1d(affine=True, track_running_stats=False): normalize over
    the time axis per (sample, channel). Torch uses the biased variance here."""
    num_features: int
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: (B, W, C) — normalize over W.
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            weight = self.param('weight', nn.initializers.ones,
                                (self.num_features,))
            bias = self.param('bias', nn.initializers.zeros,
                              (self.num_features,))
            y = y * weight + bias
        return y


class BatchNorm(nn.Module):
    """BatchNorm1d parity: normalize over (batch, time) per channel with
    running statistics kept in the `batch_stats` collection."""
    num_features: int
    epsilon: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        # flax momentum convention: ra = momentum*ra + (1-momentum)*batch.
        # torch convention: ra = (1-momentum)*ra + momentum*batch.
        norm = nn.BatchNorm(use_running_average=not train,
                            momentum=1.0 - self.momentum,
                            epsilon=self.epsilon,
                            axis=-1,
                            name='bn')
        return norm(x)


class _Identity(nn.Module):
    num_features: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x


def _norm_factory(norm_mode: str):
    valid = ("batchNorm", "instanceNorm", "ID", "layerNorm")
    if norm_mode not in valid:
        raise ValueError(f"Norm mode must be in {list(valid)}")
    return {
        "layerNorm": ChannelNorm,
        "instanceNorm": InstanceNorm,
        "batchNorm": BatchNorm,
        "ID": _Identity,
    }[norm_mode]


def _torch_conv_uniform_init(fan_in: int):
    """torch Conv1d/Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv1d(nn.Module):
    """1-D convolution over NWC input with parameters stored in the torch
    layout `weight: (C_out, C_in, K)`, `bias: (C_out,)`.

    Keeping torch layout makes checkpoint conversion a pure rename; the
    transpose to XLA's `(K, C_in, C_out)` kernel layout is a free (fused)
    relayout at trace time.
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    compute_dtype: Any = None

    @nn.compact
    def materialize(self, in_features: int):
        """Create/fetch weight+bias without computing (used by the fused
        encoder path)."""
        fan_in = in_features * self.kernel_size
        weight = self.param('weight', _torch_conv_uniform_init(fan_in),
                            (self.features, in_features, self.kernel_size))
        bias = None
        if self.use_bias:
            bias = self.param('bias', _torch_conv_uniform_init(fan_in),
                              (self.features,))
        return weight, bias

    def __call__(self, x: Array) -> Array:
        weight, bias = self.materialize(x.shape[-1])
        dtype = self.compute_dtype or x.dtype
        kernel = jnp.transpose(weight, (2, 1, 0)).astype(dtype)  # (K, Cin, Cout)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            y = y + bias
        return y


class CPCEncoder(nn.Module):
    """5-layer strided Conv1d stack, 160x downsampling (reference
    `cpc/model.py:63-108`).

    Input: raw waveform `(B, T)` or `(B, T, 1)` float.
    Output: encoded frames `(B, T // 160, sizeHidden)` (NWC).
    """
    size_hidden: int = 512
    norm_mode: str = "layerNorm"
    compute_dtype: Any = None

    @property
    def dim_encoded(self) -> int:
        return self.size_hidden

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        if x.ndim == 2:
            x = x[..., None]
        norm_cls = _norm_factory(self.norm_mode)

        from ..ops.encoder_pallas import (_interpret, fused_encoder,
                                          use_fused_encoder)
        if (self.norm_mode == 'layerNorm' and x.shape[-1] == 1
                and self.compute_dtype is None
                and use_fused_encoder(x.shape[0], x.shape[1],
                                      self.size_hidden,
                                      conv_stack=CONV_STACK,
                                      norm_mode=self.norm_mode,
                                      dtype=x.dtype)):
            conv_w, conv_b, norm_w, norm_b = [], [], [], []
            for i, (k, s, p) in enumerate(CONV_STACK):
                w, b = Conv1d(self.size_hidden, k, s, p,
                              name=f'conv{i}').materialize(
                                  1 if i == 0 else self.size_hidden)
                nw, nb = ChannelNorm(self.size_hidden,
                                     name=f'batchNorm{i}').materialize()
                conv_w.append(w), conv_b.append(b)
                norm_w.append(nw), norm_b.append(nb)
            return fused_encoder(x[..., 0], tuple(conv_w), tuple(conv_b),
                                 tuple(norm_w), tuple(norm_b),
                                 _interpret())

        for i, (k, s, p) in enumerate(CONV_STACK):
            x = Conv1d(self.size_hidden, k, s, p,
                       compute_dtype=self.compute_dtype,
                       name=f'conv{i}')(x)
            norm = norm_cls(self.size_hidden, name=f'batchNorm{i}')
            x = norm(x, train=train) if isinstance(norm, BatchNorm) else norm(x)
            x = nn.relu(x)
        return x


# ---------------------------------------------------------------------------
# MFCC front-end (reference `cpc/model.py:111-125`, torchaudio-equivalent)
# ---------------------------------------------------------------------------

def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def melscale_fbanks(n_freqs: int, f_min: float, f_max: float, n_mels: int,
                    sample_rate: int) -> np.ndarray:
    """Triangular mel filter bank matching torchaudio's default (HTK scale,
    no normalization). Returns (n_freqs, n_mels)."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min, m_max = _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """DCT-II with 'ortho' norm, (n_mels, n_mfcc), torchaudio layout."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :]) * 2.0
    dct[:, 0] *= 1.0 / math.sqrt(2.0)
    dct *= 1.0 / math.sqrt(2.0 * n_mels)
    return dct.astype(np.float32)


class MFCCEncoder(nn.Module):
    """MFCC front-end alternative encoder (reference `cpc/model.py:111-125`).

    torchaudio defaults reproduced: n_fft=321, win=321, hop=160, center=True
    (reflect pad), Hann window, power spectrogram, HTK mel scale with
    n_mels=max(128, dim), log-mel via AmplitudeToDB(top_db=80), ortho DCT.
    Downsampling factor is 160 like the conv encoder.
    """
    dim_encoded: int
    sample_rate: int = 16000
    n_fft: int = 321

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        if x.ndim == 3:
            x = x[..., 0] if x.shape[-1] == 1 else x.reshape(x.shape[0], -1)
        n_mels = max(128, self.dim_encoded)
        hop = self.n_fft // 2  # 160
        pad = self.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode='reflect')
        n_frames = 1 + (x.shape[1] - self.n_fft) // hop
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(self.n_fft)[None, :])
        frames = x[:, idx]                                   # (B, F, n_fft)
        window = jnp.asarray(np.hanning(self.n_fft + 1)[:-1].astype(np.float32))
        spec = jnp.fft.rfft(frames * window, n=self.n_fft, axis=-1)
        power = jnp.square(jnp.abs(spec)).astype(jnp.float32)  # (B, F, n_freq)
        fb = jnp.asarray(melscale_fbanks(self.n_fft // 2 + 1, 0.0,
                                         self.sample_rate / 2, n_mels,
                                         self.sample_rate))
        mel = jnp.einsum('bfn,nm->bfm', power, fb)
        # AmplitudeToDB(stype='power', top_db=80). NB: torchaudio clamps
        # against the max of the WHOLE tensor (batch included) — a known
        # quirk of F.amplitude_to_DB — reproduced here for parity.
        db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        db = jnp.maximum(db, jnp.max(db) - 80.0)
        dct = jnp.asarray(_dct_matrix(self.dim_encoded, n_mels))
        return jnp.einsum('bfm,mc->bfc', db, dct)


class LFBEncoder(nn.Module):
    """Learned filter bank encoder (reference `cpc/model.py:128-155`):
    2*dim conv(k=400, s=1) -> squared-magnitude pairs -> Hann smoothing conv
    (stride 160, pad 350) -> log compression -> InstanceNorm."""
    dim_encoded: int
    normalize: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        if x.ndim == 2:
            x = x[..., None]
        y = Conv1d(2 * self.dim_encoded, 400, 1, 0, name='conv')(x)
        b, w, _ = y.shape
        y = y.reshape(b, w, self.dim_encoded, 2)
        y = jnp.square(y[..., 0]) + jnp.square(y[..., 1])    # (B, W, dim)
        # Hann smoothing: depthwise conv along time, stride 160, pad 350.
        han = jnp.asarray((np.hanning(401)[:-1]).astype(np.float32))
        kernel = jnp.tile(han[:, None, None], (1, 1, self.dim_encoded))
        y = jax.lax.conv_general_dilated(
            y, kernel, window_strides=(160,), padding=[(350, 350)],
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            feature_group_count=self.dim_encoded,
            preferred_element_type=jnp.float32)
        y = jnp.log1p(jnp.abs(y))
        if self.normalize:
            y = InstanceNorm(self.dim_encoded, affine=False,
                             name='instancenorm')(y)
        return y
