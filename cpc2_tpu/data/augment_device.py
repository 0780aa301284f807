"""On-device (TPU) data augmentation — the accelerator-side equivalent of
the host pipeline in `augmentation.py` (itself a sox-free rewrite of the
reference's WavAugment chains, `cpc/data_augmentation.py`).

Why: the host implementations run per-window python/numpy (the phase
vocoder alone is ~10 ms per 1.28 s window on one core), which collapses
augmented training from ~14 to ~90 ms/batch on a single-core host. The
device versions are batched, jit-compiled, keyed by the training step's
PRNG, and add ~1 ms to a 6 ms step. They also preserve the int16/dedup
wire format (`parallel/mesh.py:WireStager`): the host ships the clean
PCM16 windows and the chip augments after upload.

Numerics: `bandreject` builds the same Kaiser-windowed sinc band-stop as
the host (fixed taps instead of the host's data-dependent auto-sizing —
XLA needs static shapes) and `pitch` runs the same phase-vocoder +
linear-resample algorithm vectorized (the host's python frame loop becomes
gathers + one cumulative sum); both are checked against the host
implementations in `tests/test_augment_device.py`. Gaussian noise and
time dropout are exact ports.

All functions take (B, W) float32 and a PRNG key and return (B, W); every
window in the batch draws independent parameters, matching the host
pipeline's per-window randomness.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000.0

Array = jax.Array


# ---------------------------------------------------------------------------
# Band-reject (host: `augmentation.py:BandrejectAugment`)
# ---------------------------------------------------------------------------

_BR_TAPS = 1021          # fixed odd tap count (host auto-sizes 255..4001)


def _freq2mel(f):
    return 2595.0 * jnp.log10(1 + f / 700.0)


def _mel2freq(m):
    return (10.0 ** (m / 2595.0) - 1) * 700.0


def _kaiser_window(n: int, beta: float) -> Array:
    k = jnp.arange(n, dtype=jnp.float32)
    r = 2.0 * k / (n - 1) - 1.0
    return jnp.i0(beta * jnp.sqrt(jnp.clip(1 - r * r, 0.0, None))) \
        / jnp.i0(jnp.float32(beta))


def _bandstop_taps(lo: Array, hi: Array, numtaps: int = _BR_TAPS) -> Array:
    """Kaiser(beta=12)-windowed sinc band-stop for one (lo, hi) Hz pair —
    the same construction as scipy.signal.firwin(pass_zero='bandstop'),
    including the passband-unity normalization at DC."""
    m = jnp.arange(numtaps, dtype=jnp.float32) - (numtaps - 1) / 2.0
    f1 = lo / (SAMPLE_RATE / 2)
    f2 = hi / (SAMPLE_RATE / 2)

    def lowpass(fc):
        return fc * jnp.sinc(fc * m)

    delta = jnp.where(m == 0, 1.0, 0.0)
    band = lowpass(f2) - lowpass(f1)          # band-pass prototype
    h = (delta - band) * _kaiser_window(numtaps, 12.0)
    # firwin scales so the DC response is exactly 1 (pass_zero band)
    return h / jnp.sum(h)


def bandreject(x: Array, key: Array, scaler: float = 1.0) -> Array:
    """Per-window random mel-spaced band rejection (host `:78-100`)."""
    b, w = x.shape
    k1, k2 = jax.random.split(key)
    melfmax = _freq2mel(SAMPLE_RATE / 2)
    meldf = jax.random.uniform(k1, (b,)) * melfmax * (27.0 * scaler) / 256.0
    melf0 = jax.random.uniform(k2, (b,)) * (melfmax - meldf)
    lo = jnp.clip(_mel2freq(melf0), 1.0, SAMPLE_RATE / 2 - 1.0)
    hi = jnp.clip(_mel2freq(melf0 + meldf), 1.0, SAMPLE_RATE / 2 - 1.0)
    degenerate = (hi - lo) < 2.0              # host: no-op band

    taps = jax.vmap(_bandstop_taps)(lo, hi)   # (B, T)

    # 'same'-mode FFT convolution, per-window kernel
    n = w + _BR_TAPS - 1
    nfft = 1 << (n - 1).bit_length()
    y = jnp.fft.irfft(jnp.fft.rfft(x, nfft) * jnp.fft.rfft(taps, nfft),
                      nfft)[:, (_BR_TAPS - 1) // 2:(_BR_TAPS - 1) // 2 + w]
    return jnp.where(degenerate[:, None], x, y.astype(x.dtype))


# ---------------------------------------------------------------------------
# Pitch shift (host: `augmentation.py:pitch_shift` — phase vocoder)
# ---------------------------------------------------------------------------

_N_FFT, _HOP = 1024, 256
# max stretch: shift_max=300 cents down -> factor 2^(300/1200) ~ 1.189
_MAX_FACTOR = 2.0 ** (400.0 / 1200.0)


def _frame(x: Array, n_fft: int, hop: int) -> Array:
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode='reflect')
    n_frames = 1 + (xp.shape[0] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])
    return xp[idx]


def _pitch_one(x: Array, cents: Array) -> Array:
    """Phase-vocoder pitch shift of one (W,) window by `cents` (traced).

    Vectorized version of the host algorithm (`augmentation.py:107-174`):
    time-stretch by rate=1/factor with a phase vocoder (the frame loop
    becomes gathers + an exclusive cumsum of wrapped phase deltas), then
    linear-resample the stretched signal back to W samples."""
    w = x.shape[0]
    factor = 2.0 ** (cents / 1200.0)
    rate = 1.0 / factor

    win = jnp.asarray(np.hanning(_N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(_frame(x, _N_FFT, _HOP) * win, axis=1)
    n_frames, n_bins = spec.shape

    # static output frame budget; frames past the true count are masked
    t_out_max = int(math.ceil((n_frames - 1) / (1.0 / _MAX_FACTOR))) + 1
    t = jnp.arange(t_out_max, dtype=jnp.float32)
    steps = t * rate
    n_out = jnp.ceil((n_frames - 1) / rate).astype(jnp.int32)  # host arange
    live = t < n_out.astype(jnp.float32)
    i = jnp.clip(steps.astype(jnp.int32), 0, n_frames - 2)
    frac = steps - i

    omega = (2 * jnp.pi * _HOP * jnp.arange(n_bins)
             / ((n_bins - 1) * 2)).astype(jnp.float32)
    s_i = spec[i]                                       # (T_out, F)
    s_i1 = spec[i + 1]
    mag = (1 - frac)[:, None] * jnp.abs(s_i) + frac[:, None] * jnp.abs(s_i1)
    dphase = jnp.angle(s_i1) - jnp.angle(s_i) - omega[None, :]
    dphase -= 2 * jnp.pi * jnp.round(dphase / (2 * jnp.pi))
    # host: phase[t] = angle(spec[0]) + sum_{u<t} (omega + dphase_u)
    inc = omega[None, :] + dphase
    phase = jnp.angle(spec[0])[None, :] + jnp.concatenate(
        [jnp.zeros((1, n_bins)), jnp.cumsum(inc, axis=0)[:-1]], axis=0)
    out_spec = mag * jnp.exp(1j * phase) * live[:, None]

    # inverse STFT with overlap-add (hop divides n_fft: 4 shifted sums)
    frames = jnp.fft.irfft(out_spec, n=_N_FFT, axis=1) * win[None, :]
    total = _HOP * (t_out_max - 1) + _N_FFT
    out = jnp.zeros(total)
    norm = jnp.zeros(total)
    wsq = (win ** 2) * live[:, None]
    for r in range(_N_FFT // _HOP):
        seg = frames[:, r * _HOP:(r + 1) * _HOP].reshape(-1)
        sqr = wsq[:, r * _HOP:(r + 1) * _HOP].reshape(-1)
        out = out.at[r * _HOP:r * _HOP + seg.shape[0]].add(seg)
        norm = norm.at[r * _HOP:r * _HOP + sqr.shape[0]].add(sqr)
    stretched = out / jnp.maximum(norm, 1e-8)
    pad = _N_FFT // 2
    # host istft crops [pad : pad + round(w*factor)]
    true_len = jnp.round(w * factor).astype(jnp.int32)

    # linear resample stretched[0:true_len] -> w samples (host np.interp on
    # endpoint=False grids: dst j maps to src position j*true_len/w).
    # ONE row-gather of adjacent (src[i], src[i+1]) pairs instead of two
    # element gathers (each profiled 1.3 ms/step on TPU).
    pos = jnp.arange(w, dtype=jnp.float32) * true_len.astype(jnp.float32) / w
    i0 = jnp.clip(pos.astype(jnp.int32), 0, true_len - 1)
    fr = pos - i0
    # past-the-end pair partner clamps to the same sample (i1 == i0)
    fr = jnp.where(i0 + 1 >= true_len, 0.0, fr)
    src = jax.lax.dynamic_slice_in_dim(stretched, pad, total - pad)
    pairs = jnp.stack([src[:-1], src[1:]], axis=-1)          # (L-1, 2)
    rows = pairs[jnp.clip(i0, 0, pairs.shape[0] - 1)]        # (w, 2)
    y = (1 - fr) * rows[:, 0] + fr * rows[:, 1]

    # host: |cents| < 1 and non-finite results fall back to the input
    y = jnp.where(jnp.abs(cents) < 1, x, y)
    return jnp.where(jnp.isfinite(y).all(), y, x).astype(jnp.float32)


def pitch(x: Array, key: Array, shift_max: int = 300) -> Array:
    """Per-window random pitch shift ~ U{-shift_max, shift_max - 1} cents
    (host `PitchAugment`)."""
    b = x.shape[0]
    cents = jax.random.randint(key, (b,), -shift_max,
                               shift_max).astype(jnp.float32)
    return jax.vmap(_pitch_one)(x, cents)


# ---------------------------------------------------------------------------
# Gaussian additive noise (host: `RandomAdditiveNoiseAugment`)
# ---------------------------------------------------------------------------

def gaussian_noise(x: Array, key: Array, snr: float = 15.0) -> Array:
    alpha = 1.0 / (10.0 ** (snr / 20.0))
    return x + alpha * jax.random.normal(key, x.shape, x.dtype)


# ---------------------------------------------------------------------------
# Time dropout (host: `TimeDropoutAugment`)
# ---------------------------------------------------------------------------

def time_dropout(x: Array, key: Array, t_ms: int = 100) -> Array:
    """Zero a random span of up to t_ms milliseconds per window."""
    b, w = x.shape
    k1, k2 = jax.random.split(key)
    seg = jax.random.randint(k1, (b,), 0, int(t_ms * SAMPLE_RATE / 1000))
    start = jax.random.randint(k2, (b,), 0,
                               jnp.maximum(w - seg, 1))
    pos = jnp.arange(w)[None, :]
    mask = (pos >= start[:, None]) & (pos < (start + seg)[:, None])
    return jnp.where(mask, 0.0, x)


# ---------------------------------------------------------------------------
# Factory + combined transform
# ---------------------------------------------------------------------------

# names match the CLI `--augment_type` vocabulary (config.py);
# 'random_noise' is programmatic-only (no CLI spelling in the reference)
DEVICE_AUGMENTATIONS = ('bandreject', 'pitch', 'pitch_quick',
                        'time_dropout', 'random_noise')


def make_device_augment(augment_types: Sequence[str],
                        shift_max: int = 300,
                        bandreject_scaler: float = 1.0,
                        noise_snr: float = 15.0,
                        t_ms: int = 100) -> Optional[Callable]:
    """Composable device transform for the supported augmentation names
    (subset of the host `augmentation_factory` vocabulary). Returns
    `f(x, key) -> x` over (B, W) windows, or None for an empty list.

    Raises ValueError for types that need host resources (additive noise
    datasets, impulse responses) or are not yet device-ported — callers
    fall back to the host pipeline for those.
    """
    chain = []
    for name in augment_types or []:
        if name == 'bandreject':
            chain.append(functools.partial(bandreject,
                                           scaler=bandreject_scaler))
        elif name in ('pitch', 'pitch_quick'):
            chain.append(functools.partial(pitch, shift_max=shift_max))
        elif name == 'random_noise':
            chain.append(functools.partial(gaussian_noise, snr=noise_snr))
        elif name == 'time_dropout':
            chain.append(functools.partial(time_dropout, t_ms=t_ms))
        else:
            raise ValueError(
                f"augmentation {name!r} has no device implementation "
                f"(supported: {DEVICE_AUGMENTATIONS}); run it on the host "
                f"pipeline instead")
    if not chain:
        return None

    def apply(x: Array, key: Array) -> Array:
        for n, fn in enumerate(chain):
            x = fn(x, jax.random.fold_in(key, n))
        return x
    return apply
