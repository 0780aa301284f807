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
XLA needs static shapes); `pitch` runs the same phase-vocoder +
linear-resample algorithm vectorized (the host's python frame loop becomes
gathers + one cumulative sum) while `pitch_quick`/`pitch_dropout` run the
host's QUICK linear-interp resample (sox `rate -q` semantics — a different
distribution from the vocoder); all are checked against the host
implementations in `tests/test_augment_device.py`. Gaussian noise and
time dropout are exact ports. The reverbs exploit linearity: freeverb is
LTI per room size, so artificial reverb becomes a gather from a
precomputed impulse-response bank + FFT convolution (numerically the host
filter chain); natural reverb uploads the measured IR bank once; additive
noise mixes from a device-resident pool of real noise windows.

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

# Freeverb tunings are shared with the host filter chain so the two
# implementations cannot drift apart numerically.
from .augmentation import (_ALLPASS_TUNINGS, _COMB_TUNINGS,
                           canonical_augment_type)

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


def _frame(x: Array, n_fft: int, hop: int) -> Array:
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode='reflect')
    n_frames = 1 + (xp.shape[0] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])
    return xp[idx]


def _resample_live_prefix(src: Array, true_len: Array, w: int) -> Array:
    """Linear-resample the live prefix `src[0:true_len]` (traced length on
    a static budget grid) down to `w` samples — host `np.interp` on
    endpoint=False grids: dst j maps to src position j*true_len/w.

    ONE row-gather of adjacent (src[i], src[i+1]) pairs instead of two
    element gathers (each element gather profiled 1.3 ms/step on TPU).
    Budget values past true_len are finite, and the pair partner's weight
    is forced to 0 at the prefix edge, so they never leak into the
    output."""
    pos = (jnp.arange(w, dtype=jnp.float32)
           * true_len.astype(jnp.float32) / w)
    i0 = jnp.clip(pos.astype(jnp.int32), 0, true_len - 1)
    fr = pos - i0.astype(jnp.float32)
    # past-the-end pair partner clamps to the same sample (host: i1 == i0)
    fr = jnp.where(i0 + 1 >= true_len, 0.0, fr)
    pairs = jnp.stack([src[:-1], src[1:]], axis=-1)          # (L-1, 2)
    rows = pairs[jnp.clip(i0, 0, pairs.shape[0] - 1)]        # (w, 2)
    return (1 - fr) * rows[:, 0] + fr * rows[:, 1]


def _pitch_one(x: Array, cents: Array,
               max_factor: float = 2.0 ** (400.0 / 1200.0)) -> Array:
    """Phase-vocoder pitch shift of one (W,) window by `cents` (traced).

    Vectorized version of the host algorithm (`augmentation.py:107-174`):
    time-stretch by rate=1/factor with a phase vocoder (the frame loop
    becomes gathers + an exclusive cumsum of wrapped phase deltas), then
    linear-resample the stretched signal back to W samples. `max_factor`
    (static) bounds the stretch the frame budget must cover; callers derive
    it from their maximum |cents| so any --shift_max fits exactly."""
    w = x.shape[0]
    factor = 2.0 ** (cents / 1200.0)
    rate = 1.0 / factor

    win = jnp.asarray(np.hanning(_N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(_frame(x, _N_FFT, _HOP) * win, axis=1)
    n_frames, n_bins = spec.shape

    # static output frame budget; frames past the true count are masked
    t_out_max = int(math.ceil((n_frames - 1) * max_factor)) + 1
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

    # linear resample stretched[0:true_len] -> w samples
    src = jax.lax.dynamic_slice_in_dim(stretched, pad, total - pad)
    y = _resample_live_prefix(src, true_len, w)

    # host: |cents| < 1 and non-finite results fall back to the input
    y = jnp.where(jnp.abs(cents) < 1, x, y)
    return jnp.where(jnp.isfinite(y).all(), y, x).astype(jnp.float32)


def pitch(x: Array, key: Array, shift_max: int = 300) -> Array:
    """Per-window random pitch shift ~ U{-shift_max, shift_max - 1} cents
    (host `PitchAugment`)."""
    b = x.shape[0]
    cents = jax.random.randint(key, (b,), -shift_max,
                               shift_max).astype(jnp.float32)
    # worst stretch at +shift_max cents; static so the vmapped frame
    # budget matches any user-set --shift_max exactly
    max_factor = 2.0 ** (shift_max / 1200.0)
    return jax.vmap(lambda xi, ci: _pitch_one(xi, ci, max_factor))(x, cents)


def _pitch_quick_one(x: Array, cents: Array, max_factor: float) -> Array:
    """The host's `quick` pitch branch (`augmentation.py:215-218`, sox
    `rate -q`) on one (W,) window: linear-interp resample to a stretched
    length of ceil(W*factor) samples, then linear-resample back to W —
    NOT the phase vocoder. Static shapes: the stretched signal lives on a
    ceil(W*max_factor) budget grid with the live prefix tracked by the
    traced true length."""
    w = x.shape[0]
    factor = 2.0 ** (cents / 1200.0)
    step = 1.0 / factor
    # host: len(np.arange(0, w, step)) == ceil(w / step)
    true_len = jnp.ceil(w / step).astype(jnp.int32)

    l_max = int(math.ceil(w * max_factor)) + 1
    k = jnp.arange(l_max, dtype=jnp.float32)
    pos = k * step                                         # (L_max,)
    i0 = jnp.clip(pos.astype(jnp.int32), 0, w - 1)
    fr = pos - i0.astype(jnp.float32)
    # pairs[w-1] duplicates the last sample, so positions in (w-1, w)
    # clamp like np.interp's right fill
    xp = jnp.concatenate([x, x[-1:]])
    pairs = jnp.stack([xp[:-1], xp[1:]], axis=-1)          # (w, 2)
    rows = pairs[i0]
    stretched = (1 - fr) * rows[:, 0] + fr * rows[:, 1]    # (L_max,)

    # host: np.interp(linspace(0,1,w,endpoint=False),
    #                 linspace(0,1,L,endpoint=False), stretched)
    y = _resample_live_prefix(stretched, true_len, w)

    # host pitch_shift: |cents| < 1 and non-finite outputs return the input
    y = jnp.where(jnp.abs(cents) < 1, x, y)
    return jnp.where(jnp.isfinite(y).all(), y, x).astype(jnp.float32)


def pitch_quick(x: Array, key: Array, shift_max: int = 300) -> Array:
    """Per-window random QUICK pitch shift (host `PitchAugment(quick=True)`
    — the semantics of `--augment_type pitch_quick`, and of
    `pitch_dropout`'s pitch stage under the default `--pitch_algo`)."""
    b = x.shape[0]
    cents = jax.random.randint(key, (b,), -shift_max,
                               shift_max).astype(jnp.float32)
    max_factor = 2.0 ** (shift_max / 1200.0)
    return jax.vmap(
        lambda xi, ci: _pitch_quick_one(xi, ci, max_factor))(x, cents)


# ---------------------------------------------------------------------------
# WSOLA pitch (host: `augmentation.py:_wsola_stretch` — the sox tempo/pitch
# algorithm family, `/root/reference/cpc/data_augmentation.py:64-100`)
#
# WSOLA looks sequential (each segment's best lag depends on the tail the
# previous segment left behind), but the search window is FIXED (sox tempo
# music defaults: segment 82 ms, search ±14.68 ms, overlap 12 ms), so each
# step is one static (2*search+1, ovr) masked cross-correlation matvec +
# argmax; the whole stretch is a ~9-22-step `lax.scan` carrying the
# ovr-sample tail. Two structural facts make it scatter-free:
#   * the output write position is pos = i*hop — STATIC per scan step;
#   * the crossfade reference `tail` always equals chunk_prev[hop:]
#     (tail = x[best+hop : best+hop+ovr] and chunk = x[best : best+seg]
#     with hop = seg-ovr, including the zero-padded end case), so the
#     final output over [i*hop, (i+1)*hop) is exactly
#     concat(crossfade(tail_prev, chunk_i[:ovr]), chunk_i[ovr:hop]) —
#     the stretched signal is a plain reshape of the scanned rows.
# ---------------------------------------------------------------------------

_WS_SEG = int(82.0 * SAMPLE_RATE / 1000)       # 1312
_WS_OVR = int(12.0 * SAMPLE_RATE / 1000)       # 192
_WS_SEARCH = int(14.68 * SAMPLE_RATE / 1000)   # 234
_WS_HOP = _WS_SEG - _WS_OVR                    # 1120


def _round_ratio(num: Array, den: Array) -> Array:
    """round(num/den) with python/numpy round-half-to-even semantics, in
    exact int32 arithmetic (the host computes `int(round(pos * rate))` in
    float64; for the magnitudes here the float64 result is the correctly
    rounded rational, which this reproduces bit-exactly)."""
    q = num // den
    r = num - q * den
    up = (2 * r > den) | ((2 * r == den) & (q % 2 == 1))
    return q + up.astype(q.dtype)


def _wsola_stretch_dev(x: Array, out_len: Array, max_out_len: int) -> Array:
    """WSOLA time-stretch of one (W,) window to `out_len` samples (traced)
    on a static budget of `max_out_len`. Returns the stretched signal on a
    `ceil(max_out_len/hop)*hop` grid whose live prefix is `out_len`.

    Bit-matches the host `_wsola_stretch` (itself pinned to the committed
    float64 oracle) up to f32 rounding: same segment positions, same
    first-max argmax tie-break (ascending candidate position), same
    crossfade-REPLACE synthesis, same boundary fallbacks.

    TPU layout: NO gathers — element gathers measured 135 ms/batch for
    the whole pitch stage. Each step takes ONE `dynamic_slice` of
    2*search+ovr samples from a zero-padded copy of x and scores all
    2*search+1 lags with `jnp.correlate` (XLA lowers it to a conv the MXU
    runs as a matmul); the chunk is a second `dynamic_slice` from the same
    padded copy, whose trailing zeros realize the host's end-of-input
    zero-fill for free."""
    w = x.shape[0]
    seg, ovr, search, hop = _WS_SEG, _WS_OVR, _WS_SEARCH, _WS_HOP
    n_steps = -(-max_out_len // hop)
    ramp = jnp.linspace(0.0, 1.0, ovr).astype(x.dtype)
    # xp[search + k] == x[k], zeros outside; long enough that every slice
    # below stays in range without clamping (want <= w)
    xp = jnp.pad(x, (search, seg + search))
    # int32 overflow guard for the exact-rational rounding below
    assert (n_steps - 1) * hop * w < 2 ** 31, \
        "window too large for int32 WSOLA position math"

    def step(tail, i):
        pos = i * hop
        want = _round_ratio(pos * w, out_len)
        # candidate search (host: sliding_window_view + argmax). Candidate
        # j sits at position p = want - search + j; slice s makes
        # s[j:j+ovr] == x[p:p+ovr] (zero-padded out of range). Positions
        # outside [lo, hi] score -inf; jnp.argmax picks the first max, the
        # same ascending-position tie-break as np.argmax over cands.
        lo = jnp.maximum(0, want - search)
        hi = jnp.minimum(w - seg, want + search)
        s = jax.lax.dynamic_slice(xp, (want,), (2 * search + ovr,))
        scores = jnp.correlate(s, tail, mode='valid',
                               precision=jax.lax.Precision.HIGHEST)
        p = want - search + jnp.arange(2 * search + 1)
        j = jnp.argmax(jnp.where((p >= lo) & (p <= hi), scores, -jnp.inf))
        best_c = jnp.where(hi > lo, want - search + j,
                           # host fallback: max(0, min(want, w - seg))
                           jnp.maximum(0, jnp.minimum(want, w - seg)))
        # end-of-input zero-pad case keeps best = want (xp's trailing
        # zeros supply the host's zero fill); first segment has no tail
        best = jnp.where((want + seg > w) | (i == 0), want, best_c)
        chunk = jax.lax.dynamic_slice(xp, (best + search,), (seg,))
        blend = jnp.where(i == 0, chunk[:ovr],
                          tail * (1 - ramp) + chunk[:ovr] * ramp)
        return chunk[hop:], jnp.concatenate([blend, chunk[ovr:hop]])

    _, out_rows = jax.lax.scan(step, jnp.zeros(ovr, x.dtype),
                               jnp.arange(n_steps))
    return out_rows.reshape(-1)


def _pitch_wsola_one(x: Array, cents: Array, max_factor: float) -> Array:
    """WSOLA pitch shift of one (W,) window by `cents` (traced): stretch
    to round(W*factor) samples, linear-resample back to W — the host
    `pitch_shift(..., algo='wsola')` pipeline, fully on device."""
    w = x.shape[0]
    factor = 2.0 ** (cents / 1200.0)
    out_len = jnp.round(w * factor).astype(jnp.int32)
    max_out = int(math.ceil(w * max_factor)) + 1
    stretched = _wsola_stretch_dev(x, out_len, max_out)
    y = _resample_live_prefix(stretched, out_len, w)
    y = jnp.where(jnp.abs(cents) < 1, x, y)
    return jnp.where(jnp.isfinite(y).all(), y, x).astype(jnp.float32)


def pitch_wsola(x: Array, key: Array, shift_max: int = 300) -> Array:
    """Per-window random WSOLA pitch shift ~ U{-shift_max, shift_max - 1}
    cents — `--pitch_algo wsola` (the sox training distribution) in the
    `--augment_on_device` fast path."""
    b = x.shape[0]
    cents = jax.random.randint(key, (b,), -shift_max,
                               shift_max).astype(jnp.float32)
    max_factor = 2.0 ** (shift_max / 1200.0)
    return jax.vmap(
        lambda xi, ci: _pitch_wsola_one(xi, ci, max_factor))(x, cents)


# ---------------------------------------------------------------------------
# Gaussian additive noise (host: `RandomAdditiveNoiseAugment`)
# ---------------------------------------------------------------------------

def gaussian_noise(x: Array, key: Array, snr: float = 15.0) -> Array:
    """Exact port of the host formula (`RandomAdditiveNoiseAugment`,
    host `augmentation.py:338-347`): noise scaled relative to the window's
    own std by a 10^(snr/10) power ratio, per window."""
    alpha = (10.0 ** (snr / 10.0)) / (x.std(axis=-1, keepdims=True) + 1e-12)
    return x + jax.random.normal(key, x.shape, x.dtype) / alpha


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
# Artificial reverb (host: `ReverbAugment` — freeverb)
#
# Freeverb is LTI for a fixed room size, so the whole filter chain collapses
# to ONE convolution with a precomputed impulse response. A bank of IRs
# (one per integer room size) is built on the host at first trace and baked
# into the program; each window gathers its room's IR and FFT-convolves.
# The IR is computed with an O(W) block recurrence — the comb/allpass
# feedback taps sit ~1600 samples back, so a generic IIR routine
# (scipy.lfilter) would cost O(W * delay) per filter and take minutes for
# the bank.
# ---------------------------------------------------------------------------



def _comb_np(x: np.ndarray, d: int, c1: float, c2: float) -> np.ndarray:
    """y[n] = x[n-d] + c1*y[n-d] + c2*y[n-d-1], evaluated block-by-block
    (every referenced index is < the block start, so blocks of d samples
    vectorize)."""
    w = x.shape[0]
    y = np.zeros(w, x.dtype)
    for start in range(0, w, d):
        idx = np.arange(start, min(start + d, w))
        acc = np.zeros(idx.shape[0], x.dtype)
        m = idx >= d
        acc[m] = x[idx[m] - d] + c1 * y[idx[m] - d]
        m2 = idx >= d + 1
        acc[m2] += c2 * y[idx[m2] - d - 1]
        y[idx] = acc
    return y


def _allpass_np(x: np.ndarray, d: int) -> np.ndarray:
    """y[n] = -0.5*x[n] + x[n-d] + 0.5*y[n-d] (same block scheme)."""
    w = x.shape[0]
    y = np.zeros(w, x.dtype)
    ff = -0.5 * x
    ff[d:] += x[:-d]
    for start in range(0, w, d):
        idx = np.arange(start, min(start + d, w))
        acc = ff[idx].copy()
        m = idx >= d
        acc[m] += 0.5 * y[idx[m] - d]
        y[idx] = acc
    return y


def _freeverb_ir(room: float, reverberance: float, hf_damping: float,
                 w: int) -> np.ndarray:
    """Impulse response of the host `_freeverb` chain (augmentation.py:
    197-227), truncated to w (the host output is cropped to w anyway)."""
    feedback = 0.28 + 0.7 * (room / 100.0)
    damping = hf_damping / 100.0 * 0.4 + 0.2
    delta = np.zeros(w, np.float64)
    delta[0] = 1.0
    wet = np.zeros(w, np.float64)
    for d in _COMB_TUNINGS:
        wet += _comb_np(delta, d, feedback * (1 - damping),
                        feedback * damping)
    wet /= len(_COMB_TUNINGS)
    for d in _ALLPASS_TUNINGS:
        wet = _allpass_np(wet, d)
    mix = reverberance / 100.0
    return ((1 - mix * 0.5) * delta + mix * 0.5 * wet).astype(np.float32)


_IR_BANK_CACHE: dict = {}


def _freeverb_ir_bank(n_rooms: int, reverberance: float, hf_damping: float,
                      w: int) -> np.ndarray:
    key = (n_rooms, reverberance, hf_damping, w)
    if key not in _IR_BANK_CACHE:
        _IR_BANK_CACHE[key] = np.stack(
            [_freeverb_ir(room, reverberance, hf_damping, w)
             for room in range(n_rooms)])
    return _IR_BANK_CACHE[key]


def _fft_conv_crop(x: Array, ir: Array) -> Array:
    """Per-row causal convolution cropped to the input length
    (= scipy 'full' mode [:w], the host reverb layout)."""
    w = x.shape[-1]
    nfft = 1 << (2 * w - 2).bit_length()
    y = jnp.fft.irfft(jnp.fft.rfft(x, nfft) * jnp.fft.rfft(ir, nfft), nfft)
    return y[..., :w].astype(x.dtype)


def artificial_reverb(x: Array, key: Array, n_rooms: int = 100,
                      reverberance: float = 100.0,
                      hf_damping: float = 100.0) -> Array:
    """Per-window random-room freeverb (host `ReverbAugment`,
    augmentation.py:230-243; room ~ U{0..n_rooms-1})."""
    b, w = x.shape
    bank = jnp.asarray(_freeverb_ir_bank(n_rooms, reverberance,
                                         hf_damping, w))
    rooms = jax.random.randint(key, (b,), 0, n_rooms)
    return _fft_conv_crop(x, bank[rooms])


def artificial_reverb_dropout(x: Array, key: Array,
                              t_ms: int = 100) -> Array:
    """Host `ReverbDropout` (augmentation.py:264-273): reverb(50, 50,
    random room) then time dropout."""
    k1, k2 = jax.random.split(key)
    y = artificial_reverb(x, k1, reverberance=50.0, hf_damping=50.0)
    return time_dropout(y, k2, t_ms=t_ms)


def pitch_dropout(x: Array, key: Array, shift_max: int = 300,
                  t_ms: int = 100, pitch_algo: str = 'wsola') -> Array:
    """Host `PitchDropout` (augmentation.py:339-354): pitch + time
    dropout. Default `--pitch_algo wsola` runs the WSOLA stretch (the
    reference chain `pitch ... rate -q` is a WSOLA stretch + quick
    RESAMPLE — sox's `-q` never changes the stretch); the legacy
    'vocoder' algo keeps round 3's quick linear-stretch shortcut."""
    k1, k2 = jax.random.split(key)
    stage = pitch_wsola if pitch_algo == 'wsola' else pitch_quick
    return time_dropout(stage(x, k1, shift_max=shift_max), k2, t_ms=t_ms)


# ---------------------------------------------------------------------------
# Natural reverb (host: `NaturalReverb` — measured impulse responses)
# ---------------------------------------------------------------------------

def _peak_norm(x: Array) -> Array:
    return x / (jnp.max(jnp.abs(x), axis=-1, keepdims=True) + 1e-8)


def _energy_norm(x: Array) -> Array:
    return x / (jnp.sqrt(jnp.mean(x ** 2, axis=-1, keepdims=True)) + 1e-8)


def make_natural_reverb(ir_paths: str, p: float,
                        batch_wise: bool = False) -> Callable:
    """Device port of host `NaturalReverb` (augmentation.py:354-401): the
    IR bank is loaded from disk ONCE and uploaded with the program; each
    window convolves with a random IR with probability p (peak-normalized
    either way, like the host). `batch_wise` draws one IR per batch."""
    import os as _os

    from .audio_io import load_audio
    from .corpus import find_all_seqs

    ir_files, _ = find_all_seqs(ir_paths, extension=".wav", speaker_level=0)
    irs = []
    for _, rel in ir_files:
        ir, _sr = load_audio(_os.path.join(ir_paths, rel))
        irs.append(np.asarray(ir, np.float32).reshape(-1))
    if not irs:
        raise ValueError(f"no impulse responses found under {ir_paths}")
    print("Found %d files for natural reverberation (device bank)"
          % len(irs))
    max_len = max(r.shape[0] for r in irs)
    bank_np = np.stack([np.pad(r, (0, max_len - r.shape[0])) for r in irs])

    def apply(x: Array, key: Array) -> Array:
        b, w = x.shape
        bank = jnp.asarray(bank_np[:, :w] if max_len >= w else np.pad(
            bank_np, ((0, 0), (0, w - max_len))))
        k_idx, k_p = jax.random.split(key)
        n_draws = 1 if batch_wise else b
        idx = jax.random.randint(k_idx, (n_draws,), 0, bank.shape[0])
        ir = jnp.broadcast_to(bank[idx], (b, w)) if batch_wise \
            else bank[idx]
        wet = _peak_norm(_fft_conv_crop(x, ir))
        dry = _peak_norm(x)
        on = jax.random.uniform(k_p, (b, 1)) < p
        return jnp.where(on, wet, dry)
    return apply


# ---------------------------------------------------------------------------
# Additive noise from a corpus (host: `AdditiveNoiseAugment`)
# ---------------------------------------------------------------------------

def make_additive_noise(noise_dataset, snr_min: float, snr_max: float,
                        batch_size: int, pool_size: int = 512,
                        sampling: str = 'uniform') -> Callable:
    """Device port of host `AdditiveNoiseAugment` (augmentation.py:
    291-335): a pool of noise windows is drawn from the noise corpus'
    loader once (meta-augmentation applies there, like the host) and kept
    device-resident; each window mixes a random pool row at a random
    SNR ~ U[snr_min, snr_max]. Distribution note: the host consumes noise
    windows sequentially without replacement per epoch; the device pool
    samples WITH replacement from `pool_size` windows."""
    assert noise_dataset is not None and snr_min <= snr_max
    loader = noise_dataset.getDataLoader(
        min(batch_size, 64), sampling, True, numWorkers=0, onLoop=-1,
        nLoops=-1, remove_artefacts=sampling != 'uniform')
    rows = []
    for batch in loader:
        seqs = np.asarray(batch[0])            # (B, 2, 1, W)
        # host draws view 0 of each noise window (augmentation.py:322)
        rows.extend(seqs[:, 0].reshape(seqs.shape[0], -1))
        if len(rows) >= pool_size:
            break
    pool_np = np.stack(rows[:pool_size]).astype(np.float32)
    print("Device noise pool: %d windows of %d samples"
          % (pool_np.shape[0], pool_np.shape[1]))

    def apply(x: Array, key: Array) -> Array:
        b, w = x.shape
        pool = jnp.asarray(pool_np[:, :w])
        k_idx, k_snr = jax.random.split(key)
        noise = pool[jax.random.randint(k_idx, (b,), 0, pool.shape[0])]
        snr = jax.random.uniform(k_snr, (b, 1), minval=snr_min,
                                 maxval=snr_max)
        noise_rms = 10.0 ** (-snr / 20.0)
        return _peak_norm(_energy_norm(x)
                          + _energy_norm(noise) * noise_rms).astype(x.dtype)
    return apply


# ---------------------------------------------------------------------------
# Factory + combined transform
# ---------------------------------------------------------------------------

# names match the CLI `--augment_type` vocabulary (config.py);
# 'random_noise' is programmatic-only (no CLI spelling in the reference)
DEVICE_AUGMENTATIONS = ('bandreject', 'pitch', 'pitch_quick',
                        'pitch_dropout', 'time_dropout', 'random_noise',
                        'artificial_reverb', 'artificial_reverb_dropout',
                        'natural_reverb', 'additive')


def make_device_augment(augment_types: Sequence[str],
                        shift_max: int = 300,
                        bandreject_scaler: float = 1.0,
                        noise_snr: float = 15.0,
                        t_ms: int = 100,
                        noise_dataset=None,
                        snr_min: float = 5.0,
                        snr_max: float = 20.0,
                        batch_size: int = 8,
                        ir_paths: Optional[str] = None,
                        ir_prob: float = 1.0,
                        ir_batch_wise: bool = False,
                        noise_sampling: str = 'uniform',
                        pitch_algo: str = 'wsola'
                        ) -> Optional[Callable]:
    """Composable device transform covering the full host
    `augmentation_factory` vocabulary. Returns `f(x, key) -> x` over (B, W)
    windows, or None for an empty list.

    `natural_reverb` needs `ir_paths` (an impulse-response directory) and
    `additive` needs `noise_dataset` — same requirements as the host
    factory; a missing resource raises like the host does. Unknown names
    raise ValueError.
    """
    names = [canonical_augment_type(t) for t in augment_types or []]
    # Under the default pitch_algo='wsola' EVERY pitch stage runs the
    # WSOLA stretch (host pitch_shift dispatches on algo first — sox
    # `pitch` is WSOLA in all the reference chains, quick or not). The
    # legacy 'vocoder' algo keeps round 3's mapping, incl. the host
    # factory's quick contagion: CombinedTransforms passes
    # pitch_quick=('pitch_quick' in augment_type) to every pitch stage
    # (`augmentation.py:582-584`), so a plain 'pitch' listed next to a
    # 'pitch_quick' also runs the quick resample.
    quick_contagion = len(names) > 1 and 'pitch_quick' in names
    chain = []
    for name in names:
        if name == 'bandreject':
            chain.append(functools.partial(bandreject,
                                           scaler=bandreject_scaler))
        elif name in ('pitch', 'pitch_quick') and pitch_algo == 'wsola':
            chain.append(functools.partial(pitch_wsola,
                                           shift_max=shift_max))
        elif name == 'pitch_quick' or (name == 'pitch' and quick_contagion):
            chain.append(functools.partial(pitch_quick,
                                           shift_max=shift_max))
        elif name == 'pitch':
            chain.append(functools.partial(pitch, shift_max=shift_max))
        elif name == 'pitch_dropout':
            chain.append(functools.partial(pitch_dropout,
                                           shift_max=shift_max, t_ms=t_ms,
                                           pitch_algo=pitch_algo))
        elif name == 'random_noise':
            chain.append(functools.partial(gaussian_noise, snr=noise_snr))
        elif name == 'time_dropout':
            chain.append(functools.partial(time_dropout, t_ms=t_ms))
        elif name == 'artificial_reverb':
            chain.append(artificial_reverb)
        elif name == 'artificial_reverb_dropout':
            chain.append(functools.partial(artificial_reverb_dropout,
                                           t_ms=t_ms))
        elif name == 'natural_reverb':
            if ir_paths is None:
                raise RuntimeError('Impulse responses are needed for the '
                                   'natural reverb (--pathImpulseResponses)')
            chain.append(make_natural_reverb(ir_paths, ir_prob,
                                             batch_wise=ir_batch_wise))
        elif name == 'additive':
            if noise_dataset is None:
                raise RuntimeError('Noise dataset is needed for the '
                                   'additive noise')
            # noise_sampling carries --temporal_additive_noise through to
            # the pool loader (host factory maps the flag to the
            # temporalsamespeaker sampler, augmentation.py:557)
            chain.append(make_additive_noise(noise_dataset, snr_min,
                                             snr_max, batch_size,
                                             sampling=noise_sampling))
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
