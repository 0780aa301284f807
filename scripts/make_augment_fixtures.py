"""Generate committed numeric oracles for the augmentation pipeline
(`tests/fixtures/augment_oracles.npz`), consumed by
`tests/test_augment_fixtures.py`.

The environment has no sox binary and no network, so literal sox outputs
cannot be produced here. Instead each oracle is an INDEPENDENT
implementation of the same published algorithm the corresponding sox
effect uses (generated once with float64 math and committed):

* band-reject — Kaiser-windowed sinc band-stop via scipy.signal.firwin,
  the same closed-form design sox's `sinc` effect implements (Kaiser
  window, beta from the stop-band attenuation; see sox sinc.c);
* reverb — freeverb (Schroeder/Moorer 8-comb + 4-allpass with the
  canonical tunings), the algorithm sox's `reverb` effect is built on,
  realized through scipy.signal.lfilter direct-form IIR — NOT through the
  block-recurrence fast path the framework uses, so the fixture checks
  that path too;
* pitch — a WSOLA time-stretch + linear resample with sox `tempo`'s
  documented music defaults (segment 82 ms, search 14.68 ms, overlap
  12 ms), the algorithm family behind sox `pitch`. The framework uses a
  phase vocoder, a DIFFERENT stretch algorithm: waveforms cannot match
  sample-wise across the two families, so the tests compare spectral
  properties (realized shift in cents, duration, envelope) of both
  against this oracle and document the deviation.

Run once; outputs are committed. See docs/augmentation_parity.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.signal as sps

SR = 16000


def make_inputs():
    rs = np.random.RandomState(0)
    t = np.arange(8192) / SR
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    harmonic = sum(0.3 / k * np.sin(2 * np.pi * 220 * k * t)
                   for k in range(1, 5))
    speechy = (np.sin(2 * np.pi * 150 * t)
               * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
               + 0.05 * rs.randn(t.size))
    return {'tone': tone, 'harmonic': np.asarray(harmonic),
            'speechy': speechy}


def firwin_bandstop(x, lo, hi, numtaps=1021):
    taps = sps.firwin(numtaps, [lo, hi], fs=SR,
                      window=('kaiser', 12.0), pass_zero='bandstop')
    return sps.fftconvolve(x, taps, mode='same')


_COMBS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
_ALLPASSES = (556, 441, 341, 225)


def freeverb_lfilter(x, reverberance, hf_damping, room):
    """Freeverb through scipy.lfilter direct-form IIR (float64)."""
    feedback = 0.28 + 0.7 * (room / 100.0)
    damping = hf_damping / 100.0 * 0.4 + 0.2
    wet = np.zeros_like(x)
    for d in _COMBS:
        b = np.zeros(d + 1)
        b[d] = 1.0
        a = np.zeros(d + 2)
        a[0] = 1.0
        a[d] = -feedback * (1 - damping)
        a[d + 1] = -feedback * damping
        wet += sps.lfilter(b, a, x)
    wet /= len(_COMBS)
    for d in _ALLPASSES:
        b = np.zeros(d + 1)
        b[0], b[d] = -0.5, 1.0
        a = np.zeros(d + 1)
        a[0], a[d] = 1.0, -0.5
        wet = sps.lfilter(b, a, wet)
    mix = reverberance / 100.0
    return (1 - mix * 0.5) * x + mix * 0.5 * wet


def wsola_stretch(x, out_len, segment_ms=82.0, search_ms=14.68,
                  overlap_ms=12.0):
    """WSOLA time-stretch of x to out_len samples (sox tempo's documented
    music defaults).

    Deliberately a DIFFERENT synthesis formulation from the framework's
    `_wsola_stretch` (which writes segments sequentially and crossfades in
    place): here every selected segment is accumulated under a trapezoid
    window and the output is normalized by the summed window weight. For
    unity-gain crossfades the two formulations are mathematically
    identical, so a synthesis bug in either one (e.g. double-counting an
    overlap) shows up as a fixture mismatch instead of cancelling out.
    """
    seg = int(segment_ms * SR / 1000)
    ovr = int(overlap_ms * SR / 1000)
    search = int(search_ms * SR / 1000)
    hop = seg - ovr
    f = len(x) / float(out_len)

    # trapezoid synthesis window: ramp up over ovr, flat, ramp down over ovr;
    # the first segment starts flat (nothing before it to crossfade with)
    win = np.ones(seg)
    win[:ovr] = np.linspace(0.0, 1.0, ovr)
    win[seg - ovr:] = 1.0 - np.linspace(0.0, 1.0, ovr)
    win_first = np.ones(seg)
    win_first[seg - ovr:] = win[seg - ovr:]

    acc = np.zeros(out_len + 2 * seg)
    wsum = np.zeros(out_len + 2 * seg)

    pos_out = 0
    prev_tail = None
    while pos_out < out_len:
        target = int(round(pos_out * f))
        if target + seg > len(x):
            chunk = np.zeros(seg)
            avail = x[target:]
            chunk[:len(avail)] = avail
        elif prev_tail is None:
            chunk = x[target:target + seg]
        else:
            lo = max(0, target - search)
            hi = min(len(x) - seg, target + search)
            if hi <= lo:
                best = max(0, min(target, len(x) - seg))
            else:
                # best overlap alignment by cross-correlation against the
                # natural continuation of the previous segment
                n_cand = hi - lo + 1
                windows = np.lib.stride_tricks.sliding_window_view(
                    x[lo:hi + ovr], ovr)[:n_cand]
                best = lo + int(np.argmax(windows @ prev_tail))
            chunk = x[best:best + seg]
        w = win_first if prev_tail is None else win
        acc[pos_out:pos_out + seg] += w * chunk
        wsum[pos_out:pos_out + seg] += w
        prev_tail = chunk[-ovr:]
        pos_out += hop
    out = acc / np.maximum(wsum, 1e-12)
    return out[:out_len]


def wsola_pitch_shift(x, cents):
    """Pitch shift keeping duration: WSOLA stretch to w*factor, linear
    resample back to w (the same post-step the framework uses)."""
    factor = 2.0 ** (cents / 1200.0)
    w = len(x)
    stretched = wsola_stretch(x, int(round(w * factor)))
    src = np.linspace(0, 1, num=len(stretched), endpoint=False)
    dst = np.linspace(0, 1, num=w, endpoint=False)
    return np.interp(dst, src, stretched)


def main():
    inputs = make_inputs()
    out = {}
    for name, x in inputs.items():
        out[f'in_{name}'] = x.astype(np.float32)

    bands = [(400.0, 900.0), (1500.0, 3200.0), (150.0, 700.0)]
    for i, (lo, hi) in enumerate(bands):
        out[f'band_{i}_lo'] = np.float32(lo)
        out[f'band_{i}_hi'] = np.float32(hi)
        for name, x in inputs.items():
            out[f'bandstop_{i}_{name}'] = firwin_bandstop(
                x, lo, hi).astype(np.float32)

    rooms = [0.0, 37.0, 99.0]
    for i, room in enumerate(rooms):
        out[f'room_{i}'] = np.float32(room)
        for name, x in inputs.items():
            out[f'freeverb_{i}_{name}'] = freeverb_lfilter(
                x, 100.0, 100.0, room).astype(np.float32)
            out[f'freeverb50_{i}_{name}'] = freeverb_lfilter(
                x, 50.0, 50.0, room).astype(np.float32)

    cents_list = [-300.0, -150.0, 150.0, 300.0]
    for i, cents in enumerate(cents_list):
        out[f'cents_{i}'] = np.float32(cents)
        for name, x in inputs.items():
            out[f'wsola_{i}_{name}'] = wsola_pitch_shift(
                x, cents).astype(np.float32)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'fixtures',
        'augment_oracles.npz')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, "
          f"{len(out)} arrays)")


if __name__ == '__main__':
    main()
