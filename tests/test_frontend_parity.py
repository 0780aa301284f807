"""Numeric certification of the MFCC and LFB front-end encoders
(VERDICT r1 'weak' item: these were compile-tested only).

torchaudio is not installed in this image, so the MFCC oracle is assembled
from independent components implementing torchaudio's documented pipeline
(`torchaudio.transforms.MFCC` with the reference's kwargs,
`/root/reference/cpc/model.py:111-125`):

  * framing/window/FFT via `torch.stft` — the exact C++ kernel
    torchaudio's Spectrogram calls (center=True, reflect pad, periodic
    Hann, power 2);
  * HTK mel filter bank written out from the formula (2595*log10(1+f/700),
    triangular, norm=None);
  * dB conversion per `F.amplitude_to_DB` semantics (multiplier 10,
    amin 1e-10, top_db 80 clamped against the GLOBAL tensor max);
  * DCT-II ortho via `scipy.fft.dct` (independent of the framework's own
    DCT matrix helper).

The LFB oracle is the reference module re-created in pure torch
(`cpc/model.py:128-155` uses only torch core ops) with weights tied to the
flax module.
"""

import math

import numpy as np
import pytest
import torch
from scipy.fft import dct as scipy_dct

import jax


def _torch_power_spectrogram(x, n_fft, hop):
    window = torch.hann_window(n_fft)
    spec = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                      win_length=n_fft, window=window, center=True,
                      pad_mode='reflect', normalized=False, onesided=True,
                      return_complex=True)
    return spec.abs().pow(2.0).numpy()        # (B, n_freq, frames)


def _htk_mel_fbank(n_freqs, n_mels, sample_rate):
    freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)          # noqa: E731
    inv = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)        # noqa: E731
    pts = inv(np.linspace(mel(0.0), mel(sample_rate / 2), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = pts[m], pts[m + 1], pts[m + 2]
        rise = (freqs - lo) / (ctr - lo)
        fall = (hi - freqs) / (hi - ctr)
        fb[:, m] = np.clip(np.minimum(rise, fall), 0.0, None)
    return fb


def _oracle_mfcc(x, n_mfcc, sample_rate=16000, n_fft=321):
    power = _torch_power_spectrogram(x, n_fft, n_fft // 2)
    n_mels = max(128, n_mfcc)
    fb = _htk_mel_fbank(n_fft // 2 + 1, n_mels, sample_rate)
    mel = np.einsum('bft,fm->bmt', power, fb)
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max() - 80.0)       # global max, torchaudio quirk
    mfcc = scipy_dct(db, type=2, norm='ortho', axis=1)[:, :n_mfcc]
    return np.transpose(mfcc, (0, 2, 1))       # (B, frames, n_mfcc)


class TestMFCCParity:

    @pytest.mark.parametrize('dim', [16, 64])
    def test_matches_torchaudio_pipeline(self, dim):
        rs = np.random.RandomState(3)
        x = rs.randn(3, 6400).astype(np.float32) * 0.3

        from cpc2_tpu.models.encoder import MFCCEncoder
        enc = MFCCEncoder(dim_encoded=dim)
        vars_ = enc.init(jax.random.PRNGKey(0), x, train=False)
        ours = np.asarray(enc.apply(vars_, x, train=False))

        want = _oracle_mfcc(x, dim)
        assert ours.shape == want.shape, (ours.shape, want.shape)
        # dB-scale values span ~[-60, 30]; fp32 FFT vs torch stft wobble.
        np.testing.assert_allclose(ours, want, atol=2e-2, rtol=1e-4)

    def test_downsampling_factor(self):
        """160x like the conv encoder: 20480 samples -> 128 frames."""
        from cpc2_tpu.models.encoder import MFCCEncoder
        x = np.zeros((1, 20480), np.float32)
        enc = MFCCEncoder(dim_encoded=16)
        vars_ = enc.init(jax.random.PRNGKey(0), x, train=False)
        out = enc.apply(vars_, x, train=False)
        assert out.shape == (1, 128, 16)


class _TorchLFB(torch.nn.Module):
    """The reference LFBEnconder re-created verbatim-in-semantics from
    `cpc/model.py:128-155` with torch core ops only."""

    def __init__(self, dim, normalize=True):
        super().__init__()
        self.dim = dim
        self.conv = torch.nn.Conv1d(1, 2 * dim, 400, stride=1)
        self.register_buffer('han', torch.hann_window(400).view(1, 1, 400))
        self.norm = torch.nn.InstanceNorm1d(dim, momentum=1) \
            if normalize else None

    def forward(self, x):
        n = x.size(0)
        x = self.conv(x)
        x = x.view(n, self.dim, 2, -1)
        x = x[:, :, 0, :] ** 2 + x[:, :, 1, :] ** 2
        x = x.view(n * self.dim, 1, -1)
        x = torch.nn.functional.conv1d(x, self.han, bias=None, stride=160,
                                       padding=350)
        x = x.view(n, self.dim, -1)
        x = torch.log(1 + torch.abs(x))
        if self.norm is not None:
            x = self.norm(x)
        return x


class TestLFBParity:

    @pytest.mark.parametrize('normalize', [True, False])
    def test_matches_reference_torch_chain(self, normalize):
        dim = 8
        rs = np.random.RandomState(5)
        x = rs.randn(2, 4000).astype(np.float32) * 0.5

        from cpc2_tpu.models.encoder import LFBEncoder
        enc = LFBEncoder(dim_encoded=dim, normalize=normalize)
        vars_ = enc.init(jax.random.PRNGKey(1), x, train=False)

        ref = _TorchLFB(dim, normalize=normalize)
        with torch.no_grad():
            # Flax Conv1d stores the torch layout directly: (C_out, C_in, K)
            w = np.asarray(vars_['params']['conv']['weight'])
            b = np.asarray(vars_['params']['conv']['bias'])
            ref.conv.weight.copy_(torch.from_numpy(w))
            ref.conv.bias.copy_(torch.from_numpy(b))
            want = ref(torch.from_numpy(x)[:, None, :]).numpy()

        ours = np.asarray(enc.apply(vars_, x, train=False))
        # reference layout (B, C, T) vs ours (B, T, C)
        want = np.transpose(want, (0, 2, 1))
        assert ours.shape == want.shape, (ours.shape, want.shape)
        np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-5)
