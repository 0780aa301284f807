"""Waveform augmentation tests: DSP properties of the sox-equivalent
implementations."""

import numpy as np

from cpc2_tpu.data.augmentation import (BandrejectAugment, PitchAugment,
                                        RandomAdditiveNoiseAugment,
                                        ReverbAugment, ReverbDropout,
                                        TimeDropoutAugment, pitch_shift,
                                        energy_normalization,
                                        peak_normalization)


def tone(freq, n=16000, sr=16000.0, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None, :]


def dominant_freq(x, sr=16000.0):
    spec = np.abs(np.fft.rfft(x[0] * np.hanning(x.shape[1])))
    return np.fft.rfftfreq(x.shape[1], 1 / sr)[np.argmax(spec)]


class TestBandreject:

    def test_band_attenuated(self):
        np.random.seed(0)
        x = tone(1000) + tone(3000)
        aug = BandrejectAugment()

        # apply a deterministic band by monkeypatching the mask draw
        class Fixed(BandrejectAugment):
            @staticmethod
            def generate_freq_mask(scaler):
                return 900.0, 1100.0
        y = Fixed()(x)
        spec_x = np.abs(np.fft.rfft(x[0]))
        spec_y = np.abs(np.fft.rfft(y[0]))
        freqs = np.fft.rfftfreq(x.shape[1], 1 / 16000.0)
        in_band = (freqs > 950) & (freqs < 1050)
        out_band = (freqs > 2950) & (freqs < 3050)
        # stop-band heavily attenuated, pass-band roughly intact
        assert spec_y[in_band].max() < 0.01 * spec_x[in_band].max()
        assert spec_y[out_band].max() > 0.5 * spec_x[out_band].max()

    def test_shape_and_dtype(self):
        np.random.seed(0)
        x = tone(500, n=4000)
        y = BandrejectAugment()(x)
        assert y.shape == x.shape and y.dtype == np.float32


class TestPitch:

    def test_pitch_shift_moves_f0(self):
        x = tone(440, n=16000)
        up = pitch_shift(x, +600)   # +6 semitones -> x1.414
        down = pitch_shift(x, -600)
        assert up.shape == x.shape
        f_up = dominant_freq(up)
        f_down = dominant_freq(down)
        assert abs(f_up - 440 * 2 ** 0.5) < 25
        assert abs(f_down - 440 / 2 ** 0.5) < 25

    def test_zero_shift_noop(self):
        x = tone(440, n=4000)
        np.testing.assert_array_equal(pitch_shift(x, 0), x)

    def test_random_range(self):
        np.random.seed(0)
        x = tone(440, n=4000)
        y = PitchAugment(quick=True, shift_max=300)(x)
        assert y.shape == x.shape and np.isfinite(y).all()


class TestReverbAndDropout:

    def test_reverb_preserves_shape(self):
        np.random.seed(0)
        x = tone(440, n=8000)
        y = ReverbAugment()(x)
        assert y.shape == x.shape and np.isfinite(y).all()
        # reverb adds a decaying tail: energy after the source stops
        x2 = x.copy()
        x2[:, 4000:] = 0
        y2 = ReverbAugment()(x2)
        assert np.abs(y2[:, 4200:5000]).max() > 1e-4

    def test_time_dropout_zeroes_span(self):
        np.random.seed(0)
        x = np.ones((1, 16000), np.float32)
        y = TimeDropoutAugment(T_ms=100)(x)
        zeros = int((y == 0).sum())
        assert 0 < zeros <= 1600
        # zeros are contiguous
        idx = np.where(y[0] == 0)[0]
        assert (np.diff(idx) == 1).all()

    def test_reverb_dropout(self):
        np.random.seed(0)
        x = tone(300, n=8000)
        y = ReverbDropout(T_ms=50)(x)
        assert y.shape == x.shape and np.isfinite(y).all()


class TestAdditiveNoise:

    def test_gaussian_noise_snr(self):
        np.random.seed(0)
        x = tone(440, n=32000, amp=1.0)
        aug = RandomAdditiveNoiseAugment(snr=15)
        y = aug(x)
        noise = y - x
        # alpha = snr_linear / x.std(): noise std = x.std() / 10^(1.5)
        expected_std = x.std() / np.exp(15 * np.log(10) / 10)
        assert abs(noise.std() - expected_std) / expected_std < 0.05

    def test_normalizations(self):
        x = np.array([[3.0, -4.0, 0.0]], np.float32)
        e = energy_normalization(x)
        assert abs(np.sqrt((e ** 2).mean()) - 1.0) < 1e-5
        p = peak_normalization(x)
        assert abs(np.abs(p).max() - 1.0) < 1e-5
