"""Device-side augmentation (`data/augment_device.py`) vs the host
pipeline (`data/augmentation.py`).

The device versions are vectorized re-implementations of the SAME
algorithms (Kaiser-sinc band-stop, phase-vocoder pitch), so they are held
to numeric agreement with the host on fixed parameters, plus the host
suite's DSP property checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc2_tpu.data import augment_device as ad
from cpc2_tpu.data import augmentation as ha


def _tone(freq, w=20480, sr=16000.0, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(w) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)
            + 0.01 * rs.randn(w)).astype(np.float32)


def _dominant_freq(x, sr=16000.0):
    spec = np.abs(np.fft.rfft(np.asarray(x, np.float64)))
    spec[:5] = 0
    return np.argmax(spec) * sr / len(x)


class TestBandreject:

    def test_taps_match_scipy_firwin(self):
        import scipy.signal as sps
        for lo, hi in [(400.0, 900.0), (1500.0, 3200.0), (60.0, 120.0)]:
            ours = np.asarray(ad._bandstop_taps(jnp.float32(lo),
                                                jnp.float32(hi)))
            ref = sps.firwin(ad._BR_TAPS, [lo, hi], fs=16000,
                             window=('kaiser', 12.0), pass_zero='bandstop')
            np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_filtered_signal_matches_host_filter(self):
        import scipy.signal as sps
        x = _tone(440) + _tone(2000, seed=1)
        lo, hi = 1500.0, 2500.0
        taps = sps.firwin(ad._BR_TAPS, [lo, hi], fs=16000,
                          window=('kaiser', 12.0), pass_zero='bandstop')
        ref = sps.fftconvolve(x[None], taps[None, :], mode='same')[0]
        h = ad._bandstop_taps(jnp.float32(lo), jnp.float32(hi))
        n = x.size + ad._BR_TAPS - 1
        nfft = 1 << (n - 1).bit_length()
        got = np.asarray(jnp.fft.irfft(
            jnp.fft.rfft(jnp.asarray(x), nfft) * jnp.fft.rfft(h, nfft),
            nfft))[(ad._BR_TAPS - 1) // 2:(ad._BR_TAPS - 1) // 2 + x.size]
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_band_removed_property(self):
        """The rejected band loses >= 40 dB while the rest survives."""
        x = jnp.asarray(np.stack([_tone(440), _tone(440, seed=2)]))
        # force a known band through the internals
        lo = jnp.asarray([300.0, 300.0])
        hi = jnp.asarray([600.0, 600.0])
        taps = jax.vmap(ad._bandstop_taps)(lo, hi)
        n = x.shape[1] + ad._BR_TAPS - 1
        nfft = 1 << (n - 1).bit_length()
        y = np.asarray(jnp.fft.irfft(
            jnp.fft.rfft(x, nfft) * jnp.fft.rfft(taps, nfft),
            nfft)[:, (ad._BR_TAPS - 1) // 2:
                  (ad._BR_TAPS - 1) // 2 + x.shape[1]])
        for row in y:
            spec = np.abs(np.fft.rfft(row))
            freqs = np.fft.rfftfreq(len(row), 1 / 16000.0)
            in_band = spec[(freqs > 400) & (freqs < 500)].max()
            out_band = spec[(freqs > 1000) & (freqs < 2000)].max()
            assert in_band < 1e-2 * np.abs(np.fft.rfft(np.asarray(x)[0]))[
                (freqs > 400) & (freqs < 500)].max()
            assert out_band > 0  # sanity

    def test_batch_api_shapes_and_degenerate(self):
        x = jnp.asarray(np.stack([_tone(440), _tone(880)]))
        y = ad.bandreject(x, jax.random.PRNGKey(0))
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


class TestPitch:

    @pytest.mark.parametrize('cents', [-300.0, -120.0, 150.0, 299.0])
    def test_matches_host_vocoder(self, cents):
        x = _tone(440, w=8192)
        ref = ha.pitch_shift(x[None], cents)[0]
        got = np.asarray(ad._pitch_one(jnp.asarray(x),
                                       jnp.float32(cents)))
        # same algorithm, float32 fft vs float64 numpy: allow small error
        err = np.abs(got - ref).max()
        scale = np.abs(ref).max()
        assert err < 0.02 * scale, (cents, err, scale)

    def test_zero_cents_identity(self):
        x = _tone(300, w=4096)
        got = np.asarray(ad._pitch_one(jnp.asarray(x), jnp.float32(0.4)))
        np.testing.assert_array_equal(got, x)

    def test_spectral_shift_property(self):
        x = jnp.asarray(np.stack([_tone(440, w=16384),
                                  _tone(440, w=16384, seed=3)]))
        cents = 300.0
        y = jax.vmap(ad._pitch_one)(x, jnp.full((2,), cents))
        factor = 2 ** (cents / 1200.0)
        for row in np.asarray(y):
            f = _dominant_freq(row)
            assert abs(f - 440 * factor) < 25, f

    def test_batch_api(self):
        x = jnp.asarray(np.stack([_tone(440), _tone(660)]))
        y = ad.pitch(x, jax.random.PRNGKey(1))
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


class TestSimpleAugs:

    def test_gaussian_noise_snr(self):
        x = jnp.asarray(_tone(440)[None])
        y = ad.gaussian_noise(x, jax.random.PRNGKey(0), snr=15.0)
        noise = np.asarray(y - x)
        alpha = 1.0 / 10 ** (15.0 / 20.0)
        assert abs(noise.std() - alpha) < 0.1 * alpha

    def test_time_dropout_zeroes_span(self):
        x = jnp.ones((4, 20480))
        y = np.asarray(ad.time_dropout(x, jax.random.PRNGKey(2), t_ms=100))
        for row in y:
            zeros = int((row == 0).sum())
            assert zeros <= int(0.1 * 16000)
        assert (y == 0).any()   # some span dropped somewhere


class TestFactory:

    def test_chain_and_unsupported(self):
        fn = ad.make_device_augment(['bandreject', 'random_noise'])
        x = jnp.asarray(np.stack([_tone(440), _tone(880)]))
        y = fn(x, jax.random.PRNGKey(0))
        assert y.shape == x.shape
        assert ad.make_device_augment([]) is None
        with pytest.raises(ValueError):
            ad.make_device_augment(['reverb'])


class TestTrainCLI:

    def test_augment_on_device_e2e(self, tmp_path):
        """Full CLI epoch with --augment_on_device: device chain active,
        host augmentation off, finite losses, checkpoint written."""
        import json
        from cpc2_tpu import train
        from cpc2_tpu.data.audio_io import save_wav
        root = tmp_path / 'db'
        rs = np.random.RandomState(0)
        for spk in ('s1', 's2'):
            d = root / spk / 'c1'
            d.mkdir(parents=True)
            for i in range(2):
                n = 30000
                t = np.arange(n) / 16000.0
                x = (0.3 * np.sin(2 * np.pi * (150 + 70 * i) * t)
                     + 0.05 * rs.randn(n)).astype(np.float32)
                save_wav(str(d / f'{spk}-{i}.wav'), x, 16000)
        ckpt = tmp_path / 'ck'
        train.main(['--pathDB', str(root), '--file_extension', '.wav',
                    '--pathCheckpoint', str(ckpt),
                    '--hiddenEncoder', '16', '--hiddenGar', '16',
                    '--nPredicts', '2', '--negativeSamplingExt', '4',
                    '--sizeWindow', '4160', '--nGPU', '2',
                    '--batchSizeGPU', '2', '--rnnMode', 'linear',
                    '--arMode', 'GRU', '--samplingType', 'uniform',
                    '--nEpoch', '1', '--save_step', '1',
                    '--logging_step', '10',
                    '--augment_past', '--augment_on_device',
                    '--augment_type', 'bandreject', 'time_dropout'])
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        losses = np.asarray(logs['locLoss_train'])
        assert np.isfinite(losses).all()

    def test_unsupported_type_raises(self, tmp_path):
        from cpc2_tpu import train
        with pytest.raises(ValueError):
            train.main(['--pathDB', str(tmp_path),
                        '--augment_past', '--augment_on_device',
                        '--augment_type', 'artificial_reverb'])
