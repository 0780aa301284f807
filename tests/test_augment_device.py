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
        ref = ha.pitch_shift(x[None], cents, algo='vocoder')[0]
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

    def test_large_shift_max_budget(self):
        """--shift_max beyond the old 400-cent static budget: the frame
        budget now derives from shift_max, so an 800-cent shift lands on
        the right frequency instead of silently truncating."""
        cents = 700.0
        x = _tone(440, w=16384)
        max_factor = 2.0 ** (800.0 / 1200.0)
        y = np.asarray(ad._pitch_one(jnp.asarray(x), jnp.float32(cents),
                                     max_factor))
        assert np.isfinite(y).all()
        f = _dominant_freq(y)
        assert abs(f - 440 * 2 ** (cents / 1200.0)) < 30, f
        # host reference on the same shift agrees
        ref = ha.pitch_shift(x[None], cents, algo='vocoder')[0]
        err = np.abs(y - ref).max()
        assert err < 0.05 * np.abs(ref).max(), err


class TestPitchQuick:
    """`pitch_quick`/`pitch_dropout` must run the host's QUICK resample
    (sox `rate -q` semantics), not the phase vocoder — the two produce
    different training distributions."""

    @pytest.mark.parametrize('cents', [-300.0, -137.0, -1.0, 1.0, 55.0,
                                       299.0])
    def test_matches_host_quick_branch(self, cents):
        x = _tone(440, w=4160)
        ref = ha.pitch_shift(x[None], cents, quick=True,
                             algo='vocoder')[0]
        got = np.asarray(ad._pitch_quick_one(
            jnp.asarray(x), jnp.float32(cents), 2.0 ** (300.0 / 1200.0)))
        err = np.abs(got - ref).max()
        # identical math, f32 positions vs the host's f64 np.interp
        assert err < 2e-3 * max(np.abs(ref).max(), 1e-6), (cents, err)

    def test_zero_cents_identity(self):
        x = _tone(300, w=4096)
        got = np.asarray(ad._pitch_quick_one(jnp.asarray(x),
                                             jnp.float32(0.0),
                                             2.0 ** (300.0 / 1200.0)))
        np.testing.assert_array_equal(got, x)

    def test_factory_dispatch_under_each_algo(self, monkeypatch):
        """Default pitch_algo='wsola': EVERY pitch stage runs the WSOLA
        stretch (sox `pitch` is WSOLA in all the reference chains — the
        quick variants only degrade the resample). Legacy 'vocoder' keeps
        round 3's mapping: lone 'pitch' -> vocoder, quick names and the
        host CombinedTransforms contagion (augmentation.py:582-584) ->
        quick linear stretch."""
        import cpc2_tpu.data.augment_device as adm
        tags = []
        for name, tag in (('pitch_quick', 'quick'), ('pitch', 'vocoder'),
                          ('pitch_wsola', 'wsola')):
            monkeypatch.setattr(
                adm, name,
                lambda x, key, shift_max=300, t=tag: tags.append(t) or x)
        x = jnp.zeros((2, 4160), jnp.float32)
        cases = (
            (['pitch'], 'wsola', ['wsola']),
            (['pitch_quick'], 'wsola', ['wsola']),
            (['pitch', 'pitch_quick'], 'wsola', ['wsola', 'wsola']),
            (['pitch'], 'vocoder', ['vocoder']),
            (['pitch_quick'], 'vocoder', ['quick']),
            (['pitch', 'pitch_quick'], 'vocoder', ['quick', 'quick']),
        )
        for names, algo, expect in cases:
            tags.clear()
            fn = adm.make_device_augment(names, pitch_algo=algo)
            fn(x, jax.random.PRNGKey(0))
            assert tags == expect, (names, algo, tags)

    def test_pitch_dropout_stage_per_algo(self, monkeypatch):
        """pitch_dropout's pitch stage: WSOLA stretch by default (the
        reference chain `pitch ... rate -q` is WSOLA + quick RESAMPLE),
        quick linear stretch under the legacy vocoder algo."""
        import cpc2_tpu.data.augment_device as adm
        used = []
        real_quick, real_wsola = adm.pitch_quick, adm.pitch_wsola
        monkeypatch.setattr(
            adm, 'pitch_quick',
            lambda *a, **k: used.append('quick') or real_quick(*a, **k))
        monkeypatch.setattr(
            adm, 'pitch_wsola',
            lambda *a, **k: used.append('wsola') or real_wsola(*a, **k))
        x = jnp.asarray(np.stack([_tone(440, w=4160), _tone(660, w=4160)]))
        y = adm.pitch_dropout(x, jax.random.PRNGKey(0))
        assert y.shape == x.shape
        assert used == ['wsola']
        used.clear()
        adm.pitch_dropout(x, jax.random.PRNGKey(0), pitch_algo='vocoder')
        assert used == ['quick']


class TestSimpleAugs:

    def test_gaussian_noise_matches_host_formula(self):
        """Host `RandomAdditiveNoiseAugment`: noise std = x.std / 10^(snr/10)
        per window (augmentation.py:338-347) — scale-covariant, unlike an
        absolute-amplitude draw."""
        loud = _tone(440)
        quiet = (0.01 * loud).astype(np.float32)
        x = jnp.asarray(np.stack([loud, quiet]))
        y = ad.gaussian_noise(x, jax.random.PRNGKey(0), snr=15.0)
        noise = np.asarray(y - x)
        for row_x, row_n in zip(np.asarray(x), noise):
            expected = row_x.std() / 10 ** (15.0 / 10.0)
            assert abs(row_n.std() - expected) < 0.05 * expected

    def test_gaussian_noise_tracks_host_class(self):
        """Distribution match with the host implementation on the same
        window: noise powers agree within sampling error."""
        x = _tone(440)
        host = ha.RandomAdditiveNoiseAugment(snr=15.0)
        host_noise = host(x[None]) - x[None]
        dev_noise = np.asarray(
            ad.gaussian_noise(jnp.asarray(x[None]), jax.random.PRNGKey(3),
                              snr=15.0)) - x[None]
        assert abs(host_noise.std() - dev_noise.std()) \
            < 0.1 * host_noise.std()

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

    def test_hybrid_device_host_split(self, tmp_path, monkeypatch):
        """--augment_on_device with a mixed type list: device-ported types
        run on the chip, the remainder falls back to the host pipeline
        (previously any unsupported type crashed at startup). Every CLI
        type is device-ported now, so the fallback is exercised by
        shrinking DEVICE_AUGMENTATIONS for the test. Host types must be
        listed before device types (the split composes host first; other
        orders are rejected, see test_hybrid_split_rejects_reorder)."""
        import json
        from cpc2_tpu import train
        from cpc2_tpu.data import augment_device
        from cpc2_tpu.data.audio_io import save_wav
        monkeypatch.setattr(
            augment_device, 'DEVICE_AUGMENTATIONS',
            tuple(t for t in augment_device.DEVICE_AUGMENTATIONS
                  if t != 'artificial_reverb'))
        root = tmp_path / 'db'
        rs = np.random.RandomState(1)
        d = root / 's1' / 'c1'
        d.mkdir(parents=True)
        for i in range(3):
            n = 30000
            t = np.arange(n) / 16000.0
            x = (0.3 * np.sin(2 * np.pi * (150 + 70 * i) * t)
                 + 0.05 * rs.randn(n)).astype(np.float32)
            save_wav(str(d / f's1-{i}.wav'), x, 16000)
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
                    '--augment_type', 'artificial_reverb', 'time_dropout'])
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        assert np.isfinite(np.asarray(logs['locLoss_train'])).all()

    def test_hybrid_split_rejects_reorder(self, tmp_path, monkeypatch):
        """A device type listed BEFORE a host type cannot be honored by the
        host-first hybrid split (the reference applies --augment_type in
        listed order), so the CLI rejects it instead of silently training
        on a reordered composition."""
        import pytest
        from cpc2_tpu import train
        from cpc2_tpu.data import augment_device
        from cpc2_tpu.data.audio_io import save_wav
        monkeypatch.setattr(
            augment_device, 'DEVICE_AUGMENTATIONS',
            tuple(t for t in augment_device.DEVICE_AUGMENTATIONS
                  if t != 'artificial_reverb'))
        root = tmp_path / 'db'
        d = root / 's1' / 'c1'
        d.mkdir(parents=True)
        rs = np.random.RandomState(1)
        x = (0.1 * rs.randn(30000)).astype(np.float32)
        save_wav(str(d / 's1-0.wav'), x, 16000)
        with pytest.raises(ValueError, match='reorder'):
            train.main(['--pathDB', str(root), '--file_extension', '.wav',
                        '--pathCheckpoint', str(tmp_path / 'ck'),
                        '--hiddenEncoder', '16', '--hiddenGar', '16',
                        '--nPredicts', '2', '--negativeSamplingExt', '4',
                        '--sizeWindow', '4160', '--nGPU', '1',
                        '--batchSizeGPU', '2', '--rnnMode', 'linear',
                        '--arMode', 'GRU', '--samplingType', 'uniform',
                        '--nEpoch', '1',
                        '--augment_past', '--augment_on_device',
                        '--augment_type', 'time_dropout',
                        'artificial_reverb'])

    def test_none_entries_do_not_trip_the_split(self, tmp_path):
        """'none' entries are no-ops: they must neither count as host-side
        types for the reorder check nor reach the host factory (which
        rejects a bare ['none'] list in the reference)."""
        import json
        from cpc2_tpu import train
        from cpc2_tpu.data.audio_io import save_wav
        root = tmp_path / 'db'
        d = root / 's1' / 'c1'
        d.mkdir(parents=True)
        rs = np.random.RandomState(2)
        for i in range(2):
            x = (0.1 * rs.randn(30000)).astype(np.float32)
            save_wav(str(d / f's1-{i}.wav'), x, 16000)
        ckpt = tmp_path / 'ck'
        train.main(['--pathDB', str(root), '--file_extension', '.wav',
                    '--pathCheckpoint', str(ckpt),
                    '--hiddenEncoder', '16', '--hiddenGar', '16',
                    '--nPredicts', '2', '--negativeSamplingExt', '4',
                    '--sizeWindow', '4160', '--nGPU', '1',
                    '--batchSizeGPU', '2', '--rnnMode', 'linear',
                    '--arMode', 'GRU', '--samplingType', 'uniform',
                    '--nEpoch', '1', '--save_step', '1',
                    '--logging_step', '10',
                    '--augment_past', '--augment_on_device',
                    '--augment_type', 'time_dropout', 'none'])
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        assert np.isfinite(np.asarray(logs['locLoss_train'])).all()


class TestDeviceReverb:

    def test_block_recurrence_matches_lfilter(self):
        """The O(W) block recurrences reproduce scipy.lfilter for the
        freeverb comb and allpass filters."""
        import scipy.signal as sps
        rs = np.random.RandomState(0)
        x = rs.randn(5000)
        d, c1, c2 = 1116, 0.5, 0.2
        b = np.zeros(d + 1); b[d] = 1.0
        a = np.zeros(d + 2); a[0], a[d], a[d + 1] = 1.0, -c1, -c2
        np.testing.assert_allclose(ad._comb_np(x, d, c1, c2),
                                   sps.lfilter(b, a, x), atol=1e-9)
        d = 556
        b = np.zeros(d + 1); b[0], b[d] = -0.5, 1.0
        a = np.zeros(d + 1); a[0], a[d] = 1.0, -0.5
        np.testing.assert_allclose(ad._allpass_np(x, d),
                                   sps.lfilter(b, a, x), atol=1e-9)

    def test_ir_conv_matches_host_freeverb(self):
        """Fixed room: IR-bank convolution == the host's direct freeverb
        filter chain (augmentation.py:_freeverb)."""
        x = _tone(300, w=6000)
        for room in (0.0, 37.0, 99.0):
            host = ha._freeverb(x.astype(np.float64), 100.0, 100.0, room)
            ir = ad._freeverb_ir(room, 100.0, 100.0, 6000)
            got = np.asarray(ad._fft_conv_crop(jnp.asarray(x[None]),
                                               jnp.asarray(ir[None])))[0]
            scale = np.abs(host).max()
            assert np.abs(got - host).max() < 2e-3 * scale, room

    def test_artificial_reverb_batch(self):
        x = jnp.asarray(np.stack([_tone(300, w=4096), _tone(500, w=4096)]))
        y = ad.artificial_reverb(x, jax.random.PRNGKey(0))
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
        # reverb adds a decaying tail: output differs from input
        assert np.abs(np.asarray(y) - np.asarray(x)).max() > 1e-3

    def test_reverb_dropout_batch(self):
        x = jnp.asarray(np.stack([_tone(300, w=4096)] * 2))
        y = ad.artificial_reverb_dropout(x, jax.random.PRNGKey(1), t_ms=50)
        assert np.isfinite(np.asarray(y)).all()


class TestDeviceNaturalReverb:

    def test_matches_host_apply_ir(self, tmp_path):
        from cpc2_tpu.data.audio_io import save_wav
        # one IR -> the device draw is deterministic
        ir = np.zeros(800, np.float32)
        ir[0], ir[400] = 1.0, 0.5
        d = tmp_path / 'irs'
        d.mkdir()
        save_wav(str(d / 'ir0.wav'), ir, 16000)
        x = _tone(440, w=4096)
        apply = ad.make_natural_reverb(str(d), p=1.0)
        got = np.asarray(apply(jnp.asarray(x[None]),
                               jax.random.PRNGKey(0)))[0]
        host = ha.NaturalReverb.__new__(ha.NaturalReverb)
        ref = host._apply_ir(x[None], ir)[0]
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_probability_zero_is_peak_norm(self, tmp_path):
        from cpc2_tpu.data.audio_io import save_wav
        ir = np.zeros(100, np.float32); ir[0] = 1.0
        d = tmp_path / 'irs'; d.mkdir()
        save_wav(str(d / 'ir0.wav'), ir, 16000)
        x = 0.25 * _tone(440, w=2048)
        apply = ad.make_natural_reverb(str(d), p=0.0)
        got = np.asarray(apply(jnp.asarray(x[None]),
                               jax.random.PRNGKey(3)))[0]
        # host peak-normalizes even when the IR is not applied
        np.testing.assert_allclose(got, x / (np.abs(x).max() + 1e-8),
                                   atol=1e-5)


class TestDeviceAdditiveNoise:

    def _noise_dataset(self, tmp_path):
        from cpc2_tpu.data.audio_io import save_wav
        from cpc2_tpu.data.corpus import findAllSeqs
        from cpc2_tpu.data.dataset import AudioBatchData
        root = tmp_path / 'noise'
        (root / 'n').mkdir(parents=True)
        rs = np.random.RandomState(7)
        for i in range(2):
            save_wav(str(root / 'n' / f'n{i}.wav'),
                     (0.1 * rs.randn(20000)).astype(np.float32), 16000)
        seqs, spk = findAllSeqs(str(root), extension='.wav',
                                loadCache=False, speaker_level=0)
        return AudioBatchData(str(root), 4096, seqs, None, max(len(spk), 1))

    def test_mix_formula(self, tmp_path):
        ds = self._noise_dataset(tmp_path)
        apply = ad.make_additive_noise(ds, snr_min=10.0, snr_max=10.0,
                                       batch_size=4, pool_size=8)
        x = _tone(440, w=4096)
        y = np.asarray(apply(jnp.asarray(x[None]), jax.random.PRNGKey(0)))
        assert np.isfinite(y).all()
        # host formula output is peak-normalized
        assert abs(np.abs(y).max() - 1.0) < 1e-3
        # at a very high SNR the mix degenerates to peak(energy_norm(x))
        quiet = ad.make_additive_noise(ds, snr_min=80.0, snr_max=80.0,
                                       batch_size=4, pool_size=8)
        yq = np.asarray(quiet(jnp.asarray(x[None]),
                              jax.random.PRNGKey(0)))[0]
        xe = x / (np.sqrt(np.mean(x ** 2)) + 1e-8)
        ref = xe / (np.abs(xe).max() + 1e-8)
        np.testing.assert_allclose(yq, ref, atol=2e-3)

    def test_factory_requires_resources(self):
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            ad.make_device_augment(['additive'])
        with _pytest.raises(RuntimeError):
            ad.make_device_augment(['natural_reverb'])

    def test_temporal_sampling_reaches_pool_loader(self, tmp_path):
        """--temporal_additive_noise must change how the device noise pool
        is drawn (host factory maps the flag to the temporalsamespeaker
        sampler, augmentation.py:557); the factory plumbs it through as
        noise_sampling."""
        ds = self._noise_dataset(tmp_path)
        seen = []
        orig = ds.getDataLoader

        def spy(batch_size, sampling, *a, **kw):
            seen.append((sampling, kw.get('remove_artefacts')))
            return orig(batch_size, sampling, *a, **kw)

        ds.getDataLoader = spy
        fn = ad.make_device_augment(['additive'], noise_dataset=ds,
                                    batch_size=4,
                                    noise_sampling='temporalsamespeaker')
        assert fn is not None
        assert seen == [('temporalsamespeaker', True)]
        seen.clear()
        ad.make_device_augment(['additive'], noise_dataset=ds, batch_size=4)
        assert seen == [('uniform', False)]
