"""Tests for the FFmpeg-backed compressed-audio decoder (csrc/audiodec.cc).

The reference reads mp3 through torchaudio/sox for its Common Voices
workflow (`cpc/eval/utils/adjust_sample_rate.py`). No mp3 encoder exists in
this image, so the mp3 fixtures are hand-crafted silent MPEG-2 Layer III
frames (all-zero side info == part2_3_length 0 == silent granule), which
pin the frame geometry (576 samples/frame @ 16 kHz) exactly. Numeric
decode correctness (sample scaling, interleave, downmix) is certified by
pushing WAV files through the same libavformat path and comparing against
the independent numpy WAV parser.
"""

import numpy as np
import pytest

from cpc2_tpu.data import audio_io

pytestmark = pytest.mark.skipif(
    audio_io._get_audec_lib() is None,
    reason="FFmpeg dev libraries not available; audiodec shim not built")


# MPEG-2 Layer III, 16 kHz, 32 kbps: header + empty side info, 144-byte
# frames, 576 samples each.
_MONO_FRAME = bytes([0xFF, 0xF3, 0x48, 0xC0]) + bytes(140)
_STEREO_FRAME = bytes([0xFF, 0xF3, 0x48, 0x00]) + bytes(140)


def _write_mp3(path, frame, n_frames):
    with open(path, 'wb') as f:
        f.write(frame * n_frames)


def test_silent_mp3_mono_exact_geometry(tmp_path):
    p = tmp_path / "silence.mp3"
    _write_mp3(p, _MONO_FRAME, 50)
    x, sr = audio_io.load_audio(str(p))
    assert sr == 16000
    assert x.shape == (576 * 50,)
    assert x.dtype == np.float32
    np.testing.assert_array_equal(x, 0.0)


def test_silent_mp3_stereo_downmixes_to_mono(tmp_path):
    p = tmp_path / "silence2.mp3"
    _write_mp3(p, _STEREO_FRAME, 20)
    x, sr = audio_io.load_audio(str(p))
    assert sr == 16000
    assert x.ndim == 1
    assert x.shape == (576 * 20,)
    np.testing.assert_array_equal(x, 0.0)


def test_mp3_info_matches_decode(tmp_path):
    p = tmp_path / "silence.mp3"
    _write_mp3(p, _MONO_FRAME, 40)
    n, sr = audio_io.audio_info(str(p))
    x, sr2 = audio_io.load_audio(str(p))
    assert sr == sr2 == 16000
    # Container estimate vs decoded length: within one frame.
    assert abs(n - len(x)) <= 576


def test_garbage_mp3_raises(tmp_path):
    p = tmp_path / "junk.mp3"
    p.write_bytes(b"this is not an mpeg stream at all" * 10)
    with pytest.raises(audio_io.AudioFormatError):
        audio_io.load_compressed(str(p))


def test_missing_file_raises(tmp_path):
    with pytest.raises(audio_io.AudioFormatError):
        audio_io.load_compressed(str(tmp_path / "nope.mp3"))


def test_wav_numeric_parity_mono(tmp_path):
    # Same file through libavformat and through the numpy parser: the
    # int16 -> float scaling must agree bit-for-bit.
    rs = np.random.RandomState(7)
    x = np.clip(rs.randn(12345) * 0.2, -1, 1).astype(np.float32)
    p = tmp_path / "tone.wav"
    audio_io.save_wav(str(p), x, 16000)
    ours, sr1 = audio_io.load_wav(str(p))
    ff, sr2 = audio_io.load_compressed(str(p))
    assert sr1 == sr2 == 16000
    np.testing.assert_array_equal(ours, ff)


def test_wav_numeric_parity_stereo_downmix(tmp_path):
    rs = np.random.RandomState(11)
    x = np.clip(rs.randn(5000, 2) * 0.2, -1, 1).astype(np.float32)
    p = tmp_path / "st.wav"
    audio_io.save_wav(str(p), x, 8000)
    ours, _ = audio_io.load_wav(str(p))
    ff, sr = audio_io.load_compressed(str(p))
    assert sr == 8000
    np.testing.assert_allclose(ours, ff, atol=1e-7)


def test_flac_numeric_parity_via_ffmpeg(tmp_path, mini_corpus):
    # Cross-check our from-scratch FLAC decoder against libavcodec's on
    # a file produced by an independent encoder path, when one exists in
    # the corpus fixtures; otherwise encode via the pure-python encoder
    # used by test_flac.
    try:
        from tests.test_flac import encode_flac
    except ImportError:
        pytest.skip("pure-python flac encoder fixture unavailable")
    rs = np.random.RandomState(3)
    pcm = np.clip(rs.randn(9000) * 0.3, -1, 1)
    pcm16 = (pcm * 32767).astype(np.int16)
    p = tmp_path / "x.flac"
    encode_flac(str(p), [pcm16], sr=16000)
    ours, sr1 = audio_io.load_flac(str(p))
    ff, sr2 = audio_io.load_compressed(str(p))
    assert sr1 == sr2 == 16000
    np.testing.assert_allclose(ours, ff, atol=1e-7)


def test_adjust_sample_rate_mp3_end_to_end(tmp_path):
    # The reference's Common Voices workflow: mp3 in, 16 kHz wav out.
    from cpc2_tpu.tools import adjust_sample_rate as asr
    db = tmp_path / "db"
    out = tmp_path / "out"
    db.mkdir()
    _write_mp3(db / "clip_000.mp3", _MONO_FRAME, 25)
    _write_mp3(db / "clip_001.mp3", _MONO_FRAME, 25)
    _write_mp3(db / "clip_skip.mp3", _MONO_FRAME, 25)
    tsv = tmp_path / "phones.txt"
    tsv.write_text("clip_000 a b c\nclip_001 d e\n")
    asr.main([str(db), str(tsv), str(out)])
    produced = sorted(f.name for f in out.iterdir())
    assert produced == ["clip_000.wav", "clip_001.wav"]
    x, sr = audio_io.load_wav(str(out / "clip_000.wav"))
    assert sr == 16000
    assert len(x) == 576 * 25
