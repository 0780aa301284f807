"""Host-side audio IO with no external dependencies.

The reference reads audio via torchaudio/sox (C++ under the hood). Here:

* WAV (PCM 8/16/24/32-bit and float32/64) is parsed directly with numpy —
  a single `np.frombuffer` per file, faster than generic decoders for the
  16-bit LibriSpeech-style corpora this framework targets;
* FLAC is decoded by the bundled C++ decoder (`csrc/flacdec.cc`) through
  ctypes when the shared library is built, mirroring the reference's use of
  native decoders for the hot data path.

All loaders return (waveform float32 in [-1, 1] shaped (T,), sample_rate);
multi-channel audio is averaged to mono like `cpc/dataset.py:425`.
"""

from __future__ import annotations

import os
import struct
from typing import Tuple

import numpy as np


class AudioFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def _parse_wav_header(data: bytes):
    if len(data) < 44 or data[:4] != b'RIFF' or data[8:12] != b'WAVE':
        raise AudioFormatError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack('<I', data[pos + 4:pos + 8])[0]
        body = pos + 8
        if cid == b'fmt ':
            (audio_fmt, n_ch, sr, _br, _ba, bits) = struct.unpack(
                '<HHIIHH', data[body:body + 16])
            fmt = (audio_fmt, n_ch, sr, bits)
        elif cid == b'data':
            if fmt is None:
                raise AudioFormatError("data chunk before fmt chunk")
            return fmt, body, size
        pos = body + size + (size & 1)
    raise AudioFormatError("no data chunk found")


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    with open(path, 'rb') as f:
        data = f.read()
    (audio_fmt, n_ch, sr, bits), off, size = _parse_wav_header(data)
    raw = data[off:off + size]
    if audio_fmt in (1, 0xFFFE):  # PCM / extensible
        if bits == 16:
            x = np.frombuffer(raw, '<i2').astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, '<i4').astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(raw, 'u1').astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(raw, 'u1').reshape(-1, 3)
            x = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x)
            x = x.astype(np.float32) / float(1 << 23)
        else:
            raise AudioFormatError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        dt = '<f4' if bits == 32 else '<f8'
        x = np.frombuffer(raw, dt).astype(np.float32)
    else:
        raise AudioFormatError(f"unsupported WAV format code {audio_fmt}")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, sr


def wav_info(path: str) -> Tuple[int, int]:
    """(num_frames, sample_rate) from the header only."""
    with open(path, 'rb') as f:
        data = f.read(65536)
    (audio_fmt, n_ch, sr, bits), _off, size = _parse_wav_header(data)
    bytes_per = (bits // 8) * n_ch
    return size // bytes_per, sr


def save_wav(path: str, x: np.ndarray, sample_rate: int) -> None:
    """Write mono/multi-channel PCM16 WAV."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    elif x.ndim == 2 and x.shape[0] < x.shape[1]:
        x = x.T  # (C, T) -> (T, C)
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype('<i2')
    n_ch = pcm.shape[1]
    data = pcm.tobytes()
    with open(path, 'wb') as f:
        f.write(b'RIFF')
        f.write(struct.pack('<I', 36 + len(data)))
        f.write(b'WAVEfmt ')
        f.write(struct.pack('<IHHIIHH', 16, 1, n_ch, sample_rate,
                            sample_rate * n_ch * 2, n_ch * 2, 16))
        f.write(b'data')
        f.write(struct.pack('<I', len(data)))
        f.write(data)


# ---------------------------------------------------------------------------
# FLAC (native decoder, see csrc/flacdec.cc)
# ---------------------------------------------------------------------------

_flac_lib = None
_flac_checked = False


def _maybe_build_native(lib_path: str, src_name: str) -> None:
    """(Re)build a native decoder from csrc/ when it is missing or older
    than its source. The .so files are deliberately not version-controlled
    — they are produced by `make -C csrc` / `python setup.py build`."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(os.path.dirname(here), 'csrc', src_name)
    if not os.path.exists(src):
        return
    if (os.path.exists(lib_path)
            and os.path.getmtime(lib_path) >= os.path.getmtime(src)):
        return
    import subprocess
    try:
        subprocess.run(['make', '-C', os.path.dirname(src)],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        pass  # fall through: caller reports a clear "not built" error


def _get_flac_lib():
    global _flac_lib, _flac_checked
    if _flac_checked:
        return _flac_lib
    _flac_checked = True
    import ctypes
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _maybe_build_native(os.path.join(here, 'ops', 'libflacdec.so'),
                        'flacdec.cc')
    for cand in (os.path.join(here, 'ops', 'libflacdec.so'),
                 os.path.join(os.path.dirname(here), 'csrc', 'build',
                              'libflacdec.so')):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.flac_decode_file.restype = ctypes.c_longlong
            lib.flac_decode_file.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.flac_info_file.restype = ctypes.c_longlong
            lib.flac_info_file.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            _flac_lib = lib
            break
    return _flac_lib


def load_flac(path: str) -> Tuple[np.ndarray, int]:
    import ctypes
    lib = _get_flac_lib()
    if lib is None:
        raise AudioFormatError(
            "FLAC decoder library not built; run `make -C csrc` or use WAV")
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.flac_info_file(path.encode(), ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        raise AudioFormatError(f"cannot parse FLAC file {path} (err {n})")
    buf = np.empty(int(n) * max(ch.value, 1), dtype=np.float32)
    got = lib.flac_decode_file(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, ctypes.byref(sr), ctypes.byref(ch))
    if got < 0:
        raise AudioFormatError(f"FLAC decode failed for {path} (err {got})")
    x = buf[:int(got) * ch.value]
    if ch.value > 1:
        x = x.reshape(-1, ch.value).mean(axis=1)
    return x, sr.value


def flac_info(path: str) -> Tuple[int, int]:
    import ctypes
    lib = _get_flac_lib()
    if lib is None:
        raise AudioFormatError("FLAC decoder library not built")
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.flac_info_file(path.encode(), ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        raise AudioFormatError(f"cannot parse FLAC header of {path}")
    return int(n), sr.value


# ---------------------------------------------------------------------------
# mp3 / other compressed formats (csrc/audiodec.cc, libavformat-backed)
# ---------------------------------------------------------------------------

_audec_lib = None
_audec_checked = False


def _get_audec_lib():
    """ctypes handle to the FFmpeg-backed decoder shim, or None when it
    is not built (no FFmpeg dev libraries on this machine — the Makefile
    skips it and callers raise a clear conversion hint instead)."""
    global _audec_lib, _audec_checked
    if _audec_checked:
        return _audec_lib
    _audec_checked = True
    import ctypes
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lib_path = os.path.join(here, 'ops', 'libaudiodec.so')
    _maybe_build_native(lib_path, 'audiodec.cc')
    if not os.path.exists(lib_path):
        return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None  # e.g. libavformat runtime missing
    lib.audec_decode_file.restype = ctypes.c_longlong
    lib.audec_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.audec_free.restype = None
    lib.audec_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.audec_info_file.restype = ctypes.c_longlong
    lib.audec_info_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    _audec_lib = lib
    return lib


def load_compressed(path: str) -> Tuple[np.ndarray, int]:
    """Decode mp3 (or any other container/codec the system FFmpeg
    libraries know) via the native shim. Mono-averaged like the other
    loaders."""
    import ctypes
    lib = _get_audec_lib()
    if lib is None:
        raise AudioFormatError(f"{path}: {_MP3_HELP}")
    out = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.audec_decode_file(str(path).encode(), ctypes.byref(out),
                              ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        raise AudioFormatError(f"cannot decode {path} (audiodec err {n})")
    try:
        x = np.ctypeslib.as_array(out, shape=(int(n) * ch.value,)).copy()
    finally:
        lib.audec_free(out)
    if ch.value > 1:
        x = x.reshape(-1, ch.value).mean(axis=1)
    return x, sr.value


def compressed_info(path: str) -> Tuple[int, int]:
    """(estimated num_frames, sample_rate) from container metadata only.

    For CBR mp3 without a Xing header the duration is bitrate-derived and
    can be off by a frame; the data layer only uses this for pack-size
    budgeting (`dataset.py:204-216`), mirroring the reference's use of
    torchaudio.info on mp3."""
    import ctypes
    lib = _get_audec_lib()
    if lib is None:
        raise AudioFormatError(f"{path}: {_MP3_HELP}")
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.audec_info_file(str(path).encode(), ctypes.byref(sr),
                            ctypes.byref(ch))
    if n < 0:
        raise AudioFormatError(f"cannot parse {path} (audiodec err {n})")
    return int(n), sr.value


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

_MP3_HELP = (
    "mp3 decoding needs the native FFmpeg-backed shim "
    "(csrc/audiodec.cc), which requires the libavformat/libavcodec dev "
    "libraries at build time; they are missing here. Convert first, "
    "e.g.: ffmpeg -i in.mp3 -ar 16000 -ac 1 out.wav")

# Extensions routed through the FFmpeg-backed shim. WAV and FLAC keep
# their dedicated fast paths below.
_COMPRESSED_EXTS = frozenset(
    ('.mp3', '.ogg', '.opus', '.m4a', '.aac', '.wma', '.mp4', '.webm'))


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    ext = os.path.splitext(str(path))[1].lower()
    if ext == '.flac':
        return load_flac(str(path))
    if ext in _COMPRESSED_EXTS:
        return load_compressed(str(path))
    return load_wav(str(path))


def save_audio(path: str, x: np.ndarray, sample_rate: int) -> None:
    ext = os.path.splitext(str(path))[1].lower()
    if ext != '.wav':
        raise AudioFormatError("only WAV writing is supported")
    save_wav(str(path), x, sample_rate)


def audio_info(path: str) -> Tuple[int, int]:
    """(num_frames, sample_rate) without decoding the samples. For
    compressed formats the count is the container's duration estimate."""
    ext = os.path.splitext(str(path))[1].lower()
    if ext == '.flac':
        return flac_info(str(path))
    if ext in _COMPRESSED_EXTS:
        return compressed_info(str(path))
    return wav_info(str(path))
