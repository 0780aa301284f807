"""Native FLAC decoder tests.

A minimal FLAC *encoder* lives in this test (verbatim, constant and
fixed-order-1 Rice-coded subframes; mono and stereo; 16-bit) so the C++
decoder (`csrc/flacdec.cc`) can be validated against known waveforms without
any external flac binary."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from cpc2_tpu.data import audio_io

LIB = Path(__file__).parent.parent / "cpc2_tpu" / "ops" / "libflacdec.so"


def _ensure_lib():
    if not LIB.exists():
        csrc = Path(__file__).parent.parent / "csrc"
        subprocess.run(["make", "-C", str(csrc)], check=True)
    assert LIB.exists()


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_unary(self, q):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits != 0:
            self.write(0, 1)

    def data(self):
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def utf8_number(n):
    if n < 0x80:
        return bytes([n])
    out = []
    if n < 0x800:
        out = [0xC0 | (n >> 6), 0x80 | (n & 0x3F)]
    elif n < 0x10000:
        out = [0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)]
    else:
        raise ValueError
    return bytes(out)


def encode_subframe_verbatim(bw, samples, bps=16):
    bw.write(0, 1)           # zero pad
    bw.write(0b000001, 6)    # verbatim
    bw.write(0, 1)           # no wasted bits
    for s in samples:
        bw.write(int(s) & ((1 << bps) - 1), bps)


def encode_subframe_constant(bw, value, bps=16):
    bw.write(0, 1)
    bw.write(0b000000, 6)
    bw.write(0, 1)
    bw.write(int(value) & ((1 << bps) - 1), bps)


def encode_subframe_fixed1(bw, samples, bps=16, rice_k=4):
    """FIXED order-1 subframe with a single Rice partition."""
    bw.write(0, 1)
    bw.write(0b001001, 6)    # fixed, order 1
    bw.write(0, 1)           # no wasted bits
    bw.write(int(samples[0]) & ((1 << bps) - 1), bps)  # warmup
    # residual: method 0 (4-bit rice), partition order 0
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(rice_k, 4)
    res = np.diff(np.asarray(samples, np.int64))
    for r in res:
        u = (int(r) << 1) ^ (int(r) >> 63)  # zigzag
        bw.write_unary(u >> rice_k)
        if rice_k:
            bw.write(u & ((1 << rice_k) - 1), rice_k)


def encode_flac(path, channels_data, sr=16000, block=1024, subframe='fixed1',
                total_in_streaminfo=True):
    """channels_data: list of int16 numpy arrays (one per channel)."""
    n_ch = len(channels_data)
    n = len(channels_data[0])
    out = bytearray(b'fLaC')
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(n_ch - 1, 3)
    si.write(15, 5)  # bps-1
    si.write(n if total_in_streaminfo else 0, 36)
    si.write(0, 64)
    si.write(0, 64)
    body = si.data()
    out += bytes([0x80]) + len(body).to_bytes(3, 'big') + body

    frame_idx = 0
    for start in range(0, n, block):
        bs = min(block, n - start)
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)       # reserved
        bw.write(0, 1)       # fixed blocksize strategy
        bw.write(7, 4)       # 16-bit block size follows
        bw.write(5, 4)       # 16 kHz
        bw.write(n_ch - 1, 4)
        bw.write(4, 3)       # 16 bps
        bw.write(0, 1)
        for b in utf8_number(frame_idx):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        header = bw.data() if bw.nbits == 0 else None
        assert header is not None
        bw2 = BitWriter()
        bw2.bytes = bytearray(header)
        bw2.write(crc8(header), 8)

        for c in range(n_ch):
            seg = channels_data[c][start:start + bs]
            if subframe == 'verbatim':
                encode_subframe_verbatim(bw2, seg)
            elif subframe == 'constant':
                encode_subframe_constant(bw2, seg[0])
            else:
                encode_subframe_fixed1(bw2, seg)
        bw2.align()
        frame = bw2.data()
        frame += crc16(frame).to_bytes(2, 'big')
        out += frame
        frame_idx += 1

    with open(path, 'wb') as f:
        f.write(out)


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    _ensure_lib()


class TestFlacDecoder:

    def _roundtrip(self, tmp_path, data_channels, **kw):
        p = str(tmp_path / "t.flac")
        encode_flac(p, data_channels, **kw)
        wav, sr = audio_io.load_flac(p)
        assert sr == 16000
        expected = np.stack(data_channels, axis=1).astype(np.float32).mean(
            axis=1) / 32768.0
        np.testing.assert_allclose(wav, expected, atol=1e-6)

    def test_verbatim_mono(self, tmp_path):
        rng = np.random.RandomState(0)
        x = (rng.randn(5000) * 3000).astype(np.int16)
        self._roundtrip(tmp_path, [x], subframe='verbatim')

    def test_fixed1_mono(self, tmp_path):
        t = np.arange(7000)
        x = (3000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int16)
        self._roundtrip(tmp_path, [x], subframe='fixed1')

    def test_constant_mono(self, tmp_path):
        x = np.full(4096, -123, np.int16)
        self._roundtrip(tmp_path, [x], subframe='constant')

    def test_stereo_independent(self, tmp_path):
        rng = np.random.RandomState(1)
        l = (rng.randn(3000) * 2000).astype(np.int16)
        r = (rng.randn(3000) * 2000).astype(np.int16)
        self._roundtrip(tmp_path, [l, r], subframe='verbatim')

    def test_info(self, tmp_path):
        x = np.zeros(5120, np.int16)
        p = str(tmp_path / "i.flac")
        encode_flac(p, [x])
        n, sr = audio_io.flac_info(p)
        assert (n, sr) == (5120, 16000)

    def test_info_without_streaminfo_total(self, tmp_path):
        x = np.zeros(2048, np.int16)
        p = str(tmp_path / "i2.flac")
        encode_flac(p, [x], total_in_streaminfo=False)
        n, sr = audio_io.flac_info(p)
        assert (n, sr) == (2048, 16000)

    def test_odd_tail_block(self, tmp_path):
        rng = np.random.RandomState(2)
        x = (rng.randn(2500) * 1000).astype(np.int16)  # 1024+1024+452
        self._roundtrip(tmp_path, [x], subframe='verbatim')

    def test_dispatch_through_load_audio(self, tmp_path):
        x = (np.sin(np.arange(2000) * 0.05) * 5000).astype(np.int16)
        p = str(tmp_path / "d.flac")
        encode_flac(p, [x], subframe='fixed1')
        wav, sr = audio_io.load_audio(p)
        np.testing.assert_allclose(wav, x.astype(np.float32) / 32768.0,
                                   atol=1e-6)
