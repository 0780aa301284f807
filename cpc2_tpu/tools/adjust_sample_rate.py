"""Resample audio files matched to a transcript list
(reference `cpc/eval/utils/adjust_sample_rate.py`).

The reference used torchaudio's sinc resampler on Common Voices mp3; here
resampling is a polyphase scipy filter. mp3 input is decoded by the
native FFmpeg-backed shim (`csrc/audiodec.cc`) when it is built; on
machines without the FFmpeg dev libraries, `.mp3` fails fast with a
conversion hint rather than crashing mid-decode.

Run: `python -m cpc2_tpu.tools.adjust_sample_rate <path_db>
<path_phone_files> <path_out> [--out_sample_rate 16000]`
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from pathlib import Path

import numpy as np
from scipy import signal as sps

from ..data.audio_io import load_audio, save_wav


def resample(data: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return data
    g = math.gcd(sr, target_sr)
    return sps.resample_poly(data, target_sr // g, sr // g).astype(
        np.float32)


def adjust_sample_rate(path_db, file_list, path_db_out, target_sr):
    for index, item in enumerate(file_list):
        path_in = os.path.join(path_db, item)
        path_out = os.path.join(
            path_db_out, str(Path(item).with_suffix('.wav')))
        data, sr = load_audio(path_in)
        data = resample(np.asarray(data), sr, target_sr)
        save_wav(path_out, data, target_sr)
        if (index + 1) % 100 == 0:
            print(f"  {index + 1}/{len(file_list)}")


def get_names_list(path_tsv_file):
    with open(path_tsv_file, 'r') as f:
        data = f.readlines()
    return [x.split()[0] for x in data]


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description='Adjust the sample rate of a given group of audio files')
    parser.add_argument('path_db', type=str)
    parser.add_argument("path_phone_files", type=str)
    parser.add_argument("path_out", type=str)
    parser.add_argument("--out_sample_rate", type=int, default=16000)
    parser.add_argument('--file_extension', type=str, default='.mp3',
                        choices=['.wav', '.flac', '.mp3'],
                        help="input format; .mp3 needs the native "
                             "FFmpeg-backed decoder (built when the "
                             "libav* dev libraries are present)")
    return parser.parse_args(argv)


def main(argv):
    args = parse_args(argv)
    if args.file_extension == '.mp3':
        from ..data.audio_io import _MP3_HELP, _get_audec_lib
        if _get_audec_lib() is None:
            raise SystemExit(f"--file_extension .mp3: {_MP3_HELP}")
    file_list_db = [f for f in os.listdir(args.path_db)
                    if Path(f).suffix == args.file_extension]
    print(f"Found {len(file_list_db)} in the dataset")
    file_list_phone = get_names_list(args.path_phone_files)
    print(f"Found {len(file_list_phone)} with a phone transcription")

    transcribed = set(file_list_phone)
    out_list = sorted(f for f in file_list_db
                      if Path(f).stem in transcribed)
    print(f"Converting {len(out_list)} files")
    Path(args.path_out).mkdir(parents=True, exist_ok=True)
    adjust_sample_rate(args.path_db, out_list, args.path_out,
                       args.out_sample_rate)


if __name__ == '__main__':
    main(sys.argv[1:])
