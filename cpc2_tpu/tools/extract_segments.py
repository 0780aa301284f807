"""RTTM voice-type segments -> trimmed wav chunks
(reference `data/extract_segments.py`).

Naming convention `base_spkr_onset_offset.wav`; duration-proportional random
or longest-first sampling into nested duration tiers; symlink inclusion of
smaller tiers into bigger. The reference shells out to sox for trimming —
here the trim is done with the bundled wav IO (no external binaries).

Run: `python -m cpc2_tpu.tools.extract_segments --audio_path ... --rttm_path
... --classes KCHI FEM --durations 100 200 --sampling random --output_path ..`
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

from ..data.audio_io import load_audio, save_wav


def load_all_rttm(rttm_path, classes, regex, min_dur, path_audios):
    """Load all segments whose speaker label is in `classes`
    (reference `extract_segments.py:10-38`)."""
    started = time.time()
    all_segments = []
    n_annotated = 0
    print("Loading rttm files.")
    for rttm_file in glob.glob(os.path.join(rttm_path,
                                            '*' + regex + '*.rttm')):
        audio_path = os.path.join(
            path_audios,
            os.path.basename(rttm_file).replace(".rttm", ".wav"))
        if not os.path.isfile(audio_path):
            continue
        n_annotated += 1
        with open(rttm_file, 'r') as fin:
            for line in fin:
                cols = line.split(' ')
                onset, duration, spkr = (float(cols[3]), float(cols[4]),
                                         cols[7])
                if spkr in classes and duration >= min_dur:
                    all_segments.append([audio_path, onset, duration,
                                         spkr])
    print("Found %d .rttm files" % n_annotated)
    print("Loaded %d segments in %.2f sec" % (len(all_segments),
                                              time.time() - started))
    return all_segments


_audio_cache = {}


def cut_wave_file(audio_file, onset, duration, spkr, output_path):
    """Trim `audio_file` [onset, onset+duration] to
    `output_path/spkr/base_spkr_onset_offset.wav`
    (reference `extract_segments.py:41-53`, sox-free)."""
    basename = os.path.basename(audio_file).replace(".wav", "")
    basename = basename + "_%s_%.2f_%.2f.wav" % (
        spkr, float(onset), float(onset) + float(duration))
    out = os.path.join(output_path, spkr, basename)

    if audio_file not in _audio_cache:
        if len(_audio_cache) > 4:
            _audio_cache.clear()
        _audio_cache[audio_file] = load_audio(audio_file)
    wav, sr = _audio_cache[audio_file]
    start = int(float(onset) * sr)
    end = start + int(float(duration) * sr)
    save_wav(out, wav[start:end], sr)


def segment_sampler(all_segments, durations, type, output_path):
    """(reference `extract_segments.py:56-82`)."""
    max_dur = max(durations)
    tot_dur_seg = sum(seg[2] for seg in all_segments)
    if tot_dur_seg < max_dur:
        raise ValueError(
            "You've asked to extract segments whose cumulated duration "
            "would be %d hours.\nBut all the segments found have a "
            "cumulated duration of %s hours."
            % (max_dur // 3600, tot_dur_seg // 3600))

    spkrs = np.unique([seg[3] for seg in all_segments])
    for duration in durations:
        for spkr in spkrs:
            os.makedirs(os.path.join(output_path,
                                     str(duration // 3600) + "h", spkr))

    if type == 'random':
        uniform_segment_sampler(all_segments, durations, output_path)
    elif type == 'longest':
        longest_segment_sampler(all_segments, durations, output_path)
    else:
        raise ValueError("Only 'uniform' or 'longest' type of sampler is "
                         "accepted.")


def uniform_segment_sampler(all_segments, durations, output_path):
    """Duration-proportional sampling
    (reference `extract_segments.py:85-121`)."""
    cum_dur = 0
    output_dir = os.path.join(output_path,
                              str(min(durations) // 3600) + "h")
    probabilities = np.asarray([seg[2] for seg in all_segments], np.float64)
    probabilities = probabilities / probabilities.sum()
    all_segments = list(all_segments)

    while cum_dur < min(durations) and len(all_segments) != 0:
        index_choice = np.random.choice(len(all_segments), size=1,
                                        p=probabilities)[0]
        chosen = all_segments[index_choice]
        cut_wave_file(audio_file=chosen[0], onset=float(chosen[1]),
                      duration=float(chosen[2]), spkr=chosen[3],
                      output_path=output_dir)
        cum_dur += float(chosen[2])
        del all_segments[index_choice]
        probabilities = np.delete(probabilities, index_choice)
        if probabilities.sum() > 0:
            probabilities = probabilities / probabilities.sum()

        if cum_dur >= min(durations) and len(durations) != 1:
            print("Done creating %s h version" % min(durations))
            durations = np.delete(durations,
                                  np.where(durations == min(durations)))
            output_dir = os.path.join(output_path,
                                      str(min(durations) // 3600) + "h")


def longest_segment_sampler(all_segments, durations, output_path):
    """Longest-first deterministic sampling
    (reference `extract_segments.py:124-149`)."""
    all_segments = sorted(all_segments, key=lambda x: -x[2])
    output_dir = os.path.join(output_path,
                              str(min(durations) // 3600) + "h")
    cum_dur = 0
    for chosen in all_segments:
        cut_wave_file(audio_file=chosen[0], onset=float(chosen[1]),
                      duration=float(chosen[2]), spkr=chosen[3],
                      output_path=output_dir)
        cum_dur += float(chosen[2])
        if cum_dur >= min(durations) and len(durations) != 1:
            print("Done creating %s h version" % min(durations))
            durations = np.delete(durations,
                                  np.where(durations == min(durations)))
            output_dir = os.path.join(output_path,
                                      str(min(durations) // 3600) + "h")


def create_symlink(output_path, durations, classes):
    """Include smaller tiers into bigger ones via symlinks
    (reference `extract_segments.py:152-174`)."""
    for duration in np.flip(durations):
        greater = [dur for dur in durations if dur > duration]
        for greater_dur in greater:
            for spkr in classes:
                input_folder = os.path.join(
                    output_path, str(duration // 3600) + "h", spkr)
                output_folder = os.path.join(
                    output_path, str(greater_dur // 3600) + "h", spkr)
                for input_file in glob.glob(
                        os.path.join(input_folder, "*.wav")):
                    output_file = os.path.join(
                        output_folder, os.path.basename(input_file))
                    os.symlink(os.path.abspath(input_file),
                               os.path.abspath(output_file))


def main(argv):
    parser = argparse.ArgumentParser(
        description='This scripts extracts audio segments (.wav) according '
                    'to their annotations (.rttm)')
    parser.add_argument('--audio_path', type=str, required=True)
    parser.add_argument("--rttm_path", type=str, required=True)
    parser.add_argument("--classes", nargs='+', type=str, required=True,
                        help='Labels to extract (KCHI, CHI, MAL, FEM, '
                             'SPEECH...)')
    parser.add_argument("--durations", nargs='+', type=int, required=True,
                        help='Cumulated durations (hours) to extract; '
                             'nested tiers.')
    parser.add_argument("--sampling", type=str, required=True,
                        choices=['random', 'longest'])
    parser.add_argument('--output_path', type=str, required=True)
    parser.add_argument('--regex', type=str, default='Bergelson')
    parser.add_argument('--min_dur', type=float, default=0)
    args = parser.parse_args(argv)

    print("Extracting %s hours of %s segments from %s"
          % (args.durations, args.classes,
             os.path.basename(args.audio_path)))

    if os.path.isdir(args.output_path):
        raise ValueError("%s already exists" % args.output_path)
    os.makedirs(args.output_path)

    all_segments = load_all_rttm(rttm_path=args.rttm_path,
                                 classes=args.classes, regex=args.regex,
                                 min_dur=args.min_dur,
                                 path_audios=args.audio_path)
    fem_dur = np.sum([seg[2] for seg in all_segments if seg[3] == 'FEM'])
    mal_dur = np.sum([seg[2] for seg in all_segments if seg[3] == 'MAL'])
    print("FEM_dur : %.2f" % (fem_dur / 3600))
    print("MAL_dur : %.2f" % (mal_dur / 3600))
    print("TOT_dur : %.2f" % ((fem_dur + mal_dur) / 3600))
    durations = np.asarray([dur * 3600 for dur in args.durations])
    segment_sampler(all_segments=all_segments, durations=durations,
                    type=args.sampling, output_path=args.output_path)
    create_symlink(output_path=args.output_path, durations=durations,
                   classes=args.classes)


if __name__ == "__main__":
    main(sys.argv[1:])
