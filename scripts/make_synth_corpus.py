"""Generate a multi-hour phone-structured synthetic-speech corpus for the
convergence-at-scale run (VERDICT round-2 item 5).

The environment is offline and ships only ~3 minutes of real audio
(`/root/reference/cpc/test_data`), so recipe-scale training evidence needs
a synthesized corpus. This generator produces formant-synthesized
pseudo-speech with the statistical structure CPC exploits:

* a phone inventory of 12 vowel/consonant-like units, each a (F1, F2, F3)
  formant target with bandwidths, plus fricative-like noise phones;
* speakers = f0 base (85-250 Hz) x vocal-tract length factor (+-12 %)
  x breathiness, so speaker identity is a real nuisance factor;
* utterances = random phone strings, 70-180 ms per phone with linear
  formant interpolation at boundaries (coarticulation), amplitude
  envelope, and additive noise floor.

Alongside the wav tree (LibriSpeech-ish `root/<spk>/<chap>/<file>.wav`) it
writes phone alignments (`phone_labels.txt`, reference format: one line
per file, label ids at 160-sample steps) and an ABX `.item` file over the
held-out val split.

Usage: python scripts/make_synth_corpus.py --out /tmp/synth20h --hours 20
"""

import argparse
import multiprocessing as mp
import os
import sys
import zlib

import numpy as np
import scipy.signal as sps

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000

# 12-phone inventory: (F1, F2, F3, voiced, noise_frac)
PHONES = {
    'aa': (730, 1090, 2440, True, 0.02),
    'iy': (270, 2290, 3010, True, 0.02),
    'uw': (300, 870, 2240, True, 0.02),
    'eh': (530, 1840, 2480, True, 0.02),
    'ao': (570, 840, 2410, True, 0.02),
    'ae': (660, 1720, 2410, True, 0.02),
    'ih': (390, 1990, 2550, True, 0.02),
    'uh': (440, 1020, 2240, True, 0.02),
    'ss': (4500, 6000, 7500, False, 1.00),
    'sh': (2500, 4000, 6000, False, 1.00),
    'zz': (3500, 5000, 7000, True, 0.55),
    'mm': (280, 900, 2200, True, 0.02),
}
PHONE_LIST = sorted(PHONES)
SIL = 'sil'
LABELS = [SIL] + PHONE_LIST               # label 0 = silence


def _speaker_params(rng):
    return {
        'f0': float(rng.uniform(85, 250)),
        'vtl': float(rng.uniform(0.88, 1.12)),   # formant scale
        'breath': float(rng.uniform(0.01, 0.08)),
    }


def _formant_filter(noise_or_pulse, freqs, sr=SR):
    """Cascade of 2nd-order resonators at the (already vtl-scaled)
    formant frequencies."""
    y = noise_or_pulse
    for f, bw in zip(freqs, (90.0, 120.0, 160.0)):
        f = min(f, sr / 2 - 200.0)
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * f / sr
        a = [1.0, -2 * r * np.cos(theta), r * r]
        y = sps.lfilter([1.0 - r], a, y)
    return y


def synth_utterance(rng, spk, dur_s):
    """Return (wav float32, [(label_id, n_samples), ...])."""
    segs = []
    labels = []
    t_total = 0
    while t_total < int(dur_s * SR):
        if rng.random_sample() < 0.18:
            name = SIL
            n = int(rng.uniform(0.05, 0.12) * SR)
            segs.append(np.zeros(n))
            labels.append((0, n))
            t_total += n
            continue
        name = PHONE_LIST[rng.randint(len(PHONE_LIST))]
        f1, f2, f3, voiced, noise_frac = PHONES[name]
        n = int(rng.uniform(0.07, 0.18) * SR)
        freqs = np.array([f1, f2, f3]) * spk['vtl']
        t = np.arange(n) / SR
        if voiced:
            f0 = spk['f0'] * (1.0 + 0.08 * np.sin(2 * np.pi
                                                  * rng.uniform(1.5, 4) * t)
                              + 0.03 * rng.randn())
            phase = 2 * np.pi * np.cumsum(f0) / SR
            # impulse-ish glottal source: sum of first 25 harmonics 1/k
            src = sum(np.sin(k * phase) / k for k in range(1, 26))
            src = (1 - noise_frac) * src + \
                (noise_frac + spk['breath']) * rng.randn(n)
        else:
            src = rng.randn(n)
        y = _formant_filter(src, freqs)
        env = np.minimum(1.0, np.minimum(t / 0.012, (t[-1] - t) / 0.012)
                         if n > 400 else 1.0)
        y = y * env * rng.uniform(0.5, 1.0)
        segs.append(y)
        labels.append((LABELS.index(name), n))
        t_total += n
    wav = np.concatenate(segs)
    peak = np.abs(wav).max() + 1e-8
    wav = (0.7 * wav / peak).astype(np.float32)
    return wav, labels


def _job(task):
    from cpc2_tpu.data.audio_io import save_wav
    out_dir, spk_name, file_i, seed, dur_s = task
    rng = np.random.RandomState(seed)
    # Stable across interpreters and pool workers (Python's hash() is
    # PYTHONHASHSEED-randomized, which would give the same speaker
    # different voice parameters in different 'spawn' workers/runs).
    spk_seed = zlib.crc32(spk_name.encode()) % (2 ** 31)
    spk = _speaker_params(np.random.RandomState(spk_seed))
    wav, labels = synth_utterance(rng, spk, dur_s)
    name = f'{spk_name}-c-{file_i:04d}'
    path = os.path.join(out_dir, spk_name, 'c')
    os.makedirs(path, exist_ok=True)
    save_wav(os.path.join(path, name + '.wav'), wav, SR)
    # frame labels at 160-sample steps (reference phone_labels format)
    frames = []
    for lab, n in labels:
        frames.extend([lab] * (n // 160))
    # item-file intervals: one line per non-sil phone with its context
    items = []
    t = 0.0
    for k, (lab, n) in enumerate(labels):
        dur = n / SR
        if lab != 0 and 0.06 < dur:
            prev = LABELS[labels[k - 1][0]] if k else SIL
            nxt = LABELS[labels[k + 1][0]] if k + 1 < len(labels) else SIL
            items.append(f"{name} {t:.4f} {t + dur:.4f} {LABELS[lab]} "
                         f"{prev} {nxt} {spk_name}")
        t += dur
    return name, frames, items, wav.shape[0] / SR


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', type=str, required=True)
    ap.add_argument('--hours', type=float, default=20.0)
    ap.add_argument('--speakers', type=int, default=40)
    ap.add_argument('--file_seconds', type=float, default=20.0)
    ap.add_argument('--val_files_per_spk', type=int, default=2)
    ap.add_argument('--jobs', type=int, default=os.cpu_count() or 4)
    args = ap.parse_args()

    total_files = int(args.hours * 3600 / args.file_seconds)
    per_spk = max(1, total_files // args.speakers)
    tasks = []
    seed = 0
    for s in range(args.speakers):
        spk = f'spk{s:03d}'
        for i in range(per_spk):
            tasks.append((args.out, spk, i, seed, args.file_seconds))
            seed += 1
    print(f"synthesizing {len(tasks)} files "
          f"(~{len(tasks) * args.file_seconds / 3600:.1f} h) "
          f"with {args.jobs} workers")

    os.makedirs(args.out, exist_ok=True)
    with mp.Pool(args.jobs) as pool:
        results = pool.map(_job, tasks)

    # phone labels file (reference `parseSeqLabels` format)
    with open(os.path.join(args.out, 'phone_labels.txt'), 'w') as f:
        for name, frames, _items, _d in results:
            f.write(name + ' ' + ' '.join(map(str, frames)) + '\n')

    # train/val split + ABX item file over val
    by_spk = {}
    for name, _f, items, _d in results:
        by_spk.setdefault(name.split('-')[0], []).append((name, items))
    train_names, val_names, val_items = [], [], []
    for spk, files in sorted(by_spk.items()):
        files.sort()
        for name, items in files[:-args.val_files_per_spk]:
            train_names.append(name)
        for name, items in files[-args.val_files_per_spk:]:
            val_names.append(name)
            val_items.extend(items)
    with open(os.path.join(args.out, 'train_split.txt'), 'w') as f:
        f.write('\n'.join(train_names) + '\n')
    with open(os.path.join(args.out, 'val_split.txt'), 'w') as f:
        f.write('\n'.join(val_names) + '\n')
    with open(os.path.join(args.out, 'val.item'), 'w') as f:
        f.write("#file onset offset #phone prev-phone next-phone speaker\n")
        f.write('\n'.join(val_items) + '\n')

    hours = sum(d for _n, _f, _i, d in results) / 3600
    print(f"done: {hours:.2f} h, {len(train_names)} train / "
          f"{len(val_names)} val files, "
          f"{len(val_items)} ABX items, labels for {len(results)} files")


if __name__ == '__main__':
    main()
