"""End-to-end ABX parity measurement: our eval_ABX vs the PyTorch reference.

Puts the SAME checkpoint + SAME corpus + SAME .item file through

  * `cpc2_tpu.eval.eval_ABX from_checkpoint` (this framework), and
  * `/root/reference/cpc/eval/eval_ABX.py from_checkpoint` (the reference,
    executed in-process on torch CPU),

and prints both score sets and their absolute differences. The north-star
target is |delta| <= 0.2 absolute (`BASELINE.md`).

The reference runs unmodified except for three environment shims it needs
in this container (none touch framework math):
  * `torchaudio` is absent -> stub whose `load()` decodes wav via our
    bundled reader (byte-identical PCM decode);
  * no GPU -> `Tensor.cuda`/`Module.cuda` become no-ops;
  * `progressbar` is absent -> minimal stub;
  * the prebuilt Cython `dtw.c` targets Python <= 3.10 (longintrepr.h) and
    cython isn't installed, so `ABX.dtw` is pre-seeded with a faithful
    numpy re-expression of the 77-line DP (`dtw.pyx:16-77`) — the same
    port our own DTW kernel is unit-tested against (tests/test_abx.py).

Usage: PYTHONPATH=/root/repo python scripts/abx_parity.py [workdir]
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = '/root/reference'
sys.path.insert(0, REPO)

PHONES = ['aa', 'iy', 'uw', 'eh']
SEP = 'sil'
SR = 16000


# ---------------------------------------------------------------------------
# Corpus: each phone is a distinct two-sine signature; files alternate
# separator/content phones so every content token shares the (sil, sil)
# context and within-speaker ABX groups are well-populated.
# ---------------------------------------------------------------------------

def build_corpus(root):
    from cpc2_tpu.data.audio_io import save_wav
    rs = np.random.RandomState(0)
    # Deliberately confusable signatures + per-token jitter + noise so the
    # ABX score lands mid-range (a 0-vs-0 comparison would prove little).
    f_sig = {'aa': (220, 900), 'iy': (260, 1150), 'uw': (240, 800),
             'eh': (290, 1000), SEP: (120, 120)}
    item_lines = ["#file onset offset #phone prev-phone next-phone speaker"]
    os.makedirs(root)
    for spk_i in range(3):
        spk = f"spk{spk_i}"
        for file_i in range(4):
            name = f"{spk}-{file_i:02d}"
            d = os.path.join(root, spk)
            os.makedirs(d, exist_ok=True)
            tokens = [SEP]
            for _ in range(14):
                tokens += [PHONES[rs.randint(len(PHONES))], SEP]
            wav, t = [], 0.0
            intervals = []
            for tok in tokens:
                dur = 0.16 if tok != SEP else 0.12
                n = int(dur * SR)
                f1, f2 = f_sig[tok]
                f1 *= 1.0 + 0.10 * rs.randn()
                f2 *= 1.0 + 0.10 * rs.randn()
                tt = np.arange(n) / SR
                x = (0.4 * np.sin(2 * np.pi * f1 * tt)
                     + 0.3 * np.sin(2 * np.pi * f2 * tt)
                     + 0.15 * rs.randn(n)
                     + 0.05 * spk_i * np.sin(2 * np.pi * 60 * tt))
                wav.append(x.astype(np.float32))
                intervals.append((tok, t, t + dur))
                t += dur
            save_wav(os.path.join(d, name + '.wav'),
                     np.concatenate(wav), SR)
            for k in range(1, len(intervals) - 1):
                tok, on, off = intervals[k]
                if tok == SEP:
                    continue
                prev_tok, next_tok = intervals[k - 1][0], intervals[k + 1][0]
                item_lines.append(
                    f"{name} {on:.4f} {off:.4f} {tok} "
                    f"{prev_tok} {next_tok} {spk}")
    item_path = os.path.join(os.path.dirname(root), 'phones.item')
    with open(item_path, 'w') as f:
        f.write("\n".join(item_lines) + "\n")
    return item_path


def train_checkpoint(corpus, ckpt_dir):
    from cpc2_tpu import train
    train.main([
        '--pathDB', corpus, '--file_extension', '.wav',
        '--pathCheckpoint', ckpt_dir,
        '--hiddenEncoder', '64', '--hiddenGar', '64',
        '--nPredicts', '4', '--negativeSamplingExt', '16',
        '--sizeWindow', '20480', '--nGPU', '1', '--batchSizeGPU', '4',
        '--rnnMode', 'linear', '--arMode', 'LSTM',
        '--samplingType', 'uniform', '--random_seed', '11',
        '--logging_step', '100', '--save_step', '1', '--nEpoch', '3'])
    return os.path.join(ckpt_dir, 'checkpoint_2.pt')


def run_ours(ckpt, item, corpus, out_dir):
    from cpc2_tpu.eval import eval_ABX
    eval_ABX.main(['from_checkpoint', ckpt, item, corpus,
                   '--file_extension', '.wav', '--out', out_dir,
                   '--mode', 'all'])
    with open(os.path.join(out_dir, 'ABX_scores.json')) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# Reference side
# ---------------------------------------------------------------------------

def _dtw_normalized_numpy(dist):
    """The `dtw.pyx:40-77` DP + backtracked path-length normalization."""
    n, m = dist.shape
    cost = np.empty((n, m), dtype=np.float64)
    cost[0, 0] = dist[0, 0]
    for i in range(1, n):
        cost[i, 0] = dist[i, 0] + cost[i - 1, 0]
    for j in range(1, m):
        cost[0, j] = dist[0, j] + cost[0, j - 1]
    for i in range(1, n):
        for j in range(1, m):
            cost[i, j] = dist[i, j] + min(cost[i - 1, j],
                                          cost[i - 1, j - 1],
                                          cost[i, j - 1])
    final = cost[n - 1, m - 1]
    path_len, i, j = 1, n - 1, m - 1
    while i > 0 and j > 0:
        c_up, c_left, c_diag = cost[i - 1, j], cost[i, j - 1], \
            cost[i - 1, j - 1]
        if c_diag <= c_left and c_diag <= c_up:
            i, j = i - 1, j - 1
        elif c_left <= c_up:
            j -= 1
        else:
            i -= 1
        path_len += 1
    if i == 0:
        path_len += j
    if j == 0:
        path_len += i
    return final / path_len


def _install_reference_shims():
    import torch

    # torchaudio.load -> bundled wav reader, (1, T) float tensor + sr.
    from cpc2_tpu.data.audio_io import load_wav, wav_info

    ta = types.ModuleType('torchaudio')

    def _load(path):
        x, sr = load_wav(str(path))
        return torch.from_numpy(np.asarray(x))[None, :], sr
    ta.load = _load

    def _info(path):
        # header-only, like the real torchaudio.info (reference
        # `dataset.py:763` reads .num_frames in pool workers)
        n, sr = wav_info(str(path))
        return types.SimpleNamespace(num_frames=n, sample_rate=sr)
    ta.info = _info
    ta.transforms = types.SimpleNamespace(MFCC=None)
    sys.modules['torchaudio'] = ta

    pb = types.ModuleType('progressbar')

    class _Bar:
        def __init__(self, *a, **k):
            pass

        def start(self, *a, **k):
            return self

        def update(self, *a, **k):
            pass

        def finish(self):
            pass
    pb.ProgressBar = _Bar
    pb.Percentage = pb.Bar = pb.ETA = object
    sys.modules['progressbar'] = pb

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    dtw_mod = types.ModuleType('ABX.dtw')

    def dtw_batch(x, y, sx, sy, dist_mat, ignore_diag=False, symetric=False):
        nx, ny = dist_mat.shape[0], dist_mat.shape[1]
        out = torch.zeros((nx, ny))
        dm = np.asarray(dist_mat, dtype=np.float32)
        for i in range(nx):
            start = i if symetric else 0
            for j in range(start, ny):
                if ignore_diag and i == j:
                    continue
                d = _dtw_normalized_numpy(dm[i, j, :sx[i], :sy[j]])
                out[i][j] = d
                if symetric and i != j:
                    out[j][i] = out[i][j]
        return out
    dtw_mod.dtw_batch = dtw_batch
    sys.modules['ABX.dtw'] = dtw_mod


def run_reference(ckpt, item, corpus, out_dir):
    _install_reference_shims()
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, 'cpc', 'eval'))
    spec = importlib.util.spec_from_file_location(
        'ref_eval_ABX', os.path.join(REF, 'cpc', 'eval', 'eval_ABX.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(['from_checkpoint', ckpt, item, corpus,
              '--file_extension', '.wav', '--out', out_dir,
              '--mode', 'all'])
    with open(os.path.join(out_dir, 'ABX_scores.json')) as f:
        return json.load(f)


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')

    work = sys.argv[1] if len(sys.argv) > 1 else '/tmp/abx_parity'
    assert not os.path.exists(work), f"{work} already exists"
    corpus = os.path.join(work, 'corpus')
    item = build_corpus(corpus)
    print(f"Corpus + item file under {work}")

    ckpt = train_checkpoint(corpus, os.path.join(work, 'ckpt'))
    print(f"Checkpoint: {ckpt}")

    ours = run_ours(ckpt, item, corpus, os.path.join(work, 'ours'))
    theirs = run_reference(ckpt, item, corpus, os.path.join(work, 'ref'))

    print("\n=== ABX parity (same checkpoint, corpus, item file) ===")
    worst = 0.0
    for mode in sorted(set(ours) | set(theirs)):
        a, b = ours.get(mode), theirs.get(mode)
        delta = abs(a - b) if a is not None and b is not None else float('nan')
        worst = max(worst, delta)
        print(f"  {mode:8s}  ours={a:.6f}  reference={b:.6f}  |delta|={delta:.6f}")
    print(f"  worst |delta| = {worst:.6f} (target <= 0.2)")
    sys.exit(0 if worst <= 0.2 else 1)


if __name__ == '__main__':
    main()
