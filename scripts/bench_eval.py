"""Eval-stack benchmark: this framework vs the PyTorch reference.

Times three eval workloads on the SAME corpus, checkpoint, and inputs:

  * feature extraction (`buildFeature` over whole files),
  * the full ABX evaluation (`eval_ABX from_checkpoint`, within+across),
  * in-memory k-means (`KMean`, fixed iteration count),

for three stacks:

  * ours on the default JAX backend (the TPU chip when present),
  * ours forced to host CPU (same-hardware comparison),
  * the reference implementation (torch, CPU — its only option here),
    with its Cython DTW kernel replaced by our compiled C++ host DTW
    (`csrc/dtwhost.cc`): the reference's own .pyx cannot build on this
    Python, and timing it against a pure-Python DP would flatter us.

Every workload is run twice per stack and the SECOND time is reported, so
JIT/compile/OS-cache warmup is excluded for both sides (the persistent XLA
compilation cache does the same for cross-run honesty).

Usage: PYTHONPATH=/root/repo python scripts/bench_eval.py [workdir]
Prints a table and writes <workdir>/bench_eval.json.
"""

import importlib.util
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KMEANS_N, KMEANS_D, KMEANS_K, KMEANS_ITER = 50000, 256, 50, 30

# Corpus scale: timing a 12-tiny-file corpus measures per-call overhead,
# not the stacks; this sizing (4 spk x 8 files x ~7 s at the flagship
# 256-dim recipe) makes compute dominate while the torch-CPU side still
# finishes in minutes.
N_SPK, FILES_PER_SPK, TOKENS_PER_FILE = 4, 8, 24
PHONES = ['aa', 'iy', 'uw', 'eh']
SEP = 'sil'
SR = 16000


def _load_parity_module():
    spec = importlib.util.spec_from_file_location(
        'abx_parity', os.path.join(REPO, 'scripts', 'abx_parity.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_corpus(root):
    """Synthetic phone corpus in the abx_parity style (two-sine phone
    signatures, sil separators, .item triplet annotations), parameterized
    to benchmark scale."""
    from cpc2_tpu.data.audio_io import save_wav
    rs = np.random.RandomState(1)
    f_sig = {'aa': (220, 900), 'iy': (260, 1150), 'uw': (240, 800),
             'eh': (290, 1000), SEP: (120, 120)}
    item_lines = ["#file onset offset #phone prev-phone next-phone speaker"]
    os.makedirs(root)
    for spk_i in range(N_SPK):
        spk = f"spk{spk_i}"
        d = os.path.join(root, spk)
        os.makedirs(d, exist_ok=True)
        for file_i in range(FILES_PER_SPK):
            name = f"{spk}-{file_i:02d}"
            tokens = [SEP]
            for _ in range(TOKENS_PER_FILE):
                tokens += [PHONES[rs.randint(len(PHONES))], SEP]
            wav, t, intervals = [], 0.0, []
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
            save_wav(os.path.join(d, name + '.wav'), np.concatenate(wav), SR)
            for k in range(1, len(intervals) - 1):
                tok, on, off = intervals[k]
                if tok == SEP:
                    continue
                item_lines.append(
                    f"{name} {on:.4f} {off:.4f} {tok} "
                    f"{intervals[k - 1][0]} {intervals[k + 1][0]} {spk}")
    item_path = os.path.join(os.path.dirname(root), 'phones.item')
    with open(item_path, 'w') as f:
        f.write("\n".join(item_lines) + "\n")
    return item_path


def train_checkpoint(corpus, ckpt_dir):
    """One epoch at the flagship dims (256-d encoder + 256-d LSTM) — the
    checkpoint's quality is irrelevant for timing, its SHAPES are not."""
    from cpc2_tpu import train
    train.main([
        '--pathDB', corpus, '--file_extension', '.wav',
        '--pathCheckpoint', ckpt_dir,
        '--hiddenEncoder', '256', '--hiddenGar', '256',
        '--nPredicts', '4', '--negativeSamplingExt', '16',
        '--sizeWindow', '20480', '--nGPU', '1', '--batchSizeGPU', '4',
        '--rnnMode', 'linear', '--arMode', 'LSTM',
        '--samplingType', 'uniform', '--random_seed', '7',
        '--logging_step', '1000', '--save_step', '1', '--nEpoch', '1'])
    return os.path.join(ckpt_dir, 'checkpoint_0.pt')


def _twice(fn):
    fn()
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# ---------------------------------------------------------------------------
# Phases (each runs in its own subprocess so the JAX backend choice and the
# reference's import-time shims stay isolated)
# ---------------------------------------------------------------------------

def phase_corpus(work):
    corpus = os.path.join(work, 'corpus')
    item = build_corpus(corpus)
    ckpt = train_checkpoint(corpus, os.path.join(work, 'ckpt'))
    # train/val split lists for the linear-separability probes
    names = sorted(os.path.splitext(os.path.basename(p))[0]
                   for p in _wav_list(corpus))
    train_list = os.path.join(work, 'train_split.txt')
    val_list = os.path.join(work, 'val_split.txt')
    with open(train_list, 'w') as f:
        f.write("\n".join(n for i, n in enumerate(names) if i % 4 != 0))
    with open(val_list, 'w') as f:
        f.write("\n".join(n for i, n in enumerate(names) if i % 4 == 0))
    json.dump({'corpus': corpus, 'item': item, 'ckpt': ckpt,
               'train_list': train_list, 'val_list': val_list},
              open(os.path.join(work, 'setup.json'), 'w'))


def _wav_list(corpus):
    out = []
    for root, _dirs, files in os.walk(corpus):
        out.extend(os.path.join(root, f) for f in sorted(files)
                   if f.endswith('.wav'))
    return sorted(out)


def phase_ours(work, backend):
    import jax
    if backend.startswith('cpu'):
        jax.config.update('jax_platforms', 'cpu')
    from cpc2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    setup = json.load(open(os.path.join(work, 'setup.json')))
    res = {'backend': jax.default_backend(),
           'n_devices': len(jax.local_devices())}

    from cpc2_tpu import feature_loader as fl
    model, hidden_gar, hidden_enc = fl.loadModel([setup['ckpt']])
    feat = fl.FeatureModule(model, get_encoded=False)
    files = _wav_list(setup['corpus'])

    # The framework's corpus-extraction API (batched across files with
    # frame bucketing); per-file outputs match buildFeature.
    def extract():
        out = fl.build_feature_files(feat, files, bucket_frames=128)
        for v in out.values():
            np.asarray(v)
    res['feature_extraction_s'] = _twice(extract)
    res['feature_files'] = len(files)

    from cpc2_tpu.eval import eval_ABX

    def abx():
        out = os.path.join(work, f'abx_ours_{backend}')
        eval_ABX.main(['from_checkpoint', setup['ckpt'], setup['item'],
                       setup['corpus'], '--file_extension', '.wav',
                       '--out', out, '--mode', 'all'])
    res['abx_s'] = _twice(abx)

    import jax.numpy as jnp
    from cpc2_tpu.clustering.clustering import KMean
    rs = np.random.RandomState(0)
    C = jnp.asarray(rs.randn(KMEANS_N, KMEANS_D).astype(np.float32))

    def kmeans():
        out = KMean(C, KMEANS_K, MAX_ITER=KMEANS_ITER, EPSILON=0.0)
        np.asarray(out)
    res['kmeans_s'] = _twice(kmeans)

    from cpc2_tpu.eval import linear_separability as linsep

    # Same global batch on every backend: per-device share shrinks with
    # the device count (the meshed probe's trajectory is device-count
    # invariant, tests/test_eval_mesh.py).
    n_dev = len(jax.local_devices())
    per_dev = max(8 // n_dev, 1)

    def probe():
        linsep.main([setup['corpus'], setup['train_list'],
                     setup['val_list'], setup['ckpt'],
                     '--pathCheckpoint',
                     os.path.join(work, f'linsep_ours_{backend}'),
                     '--file_extension', '.wav', '--nGPU', str(n_dev),
                     '--batchSizeGPU', str(per_dev), '--n_epoch', '2',
                     '--size_window', '20480'])
    res['linsep_s'] = _twice(probe)

    json.dump(res, open(os.path.join(work, f'ours_{backend}.json'), 'w'))


def phase_reference(work):
    par = _load_parity_module()
    par._install_reference_shims()
    # Swap the parity harness's pure-python DTW shim for the compiled C++
    # host kernel so the reference is timed with native-kernel speed.
    import torch
    from cpc2_tpu.ops.dtw_host import dtw_batch_host
    dtw_mod = sys.modules['ABX.dtw']

    def dtw_batch(x, y, sx, sy, dist_mat, ignore_diag=False, symetric=False):
        out = dtw_batch_host(x, y, np.asarray(sx), np.asarray(sy),
                             np.asarray(dist_mat, dtype=np.float32),
                             ignore_diag=ignore_diag, symetric=symetric)
        return torch.from_numpy(np.asarray(out))
    dtw_mod.dtw_batch = dtw_batch

    setup = json.load(open(os.path.join(work, 'setup.json')))
    res = {'backend': 'torch-cpu'}
    sys.path.insert(0, par.REF)
    sys.path.insert(0, os.path.join(par.REF, 'cpc', 'eval'))

    from cpc import feature_loader as ref_fl
    model = ref_fl.loadModel([setup['ckpt']])[0]
    feat = ref_fl.FeatureModule(model, False)
    feat.eval()
    files = _wav_list(setup['corpus'])

    def extract():
        for f in files:
            ref_fl.buildFeature(feat, f, seqNorm=False, strict=False).numpy()
    res['feature_extraction_s'] = _twice(extract)
    res['feature_files'] = len(files)

    spec = importlib.util.spec_from_file_location(
        'ref_eval_ABX', os.path.join(par.REF, 'cpc', 'eval', 'eval_ABX.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def abx():
        out = os.path.join(work, 'abx_ref')
        mod.main(['from_checkpoint', setup['ckpt'], setup['item'],
                  setup['corpus'], '--file_extension', '.wav',
                  '--out', out, '--mode', 'all'])
    res['abx_s'] = _twice(abx)

    from cpc.clustering.clustering import KMean as RefKMean
    rs = np.random.RandomState(0)
    C = torch.from_numpy(rs.randn(KMEANS_N, KMEANS_D).astype(np.float32))

    def kmeans():
        RefKMean(C, KMEANS_K, MAX_ITER=KMEANS_ITER, EPSILON=0.0)
    res['kmeans_s'] = _twice(kmeans)

    # The reference wraps model+criterion in torch.nn.DataParallel with
    # explicit device ids; without CUDA that errors on scatter, so swap in
    # a delegating wrapper (environment shim only — the probe math runs
    # unmodified on torch CPU).
    class _DelegatingDP(torch.nn.Module):
        def __init__(self, module, device_ids=None, **_kw):
            super().__init__()
            self.module = module

        def forward(self, *a, **kw):
            return self.module(*a, **kw)
    torch.nn.DataParallel = _DelegatingDP

    spec2 = importlib.util.spec_from_file_location(
        'ref_linsep',
        os.path.join(par.REF, 'cpc', 'eval', 'linear_separability.py'))
    linsep = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(linsep)

    def probe():
        linsep.main([setup['corpus'], setup['train_list'],
                     setup['val_list'], setup['ckpt'],
                     '--pathCheckpoint', os.path.join(work, 'linsep_ref'),
                     '--file_extension', '.wav', '--nGPU', '1',
                     '--batchSizeGPU', '8', '--n_epoch', '2',
                     '--size_window', '20480'])
    res['linsep_s'] = _twice(probe)

    json.dump(res, open(os.path.join(work, 'reference.json'), 'w'))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == '--phase':
        phase, work = sys.argv[2], sys.argv[3]
        if phase == 'corpus':
            phase_corpus(work)
        elif phase == 'ours-default':
            phase_ours(work, 'default')
        elif phase == 'ours-cpu':
            phase_ours(work, 'cpu')
        elif phase == 'ours-cpu8':
            phase_ours(work, 'cpu8')
        elif phase == 'reference':
            phase_reference(work)
        return

    work = sys.argv[1] if len(sys.argv) > 1 else '/tmp/bench_eval'
    assert not os.path.exists(work), f"{work} already exists"
    os.makedirs(work)
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')

    for phase in ('corpus', 'ours-default', 'ours-cpu', 'ours-cpu8',
                  'reference'):
        print(f"--- phase {phase} ---", flush=True)
        phase_env = dict(env)
        if phase == 'ours-cpu8':
            # the multi-device column: the same eval stack over an
            # 8-virtual-device mesh (tests/test_eval_mesh.py pins the
            # results device-count-invariant; this pins the wall-clock)
            phase_env['XLA_FLAGS'] = (
                env.get('XLA_FLAGS', '')
                + ' --xla_force_host_platform_device_count=8').strip()
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        '--phase', phase, work], check=True, env=phase_env)

    ours = json.load(open(os.path.join(work, 'ours_default.json')))
    ours_cpu = json.load(open(os.path.join(work, 'ours_cpu.json')))
    ours_cpu8 = json.load(open(os.path.join(work, 'ours_cpu8.json')))
    ref = json.load(open(os.path.join(work, 'reference.json')))

    rows = [('feature extraction (%d files)' % ours['feature_files'],
             'feature_extraction_s'),
            ('ABX eval (within+across)', 'abx_s'),
            ('KMean %dx%d, k=%d, %d iters'
             % (KMEANS_N, KMEANS_D, KMEANS_K, KMEANS_ITER), 'kmeans_s'),
            ('linear separability (speaker probe, 2 ep)', 'linsep_s')]
    print(f"\n=== eval-stack wall times (2nd run, warm) ===")
    print(f"{'workload':42s} {'ours/' + ours['backend']:>12s} "
          f"{'ours/cpu':>10s} {'ours/cpu x8':>11s} {'reference':>10s} "
          f"{'speedup':>8s}")
    summary = {'ours_backend': ours['backend'], 'rows': {}}
    for label, key in rows:
        a, c, c8, r = ours[key], ours_cpu[key], ours_cpu8[key], ref[key]
        print(f"{label:42s} {a:11.2f}s {c:9.2f}s {c8:10.2f}s {r:9.2f}s "
              f"{r / a:7.1f}x")
        summary['rows'][key] = {'ours': a, 'ours_cpu': c,
                                'ours_cpu_8dev': c8, 'reference': r,
                                'speedup': r / a}
    json.dump(summary, open(os.path.join(work, 'bench_eval.json'), 'w'),
              indent=2)
    print(f"\nwritten: {os.path.join(work, 'bench_eval.json')}")


if __name__ == '__main__':
    main()
