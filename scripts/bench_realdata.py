"""Real-data training throughput (VERDICT round-2 item 2).

Runs the ACTUAL training CLI (`python -m cpc2_tpu.train`: loader ->
samplers -> WireStager -> train step) for a few epochs on a subset of a
real wav corpus and reports the reference's own ms/batch telemetry
(`/root/reference/cpc/train.py:124-134` format, printed by
`cpc2_tpu/train.py:train_epoch`). This is the end-to-end number the
synthetic `bench.py` step time must be compared against: the gap between
the two is the data pipeline (host DSP + host->device staging), which the
prefetch thread double-buffers (`utils/prefetch.py`,
`parallel/mesh.py:WireStager`).

Prints a summary of every logging window's ms/batch plus the best and
median steady-state windows (first window of each epoch excluded: it pays
the dispatch-pipeline fill).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_realdata.py \
      --corpus /tmp/synth20h [--files 200] [--epochs 3] [--batch 8] \
      [--augment] [--augment_on_device]
"""

import argparse
import os
import re
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pick_files(corpus, n, ext='.wav'):
    names = []
    for root, _, files in os.walk(corpus):
        for f in sorted(files):
            if f.endswith(ext):
                names.append(os.path.splitext(f)[0])
    names.sort()
    if len(names) < n + 8:
        raise SystemExit(f'corpus has only {len(names)} files, need {n + 8}')
    return names[:n], names[n:n + 8]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--corpus', default='/tmp/synth20h')
    ap.add_argument('--files', type=int, default=200)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--logging_step', type=int, default=50)
    ap.add_argument('--precision', default='bf16mix')
    ap.add_argument('--augment', action='store_true',
                    help='add --augment_past --augment_type pitch bandreject')
    ap.add_argument('--augment_on_device', action='store_true')
    ap.add_argument('--extra', nargs=argparse.REMAINDER, default=[],
                    help='extra train.py flags verbatim')
    args = ap.parse_args()

    train_names, val_names = pick_files(args.corpus, args.files)
    tmp = tempfile.mkdtemp(prefix='bench_realdata_')
    train_list = os.path.join(tmp, 'train.txt')
    val_list = os.path.join(tmp, 'val.txt')
    with open(train_list, 'w') as f:
        f.write('\n'.join(train_names) + '\n')
    with open(val_list, 'w') as f:
        f.write('\n'.join(val_names) + '\n')

    cmd = [sys.executable, '-m', 'cpc2_tpu.train',
           '--pathDB', args.corpus, '--file_extension', '.wav',
           '--pathTrain', train_list, '--pathVal', val_list,
           '--pathCheckpoint', os.path.join(tmp, 'ck'),
           '--nEpoch', str(args.epochs), '--batchSizeGPU', str(args.batch),
           '--precision', args.precision,
           '--logging_step', str(args.logging_step),
           '--save_step', '1000', '--random_seed', '7']
    if args.augment:
        cmd += ['--augment_past', '--augment_type', 'pitch', 'bandreject']
    if args.augment_on_device:
        cmd += ['--augment_on_device']
    cmd += args.extra

    env = dict(os.environ)
    env['PYTHONPATH'] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    print('running:', ' '.join(cmd), file=sys.stderr)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=5000)
    sys.stderr.write(out.stderr[-2000:])
    if out.returncode != 0:
        print(out.stdout[-4000:])
        raise SystemExit(f'train failed rc={out.returncode}')

    # windows per epoch: telemetry lines in epoch order; the first window
    # of each epoch pays compile/pipeline-fill and is excluded from the
    # steady-state stats.
    ms = [float(m.group(1)) for m in
          re.finditer(r'^([\d.]+) ms per batch', out.stdout, re.M)]
    epochs = out.stdout.count('Starting epoch')
    per_epoch = len(ms) // max(epochs, 1) if epochs else len(ms)
    steady = [v for i, v in enumerate(ms) if per_epoch and i % per_epoch]
    print(f'windows (ms/batch): {[round(v, 1) for v in ms]}')
    if steady:
        print(f'steady-state: best {min(steady):.1f}, '
              f'median {statistics.median(steady):.1f} ms/batch '
              f'({len(steady)} windows, first-of-epoch excluded)')
    else:
        print('too few windows for steady-state stats; raw:', ms)


if __name__ == '__main__':
    main()
