"""Convergence-at-scale evidence (VERDICT round-2 item 5).

Takes a finished recipe-scale training run on the synthetic multi-hour
corpus (`scripts/make_synth_corpus.py` + `python -m cpc2_tpu.train`) and
produces the evidence pack:

  1. per-epoch train/val loss + accuracy table (reference log format,
     read from checkpoint_logs.json);
  2. ABX error (within/across, seeded subsampler) for a FRESH-INIT model
     vs the final checkpoint — proves the representation, not just the
     loss, improved;
  3. frozen linear phone/speaker separability for fresh-init vs final;
  4. strict-load of the final checkpoint into real torch modules
     mirroring the reference CPCModel.

Prints a markdown report (redirect into docs/convergence.md).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/convergence_report.py \
      --corpus /tmp/synth20h --ckpt_dir /tmp/conv_run/ck [--skip_base_abx]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def latest_checkpoint(ckpt_dir):
    # numeric epochs only: sibling files like checkpoint_last.pt (written
    # by the clustering driver) or user copies must not crash the scan
    cands = [(int(f.split('_')[-1][:-3]), f) for f in os.listdir(ckpt_dir)
             if f.startswith('checkpoint_') and f.endswith('.pt')
             and f.split('_')[-1][:-3].isdigit()]
    if not cands:
        raise FileNotFoundError(
            f"no checkpoint_<epoch>.pt files in {ckpt_dir}")
    return os.path.join(ckpt_dir, max(cands)[1]), max(cands)[0]


def fresh_init_checkpoint(out_path, seed=123):
    """Reference-layout checkpoint of an untrained default-recipe model."""
    from cpc2_tpu import feature_loader as fl
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu.io.torch_ckpt import (params_to_torch_state_dict,
                                        save_checkpoint)
    args = get_default_cpc_config()
    # train-only flags loadModel's config resolution expects in the json
    args.load = None
    args.loadCriterion = False
    bundle = fl.init_model(args, seed=seed)
    sd = params_to_torch_state_dict(bundle.variables['params'],
                                    norm_mode=args.normMode)
    save_checkpoint(sd, {}, {}, None, out_path)
    ckpt_dir = os.path.dirname(out_path)
    with open(os.path.join(ckpt_dir, 'checkpoint_args.json'), 'w') as f:
        json.dump(vars(args), f)
    # loadModel resolves args via get_checkpoint_data, which requires the
    # logs side file too
    with open(os.path.join(ckpt_dir, 'checkpoint_logs.json'), 'w') as f:
        json.dump({'epoch': []}, f)
    return out_path


def run_abx(ckpt, corpus, out_dir):
    from cpc2_tpu.eval import eval_ABX
    scores = eval_ABX.main([
        'from_checkpoint', ckpt, os.path.join(corpus, 'val.item'), corpus,
        '--file_extension', '.wav', '--out', out_dir, '--mode', 'all',
        '--abx_seed', '7'])
    return scores


def run_linear_sep(ckpt, corpus, out_dir, path_phone=None, n_epoch=3):
    from cpc2_tpu.eval import linear_separability
    argv = [corpus, os.path.join(corpus, 'train_lin.txt'),
            os.path.join(corpus, 'val_split.txt'), ckpt,
            '--pathCheckpoint', out_dir, '--file_extension', '.wav',
            '--n_epoch', str(n_epoch), '--batchSizeGPU', '32']
    if path_phone:
        argv += ['--pathPhone', path_phone]
    acc = linear_separability.main(argv)
    return float(np.asarray(acc).reshape(-1).mean())


def make_linear_subset(corpus, n_files=200):
    """Small train subset for the frozen probes (full 20 h would dominate
    the wall-clock without changing the verdict)."""
    with open(os.path.join(corpus, 'train_split.txt')) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    rs = np.random.RandomState(0)
    rs.shuffle(names)
    path = os.path.join(corpus, 'train_lin.txt')
    with open(path, 'w') as f:
        f.write('\n'.join(sorted(names[:n_files])) + '\n')
    return path


def strict_load_into_torch(ckpt):
    import torch
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    from test_parity_torch import build_torch_encoder
    from cpc2_tpu.io.torch_ckpt import load_torch_checkpoint
    state = load_torch_checkpoint(ckpt)
    enc_sd = {k[len('gEncoder.'):]: v for k, v in state['gEncoder'].items()
              if k.startswith('gEncoder.')}
    ar_sd = {k[len('gAR.baseNet.'):]: v
             for k, v in state['gEncoder'].items()
             if k.startswith('gAR.baseNet.')}
    dim = enc_sd['conv0.weight'].shape[0]
    build_torch_encoder(dim).load_state_dict(enc_sd)
    gates = ar_sd['weight_ih_l0'].shape[0] // dim   # 4 = LSTM, 3 = GRU
    rnn = (torch.nn.LSTM if gates == 4 else torch.nn.GRU)(
        dim, dim, batch_first=True)
    rnn.load_state_dict(ar_sd)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--corpus', required=True)
    ap.add_argument('--ckpt_dir', required=True)
    ap.add_argument('--work', default='/tmp/conv_eval')
    ap.add_argument('--lin_files', type=int, default=200)
    ap.add_argument('--lin_epochs', type=int, default=10,
                    help='probe training epochs (the frozen probes are '
                    'cheap; 3 epochs leaves them visibly undertrained)')
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    final_ckpt, final_epoch = latest_checkpoint(args.ckpt_dir)
    base_dir = os.path.join(args.work, 'fresh')
    os.makedirs(base_dir, exist_ok=True)
    base_ckpt = fresh_init_checkpoint(
        os.path.join(base_dir, 'checkpoint_0.pt'))

    with open(os.path.join(args.ckpt_dir, 'checkpoint_logs.json')) as f:
        logs = json.load(f)

    print("## Convergence at recipe scale (synthetic 20 h corpus)\n")
    print(f"Final checkpoint: epoch {final_epoch} (`{final_ckpt}`)\n")
    print("### Per-epoch training curve (reference log format)\n")
    print("| epoch | train loss (mean over K) | train acc | val loss | "
          "val acc |")
    print("|---|---|---|---|---|")
    epochs = logs['epoch']
    show = sorted(set([epochs[0]] + epochs[::max(1, len(epochs) // 12)]
                      + [epochs[-1]]))
    for e in show:
        i = epochs.index(e)
        def m(key):
            v = logs.get(key)
            return (float(np.mean(v[i])) if v and v[i] is not None
                    else float('nan'))
        print(f"| {e} | {m('locLoss_train'):.4f} | {m('locAcc_train'):.4f}"
              f" | {m('locLoss_val'):.4f} | {m('locAcc_val'):.4f} |")

    lin_list = make_linear_subset(args.corpus, args.lin_files)
    phone_file = os.path.join(args.corpus, 'phone_labels.txt')

    rows = []
    for tag, ckpt in (('fresh-init', base_ckpt), ('trained', final_ckpt)):
        abx = run_abx(ckpt, args.corpus, os.path.join(args.work,
                                                      f'abx_{tag}'))
        spk = run_linear_sep(ckpt, args.corpus,
                             os.path.join(args.work, f'spk_{tag}'),
                             n_epoch=args.lin_epochs)
        pho = run_linear_sep(ckpt, args.corpus,
                             os.path.join(args.work, f'pho_{tag}'),
                             path_phone=phone_file,
                             n_epoch=args.lin_epochs)
        rows.append((tag, abx.get('within'), abx.get('across'), spk, pho))

    print("\n### Representation quality: fresh init vs trained\n")
    print("| model | ABX within | ABX across | speaker probe acc | "
          "phone probe acc |")
    print("|---|---|---|---|---|")
    for tag, w, a, spk, pho in rows:
        print(f"| {tag} | {w:.4f} | {a:.4f} | {spk:.4f} | {pho:.4f} |")

    ok = strict_load_into_torch(final_ckpt)
    print(f"\nFinal checkpoint strict-loads into reference-shaped torch "
          f"modules: {ok}")
    print(f"\n(train_lin subset: {args.lin_files} files; ABX subsampler "
          f"seeded with --abx_seed 7)")


if __name__ == '__main__':
    main()
