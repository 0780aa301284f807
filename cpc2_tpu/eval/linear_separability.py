"""Linear separability probes (reference `cpc/eval/linear_separability.py`).

Trains a frozen (or `--unfrozen`) speaker / aligned-phone / CTC-phone probe
over CPC features. The probe step is one jitted function; in frozen mode the
feature network runs under `stop_gradient` so XLA skips its backward pass
entirely.

Run: `python -m cpc2_tpu.eval.linear_separability <pathDB> <pathTrain>
<pathVal> <checkpoint> [...]`
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import feature_loader as fl
from ..data.corpus import filterSeqs, findAllSeqs, parseSeqLabels
from ..data.dataset import AudioBatchData
from ..io.torch_ckpt import params_to_torch_state_dict, save_checkpoint
from ..losses import CTCPhoneCriterion, PhoneCriterion, SpeakerCriterion
from ..utils import misc as utils


def build_probe_step(model, criterion, tx, unfrozen: bool):
    def forward(params, batch_data, label, train, rng=None):
        variables = {'params': params['model']}
        # Frozen mode runs the feature net in eval mode; --unfrozen runs it
        # in train mode during probe training (dropout active), like the
        # reference's feature_maker.train() when optimize
        # (`linear_separability.py:23-24`).
        model_train = train and unfrozen
        rngs = {'dropout': rng} if (model_train and rng is not None) else None
        c, e, _, _ = model.apply(variables, batch_data, None,
                                 train=model_train, rngs=rngs)
        if not unfrozen:
            c, e = jax.lax.stop_gradient(c), jax.lax.stop_gradient(e)
        losses, accs = criterion.apply({'params': params['criterion']},
                                       c, e, label, train=train)
        return losses, accs

    @jax.jit
    def train_step(params, opt_state, batch_data, label, rng):
        def loss_fn(p):
            losses, accs = forward(p, batch_data, label, True, rng)
            return jnp.sum(losses), (losses, accs)
        grads, (losses, accs) = jax.grad(loss_fn, has_aux=True)(params)
        if not unfrozen:
            grads['model'] = jax.tree.map(jnp.zeros_like, grads['model'])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses, accs

    @jax.jit
    def val_step(params, batch_data, label):
        return forward(params, batch_data, label, False)

    return train_step, val_step


def train_epoch(params, opt_state, train_step, data_loader, rng):
    # Every batch runs, including the ragged tail the uniform sampler can
    # yield — jit retraces once for that one extra shape, which is paid a
    # single time per run (the reference processes every batch too,
    # `linear_separability.py:30-40`).
    #
    # Documented deviation: the reference averages its epoch logs by the
    # LAST enumerate index (n_batches - 1, `linear_separability.py:45,69`),
    # inflating reported loss/acc by n/(n-1); we divide by the true batch
    # count. Best-epoch selection is unaffected (uniform scale).
    logs = {"locLoss_train": 0, "locAcc_train": 0}
    step = 0
    for fulldata in data_loader:
        batch_data, label = fulldata[0], fulldata[1]
        batch_data = jnp.asarray(batch_data[:, 0, 0, :], jnp.float32)
        label = jnp.asarray(np.asarray(label))
        params, opt_state, all_losses, all_acc = train_step(
            params, opt_state, batch_data, label,
            jax.random.fold_in(rng, step))
        logs["locLoss_train"] += np.asarray([float(all_losses.mean())])
        logs["locAcc_train"] += np.asarray([float(all_acc.mean())])
        step += 1
    logs = utils.update_logs(logs, max(step, 1))
    logs["iter"] = step
    return params, opt_state, logs


def val_epoch(params, val_step, data_loader):
    logs = {"locLoss_val": 0, "locAcc_val": 0}
    step = 0
    for fulldata in data_loader:
        batch_data, label = fulldata[0], fulldata[1]
        batch_data = jnp.asarray(batch_data[:, 0, 0, :], jnp.float32)
        label = jnp.asarray(np.asarray(label))
        all_losses, all_acc = val_step(params, batch_data, label)
        logs["locLoss_val"] += np.asarray([float(all_losses.mean())])
        logs["locAcc_val"] += np.asarray([float(all_acc.mean())])
        step += 1
    logs = utils.update_logs(logs, max(step, 1))
    return logs


def run(params, opt_state, train_step_fn, val_step_fn, train_loader,
        val_loader, logs, n_epochs, path_checkpoint, args):
    start_epoch = len(logs["epoch"])
    best_acc = -1
    best_params = None
    start_time = time.time()

    rng = jax.random.PRNGKey(getattr(args, 'random_seed', None) or 0)
    for epoch in range(start_epoch, n_epochs):
        params, opt_state, logs_train = train_epoch(
            params, opt_state, train_step_fn, train_loader,
            jax.random.fold_in(rng, epoch))
        logs_val = val_epoch(params, val_step_fn, val_loader)
        print('')
        print('_' * 50)
        print(f'Ran {epoch + 1} epochs '
              f'in {time.time() - start_time:.2f} seconds')
        utils.show_logs("Training loss", logs_train)
        utils.show_logs("Validation loss", logs_val)
        print('_' * 50)
        print('')

        if logs_val["locAcc_val"] > best_acc:
            best_params = jax.tree.map(np.asarray, params)
            best_acc = logs_val["locAcc_val"]

        logs["epoch"].append(epoch)
        for key, value in dict(logs_train, **logs_val).items():
            if key not in logs:
                logs[key] = [None for _ in range(epoch)]
            if isinstance(value, np.ndarray):
                value = value.tolist()
            logs[key].append(value)

        if (epoch % logs["saveStep"] == 0 and epoch > 0) \
                or epoch == n_epochs - 1:
            model_sd = params_to_torch_state_dict(
                jax.tree.map(np.asarray, params['model']))
            crit_sd = params_to_torch_state_dict(
                jax.tree.map(np.asarray, params['criterion']))
            best_sd = (params_to_torch_state_dict(best_params['model'])
                       if best_params is not None else None)
            save_checkpoint(model_sd, crit_sd, {}, best_sd,
                            f"{path_checkpoint}_{epoch}.pt")
            utils.save_logs(logs, f"{path_checkpoint}_logs.json")
    return params, best_acc


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description='Linear separability trainer'
                    ' (default test in speaker separability)')
    parser.add_argument('pathDB', type=str,
                        help="Path to the directory containing the audio "
                        "data.")
    parser.add_argument('pathTrain', type=str,
                        help="Path to the list of the training sequences.")
    parser.add_argument('pathVal', type=str,
                        help="Path to the list of the test sequences.")
    parser.add_argument('load', type=str, nargs='*',
                        help="Path to the checkpoint to evaluate.")
    parser.add_argument('--pathPhone', type=str, default=None,
                        help="Path to the phone labels. If given, will "
                        "compute the phone separability.")
    parser.add_argument('--CTC', action='store_true',
                        help="Use the CTC loss (for phone separability "
                        "only)")
    parser.add_argument('--pathCheckpoint', type=str, default='out',
                        help="Path of the output directory.")
    parser.add_argument('--nGPU', type=int, default=-1,
                        help='Number of devices. Default=-1, use all')
    parser.add_argument('--batchSizeGPU', type=int, default=8,
                        help='Batch size per device.')
    parser.add_argument('--n_epoch', type=int, default=10)
    parser.add_argument('--debug', action='store_true')
    parser.add_argument('--unfrozen', action='store_true',
                        help="If activated, update the feature network as "
                        "well as the linear classifier")
    parser.add_argument('--no_pretraining', action='store_true',
                        help="If activated, work from an untrained model.")
    parser.add_argument('--file_extension', type=str, default=".flac")
    parser.add_argument('--save_step', type=int, default=-1)
    parser.add_argument('--get_encoded', action='store_true',
                        help="If activated, will work with the output of "
                        "the convolutional encoder.")
    parser.add_argument('--lr', type=float, default=2e-4)
    parser.add_argument('--beta1', type=float, default=0.9)
    parser.add_argument('--beta2', type=float, default=0.999)
    parser.add_argument('--epsilon', type=float, default=2e-8)
    parser.add_argument('--ignore_cache', action='store_true')
    parser.add_argument('--size_window', type=int, default=20480)
    args = parser.parse_args(argv)
    if args.nGPU < 0:
        args.nGPU = len(jax.devices())
    if args.save_step <= 0:
        args.save_step = args.n_epoch
    args.load = [str(Path(x).resolve()) for x in args.load]
    args.pathCheckpoint = str(Path(args.pathCheckpoint).resolve())
    return args


def main(argv):
    args = parse_args(argv)
    logs = {"epoch": [], "iter": [], "saveStep": args.save_step}

    seqNames, speakers = findAllSeqs(args.pathDB,
                                     extension=args.file_extension,
                                     loadCache=not args.ignore_cache)

    bundle, hidden_gar, hidden_encoder = fl.loadModel(
        args.load, loadStateDict=not args.no_pretraining)
    dim_features = hidden_encoder if args.get_encoded else hidden_gar

    phone_labels = None
    if args.pathPhone is not None:
        phone_labels, n_phones = parseSeqLabels(args.pathPhone)
        if not args.CTC:
            print("Running phone separability with aligned phones")
            criterion = PhoneCriterion(dim_encoder=dim_features,
                                       n_phones=n_phones,
                                       on_encoder=args.get_encoded)
        else:
            print("Running phone separability with CTC loss")
            criterion = CTCPhoneCriterion(dim_encoder=dim_features,
                                          n_phones=n_phones,
                                          on_encoder=args.get_encoded)
    else:
        print("Running speaker separability")
        criterion = SpeakerCriterion(dim_encoder=dim_features,
                                     n_speakers=len(speakers))

    seq_train = filterSeqs(args.pathTrain, seqNames)
    seq_val = filterSeqs(args.pathVal, seqNames)
    if args.debug:
        seq_train = seq_train[:1000]
        seq_val = seq_val[:100]

    db_train = AudioBatchData(args.pathDB, args.size_window, seq_train,
                              phone_labels, len(speakers))
    db_val = AudioBatchData(args.pathDB, args.size_window, seq_val,
                            phone_labels, len(speakers))
    batch_size = args.batchSizeGPU * args.nGPU

    train_loader = db_train.getDataLoader(batch_size, "uniform", True,
                                          numWorkers=0)
    val_loader = db_val.getDataLoader(batch_size, 'sequential', False,
                                      numWorkers=0)

    # Criterion init
    from ..models.encoder import encoded_seq_len
    frames = encoded_seq_len(args.size_window)
    c = jnp.zeros((2, frames, hidden_gar), jnp.float32)
    e = jnp.zeros((2, frames, hidden_encoder), jnp.float32)
    if args.pathPhone is not None:
        dummy_label = jnp.zeros((2, frames), jnp.int32)
    else:
        dummy_label = jnp.zeros((2,), jnp.int32)
    crit_vars = criterion.init(jax.random.PRNGKey(1), c, e, dummy_label,
                               train=False)

    params = {'model': bundle.variables['params'],
              'criterion': crit_vars['params']}
    if args.unfrozen:
        print("Working in full fine-tune mode")
    else:
        print("Working with frozen features")

    tx = optax.adam(args.lr, b1=args.beta1, b2=args.beta2, eps=args.epsilon)
    opt_state = tx.init(params)

    train_step_fn, val_step_fn = build_probe_step(bundle.module, criterion,
                                                  tx, args.unfrozen)

    args.pathCheckpoint = Path(args.pathCheckpoint)
    args.pathCheckpoint.mkdir(exist_ok=True)
    args.pathCheckpoint = str(args.pathCheckpoint / "checkpoint")
    with open(f"{args.pathCheckpoint}_args.json", 'w') as f:
        json.dump(vars(args), f, indent=2)

    _, best_acc = run(params, opt_state, train_step_fn, val_step_fn,
                      train_loader, val_loader, logs, args.n_epoch,
                      args.pathCheckpoint, args)
    print(f"Best validation accuracy: {best_acc}")
    return best_acc


if __name__ == "__main__":
    main(sys.argv[1:])
