"""Linear separability probes over frozen (or fine-tuned) CPC features.

Covers the reference's probe trainer (`cpc/eval/linear_separability.py`):
speaker classification, aligned-phone classification, or CTC phone
recognition, each as a linear head trained on top of a loaded CPC
checkpoint. Flags, checkpoint layout (`checkpoint_<n>.pt` +
`checkpoint_args.json` + `checkpoint_logs.json`) and log keys are
reference-compatible.

TPU-first design
----------------
The probe step is one jitted program, data-parallel over the local device
mesh — where the reference wraps the feature maker and criterion in
`DataParallel` (`linear_separability.py:203,223`), here the batch is
committed sharded over a `('data',)` mesh, parameters are replicated, and
XLA's SPMD partitioner inserts the gradient reductions. Losses are computed
as *weighted sums* normalized by the global weight so ragged tail batches
(padded with zero-weight rows) and any device count produce the same
trajectory. Frozen mode runs the feature network under `stop_gradient`, so
XLA prunes its backward pass entirely.
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

# CLI parity surface: reference `linear_separability.py:123-188` (names,
# defaults, help); the table form and everything downstream are ours.
_FLAGS = [
    (('pathDB',), dict(type=str, help="Audio corpus root.")),
    (('pathTrain',), dict(type=str, help="Training sequence list.")),
    (('pathVal',), dict(type=str, help="Validation sequence list.")),
    (('load',), dict(type=str, nargs='*', help="CPC checkpoint(s) to "
                     "probe.")),
    (('--pathPhone',), dict(type=str, default=None,
                            help="Aligned phone labels; switches the probe "
                            "from speaker to phone separability.")),
    (('--CTC',), dict(action='store_true',
                      help="CTC loss instead of aligned-phone CE.")),
    (('--pathCheckpoint',), dict(type=str, default='out',
                                 help="Output directory.")),
    (('--nGPU',), dict(type=int, default=-1,
                       help="Device count; -1 = all local devices.")),
    (('--batchSizeGPU',), dict(type=int, default=8,
                               help="Windows per device.")),
    (('--n_epoch',), dict(type=int, default=10)),
    (('--debug',), dict(action='store_true')),
    (('--unfrozen',), dict(action='store_true',
                           help="Fine-tune the feature network under the "
                           "probe loss instead of freezing it.")),
    (('--no_pretraining',), dict(action='store_true',
                                 help="Probe a randomly initialized "
                                 "model.")),
    (('--file_extension',), dict(type=str, default=".flac")),
    (('--save_step',), dict(type=int, default=-1)),
    (('--get_encoded',), dict(action='store_true',
                              help="Probe the convolutional encoder output "
                              "instead of the context.")),
    (('--lr',), dict(type=float, default=2e-4)),
    (('--beta1',), dict(type=float, default=0.9)),
    (('--beta2',), dict(type=float, default=0.999)),
    (('--epsilon',), dict(type=float, default=2e-8)),
    (('--ignore_cache',), dict(action='store_true')),
    (('--size_window',), dict(type=int, default=20480)),
]


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description='Linear separability trainer'
                    ' (default test in speaker separability)')
    for flags, kw in _FLAGS:
        parser.add_argument(*flags, **kw)
    args = parser.parse_args(argv)
    if args.nGPU < 0:
        args.nGPU = len(jax.devices())
    if args.save_step <= 0:
        args.save_step = args.n_epoch
    args.load = [str(Path(x).resolve()) for x in args.load]
    args.pathCheckpoint = str(Path(args.pathCheckpoint).resolve())
    return args


# ---------------------------------------------------------------------------
# probe task assembly
# ---------------------------------------------------------------------------

def select_probe(args, dim_features, n_speakers, n_phones):
    """Choose the probe head + label mode from the flags. Returns
    (criterion, per_frame_labels)."""
    if args.pathPhone is None:
        print("Running speaker separability")
        return SpeakerCriterion(dim_encoder=dim_features,
                                n_speakers=n_speakers), False
    if args.CTC:
        print("Running phone separability with CTC loss")
        return CTCPhoneCriterion(dim_encoder=dim_features,
                                 n_phones=n_phones,
                                 on_encoder=args.get_encoded), True
    print("Running phone separability with aligned phones")
    return PhoneCriterion(dim_encoder=dim_features, n_phones=n_phones,
                          on_encoder=args.get_encoded), True


class ProbeSteps:
    """Jitted, mesh-sharded train/val steps for one probe task.

    Losses/accuracies come back as weighted sums over the (sharded) batch
    normalized by the global example weight — with all-ones weights this is
    the plain batch mean; pad rows (weight 0) contribute nothing, which is
    what makes the trajectory independent of the device count.
    """

    def __init__(self, model, criterion, tx, unfrozen, mesh):
        self._mesh = mesh
        self._n_dev = 1 if mesh is None else mesh.devices.size
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import batch_pspec, data_axes
            self._shard_audio = NamedSharding(mesh, batch_pspec(mesh, 2))
            self._shard_vec = {
                1: NamedSharding(mesh, PartitionSpec(data_axes(mesh))),
                2: NamedSharding(mesh, batch_pspec(mesh, 2))}

        def probe_forward(params, audio, label, w, train, rng):
            run_model_in_train = train and unfrozen
            rngs = ({'dropout': rng}
                    if (run_model_in_train and rng is not None) else None)
            c, e, _, _ = model.apply({'params': params['model']}, audio,
                                     None, train=run_model_in_train,
                                     rngs=rngs)
            if not unfrozen:
                c = jax.lax.stop_gradient(c)
                e = jax.lax.stop_gradient(e)
            loss_sum, acc_sum = criterion.apply(
                {'params': params['criterion']}, c, e, label, train=train,
                example_weights=w)
            denom = jnp.sum(w)
            return loss_sum / denom, acc_sum / denom

        @jax.jit
        def train_step(params, opt_state, audio, label, w, rng):
            def objective(p):
                loss, acc = probe_forward(p, audio, label, w, True, rng)
                return jnp.sum(loss), (loss, acc)
            grads, (loss, acc) = jax.grad(objective, has_aux=True)(params)
            if not unfrozen:
                grads['model'] = jax.tree.map(jnp.zeros_like,
                                              grads['model'])
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        @jax.jit
        def val_step(params, audio, label, w):
            return probe_forward(params, audio, label, w, False, None)

        self._train = train_step
        self._val = val_step

    def _stage(self, raw_batch, raw_label):
        """Host (B, 2, 1, W) batch -> committed (audio, label, weights),
        padded to a device-divisible batch when the mesh is active."""
        audio = np.asarray(raw_batch)[:, 0, 0, :].astype(np.float32)
        label = np.asarray(raw_label)
        if self._mesh is None:
            return (jnp.asarray(audio), jnp.asarray(label),
                    jnp.ones((audio.shape[0],), jnp.float32))
        from ..parallel.mesh import pad_rows
        audio, label, w = pad_rows(audio, label, multiple=self._n_dev)
        return (jax.device_put(audio, self._shard_audio),
                jax.device_put(label, self._shard_vec[label.ndim]),
                jax.device_put(w, self._shard_vec[1]))

    def train_batch(self, params, opt_state, raw_batch, raw_label, rng):
        audio, label, w = self._stage(raw_batch, raw_label)
        return self._train(params, opt_state, audio, label, w, rng)

    def val_batch(self, params, raw_batch, raw_label):
        audio, label, w = self._stage(raw_batch, raw_label)
        return self._val(params, audio, label, w)


# ---------------------------------------------------------------------------
# epoch driver
# ---------------------------------------------------------------------------

def _sweep(steps, params, opt_state, loader, rng, tag):
    """One pass over a loader; returns (params, opt_state, epoch logs).
    Every batch runs, including ragged tails (zero-weight padded). Epoch
    logs divide by the true batch count — documented deviation: the
    reference divides by the last enumerate index
    (`linear_separability.py:45,69`), inflating reported numbers by
    n/(n-1); best-epoch selection is unaffected (uniform scale)."""
    training = rng is not None
    loss_total, acc_total, batches = 0.0, 0.0, 0
    for batch_data in loader:
        raw, label = batch_data[0], batch_data[1]
        if training:
            params, opt_state, loss, acc = steps.train_batch(
                params, opt_state, raw, label,
                jax.random.fold_in(rng, batches))
        else:
            loss, acc = steps.val_batch(params, raw, label)
        loss_total += float(np.asarray(loss).mean())
        acc_total += float(np.asarray(acc).mean())
        batches += 1
    n = max(batches, 1)
    logs = {f"locLoss_{tag}": np.asarray([loss_total / n]),
            f"locAcc_{tag}": np.asarray([acc_total / n])}
    if training:
        logs["iter"] = batches
    return params, opt_state, logs


def _save_probe_checkpoint(params, best_params, path_prefix, epoch):
    model_sd = params_to_torch_state_dict(
        jax.tree.map(np.asarray, params['model']))
    crit_sd = params_to_torch_state_dict(
        jax.tree.map(np.asarray, params['criterion']))
    best_sd = (params_to_torch_state_dict(best_params['model'])
               if best_params is not None else None)
    save_checkpoint(model_sd, crit_sd, {}, best_sd,
                    f"{path_prefix}_{epoch}.pt")


def run(steps, params, opt_state, train_loader, val_loader, logs, n_epochs,
        path_prefix, seed):
    best_acc, best_params = -1.0, None
    rng = jax.random.PRNGKey(seed)
    t0 = time.time()

    for epoch in range(len(logs["epoch"]), n_epochs):
        params, opt_state, train_logs = _sweep(
            steps, params, opt_state, train_loader,
            jax.random.fold_in(rng, epoch), "train")
        _, _, val_logs = _sweep(steps, params, None, val_loader, None, "val")

        print('')
        print('_' * 50)
        print(f'Ran {epoch + 1} epochs in {time.time() - t0:.2f} seconds')
        utils.show_logs("Training loss", train_logs)
        utils.show_logs("Validation loss", val_logs)
        print('_' * 50)
        print('')

        if val_logs["locAcc_val"] > best_acc:
            best_acc = val_logs["locAcc_val"]
            best_params = jax.tree.map(np.asarray, params)

        logs["epoch"].append(epoch)
        for key, value in dict(train_logs, **val_logs).items():
            if key not in logs:
                logs[key] = [None] * epoch
            logs[key].append(value.tolist()
                             if isinstance(value, np.ndarray) else value)

        is_save_epoch = (epoch % logs["saveStep"] == 0 and epoch > 0)
        if is_save_epoch or epoch == n_epochs - 1:
            _save_probe_checkpoint(params, best_params, path_prefix, epoch)
            utils.save_logs(logs, f"{path_prefix}_logs.json")
    return params, best_acc


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def _criterion_init(criterion, args, hidden_gar, hidden_encoder,
                    per_frame_labels):
    from ..models.encoder import encoded_seq_len
    frames = encoded_seq_len(args.size_window)
    c = jnp.zeros((2, frames, hidden_gar), jnp.float32)
    e = jnp.zeros((2, frames, hidden_encoder), jnp.float32)
    label_shape = (2, frames) if per_frame_labels else (2,)
    return criterion.init(jax.random.PRNGKey(1), c, e,
                          jnp.zeros(label_shape, jnp.int32), train=False)


def main(argv):
    args = parse_args(argv)
    logs = {"epoch": [], "iter": [], "saveStep": args.save_step}

    seqNames, speakers = findAllSeqs(args.pathDB,
                                     extension=args.file_extension,
                                     loadCache=not args.ignore_cache)

    bundle, hidden_gar, hidden_encoder = fl.loadModel(
        args.load, loadStateDict=not args.no_pretraining)
    dim_features = hidden_encoder if args.get_encoded else hidden_gar

    phone_labels, n_phones = (None, 0)
    if args.pathPhone is not None:
        phone_labels, n_phones = parseSeqLabels(args.pathPhone)
    criterion, per_frame_labels = select_probe(args, dim_features,
                                               len(speakers), n_phones)

    seq_train = filterSeqs(args.pathTrain, seqNames)
    seq_val = filterSeqs(args.pathVal, seqNames)
    if args.debug:
        seq_train, seq_val = seq_train[:1000], seq_val[:100]

    db_train = AudioBatchData(args.pathDB, args.size_window, seq_train,
                              phone_labels, len(speakers))
    db_val = AudioBatchData(args.pathDB, args.size_window, seq_val,
                            phone_labels, len(speakers))
    batch_size = args.batchSizeGPU * args.nGPU
    train_loader = db_train.getDataLoader(batch_size, "uniform", True,
                                          numWorkers=0)
    val_loader = db_val.getDataLoader(batch_size, 'sequential', False,
                                      numWorkers=0)

    crit_vars = _criterion_init(criterion, args, hidden_gar, hidden_encoder,
                                per_frame_labels)
    params = {'model': bundle.variables['params'],
              'criterion': crit_vars['params']}
    print("Working in full fine-tune mode" if args.unfrozen
          else "Working with frozen features")

    tx = optax.adam(args.lr, b1=args.beta1, b2=args.beta2, eps=args.epsilon)
    opt_state = tx.init(params)

    # Data-parallel probe over the local devices (the reference's
    # DataParallel wrap of feature maker + criterion,
    # `linear_separability.py:203,223`).
    mesh = None
    if jax.process_count() == 1 and min(args.nGPU,
                                        len(jax.local_devices())) > 1:
        from ..parallel.mesh import eval_mesh
        mesh = eval_mesh(jax.local_devices()[:args.nGPU])
        from ..parallel.mesh import replicate
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        print(f"Probing over {mesh.devices.size} devices")
    steps = ProbeSteps(bundle.module, criterion, tx, args.unfrozen, mesh)

    out_dir = Path(args.pathCheckpoint)
    out_dir.mkdir(exist_ok=True)
    path_prefix = str(out_dir / "checkpoint")
    with open(f"{path_prefix}_args.json", 'w') as f:
        json.dump(vars(args), f, indent=2)

    _, best_acc = run(steps, params, opt_state, train_loader, val_loader,
                      logs, args.n_epoch, path_prefix, 0)
    print(f"Best validation accuracy: {best_acc}")
    return best_acc


if __name__ == "__main__":
    main(sys.argv[1:])
