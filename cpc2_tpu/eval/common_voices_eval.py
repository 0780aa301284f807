"""Whole-utterance CTC phone recognition + PER evaluation
(reference `cpc/eval/common_voices_eval.py`).

Train a CTC phone classifier (strided-conv head, optional LSTM) over frozen
or fine-tuned CPC features on variable-length utterances, then compute the
phone error rate via host-side beam search.

jit strategy: utterances are padded to the dataset-wide max length (as in the
reference's `SingleSequenceDataset`), so every batch has one static shape.

Run: `python -m cpc2_tpu.eval.common_voices_eval train <pathDB> <pathPhone>
<cpc_ckpt> [...]` then `... per <output_dir>`
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
import time
from copy import deepcopy
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..data.audio_io import load_audio
from ..data.corpus import filterSeqs, findAllSeqs, parseSeqLabels
from ..losses.seq_alignment import beam_search, get_seq_PER
from ..models.ar import _StackedRNN
from ..models.encoder import Conv1d

Array = jax.Array


def load(path_item):
    path_item = Path(path_item)
    seq_name, seq_ext = path_item.stem, path_item.suffix
    if seq_ext == '.npy':
        data = np.load(str(path_item)).astype(np.float32)
        data = data.reshape(data.shape[0], data.shape[1]).T
    else:
        wav, _sr = load_audio(str(path_item))
        data = np.asarray(wav, np.float32).reshape(1, -1)
    return seq_name, data


class SingleSequenceDataset:
    """Whole-utterance padded dataset
    (reference `common_voices_eval.py:39-144`)."""

    def __init__(self, pathDB, seqNames, phoneLabelsDict, inDim=1,
                 transpose=True, random_offset_amplitude=80, transform=None):
        self.seqNames = deepcopy(seqNames)
        self.pathDB = pathDB
        self.phoneLabelsDict = deepcopy(phoneLabelsDict)
        self.inDim = inDim
        self.transpose = transpose
        self.random_offset_amplitude = random_offset_amplitude
        self.transform = transform
        self.loadSeqs()

    def loadSeqs(self):
        self.seqOffset = [0]
        self.phoneLabels = []
        self.phoneOffsets = [0]
        self.maxSize = 0
        self.maxSizePhone = 0
        start_time = time.time()
        to_load = [Path(self.pathDB) / x for _, x in self.seqNames]
        pool_data = sorted(load(p) for p in to_load)
        tmp_data = []
        tot_size = 0
        min_size_phone = float('inf')
        for seq_name, seq in pool_data:
            self.phoneLabels += self.phoneLabelsDict[seq_name]
            self.phoneOffsets.append(len(self.phoneLabels))
            self.maxSizePhone = max(self.maxSizePhone,
                                    len(self.phoneLabelsDict[seq_name]))
            min_size_phone = min(min_size_phone,
                                 len(self.phoneLabelsDict[seq_name]))
            size_seq = seq.shape[1]
            self.maxSize = max(self.maxSize, size_seq)
            tot_size += size_seq
            tmp_data.append(seq)
            self.seqOffset.append(self.seqOffset[-1] + size_seq)
        self.data = np.concatenate(tmp_data, axis=1)
        self.phoneLabels = np.asarray(self.phoneLabels, np.int64)
        print(f'Loaded {len(self.phoneOffsets)} sequences '
              f'in {time.time() - start_time:.2f} seconds')
        print(f'maxSizeSeq : {self.maxSize}')
        print(f'maxSizePhone : {self.maxSizePhone}')
        print(f"minSizePhone : {min_size_phone}")
        print(f'Total size dataset {tot_size / (16000 * 3600)} hours')

    def __getitem__(self, idx):
        offset_start = self.seqOffset[idx]
        offset_end = self.seqOffset[idx + 1]
        phone_start = self.phoneOffsets[idx]
        phone_end = self.phoneOffsets[idx + 1]
        size_seq = int(offset_end - offset_start)
        size_phone = int(phone_end - phone_start)

        out_seq = np.zeros((self.inDim, self.maxSize), np.float32)
        out_phone = np.zeros(self.maxSizePhone, np.int64)
        offset = 0
        if self.random_offset_amplitude > 0:
            offset = random.randint(0, self.random_offset_amplitude)
            size_seq -= offset
        out_seq[:, :size_seq] = self.data[:, offset_start + offset:offset_end]
        out_phone[:size_phone] = self.phoneLabels[phone_start:phone_end]
        if self.transform is not None:
            out_seq = self.transform(out_seq)
        return out_seq, size_seq, out_phone, size_phone

    def __len__(self):
        return len(self.seqOffset) - 1

    def batches(self, batch_size, shuffle=True):
        # Ragged tail batches run too, like the reference's DataLoader with
        # the default drop_last=False (`common_voices_eval.py:561,591`).
        order = list(range(len(self)))
        if shuffle:
            random.shuffle(order)
        for i in range(0, len(order), batch_size):
            items = [self[j] for j in order[i:i + batch_size]]
            seq = np.stack([x[0] for x in items])
            size_seq = np.asarray([x[1] for x in items], np.int32)
            phone = np.stack([x[2] for x in items])
            size_phone = np.asarray([x[3] for x in items], np.int32)
            yield seq, size_seq, phone, size_phone

    def n_batches(self, batch_size):
        return -(-len(self) // batch_size)


class CTCPhoneCriterionCV(nn.Module):
    """CTC classifier head (reference `common_voices_eval.py:147-213`):
    optional LSTM, strided Conv1d (k=sizeKernel, stride=k//2) down x4,
    optional masked per-utterance seqNorm, CTC with blank=nPhones."""
    dim_encoder: int
    n_phones: int
    use_lstm: bool = False
    size_kernel: int = 8
    seq_norm: bool = False
    dropout: bool = False
    reduction: str = 'sum'

    @property
    def blank_label(self):
        return self.n_phones

    @nn.compact
    def get_prediction(self, c_feature: Array, feature_size: Array,
                       train: bool = False) -> Array:
        b, s, h = c_feature.shape
        if self.seq_norm:
            mask = (jnp.arange(s)[None, :]
                    < feature_size[:, None])[..., None]
            n = jnp.maximum(feature_size[:, None, None], 1)
            m = jnp.sum(jnp.where(mask, c_feature, 0.0), axis=1,
                        keepdims=True) / n
            # unbiased variance over the valid frames (torch .var default)
            v = jnp.sum(jnp.where(mask, jnp.square(c_feature - m), 0.0),
                        axis=1, keepdims=True) / jnp.maximum(n - 1, 1)
            c_feature = (c_feature - m) / jnp.sqrt(v + 1e-8)
        if self.use_lstm:
            lstm = _StackedRNN(self.dim_encoder, self.dim_encoder, 1, 'LSTM',
                               name='conv1')
            c_feature, _ = lstm(c_feature)
        if self.dropout:
            from ..models.layers import Dropout
            c_feature = Dropout(0.5, name='drop')(c_feature, not train)
        conv = Conv1d(self.n_phones + 1, self.size_kernel,
                      self.size_kernel // 2, 0,
                      name='PhoneCriterionClassifier')
        return conv(c_feature)

    def __call__(self, c_feature: Array, feature_size: Array, label: Array,
                 label_size: Array, train: bool = True,
                 example_weights=None) -> Array:
        logits = self.get_prediction(c_feature, feature_size, train)
        feature_size = feature_size // 4
        feature_size = jnp.clip(feature_size, 0, logits.shape[1])
        logit_paddings = (jnp.arange(logits.shape[1])[None, :]
                          >= feature_size[:, None]).astype(jnp.float32)
        label_paddings = (jnp.arange(label.shape[1])[None, :]
                          >= label_size[:, None]).astype(jnp.float32)
        loss = optax.ctc_loss(logits, logit_paddings, label, label_paddings,
                              blank_id=self.blank_label)
        # torch zero_infinity=True parity: a sample whose target cannot be
        # aligned (label length + adjacent repeats > valid logit frames)
        # contributes 0 — optax reports such samples as large FINITE
        # values, not inf, so the feasibility test is explicit.
        valid = jnp.arange(label.shape[1])[None, :] < label_size[:, None]
        repeats = jnp.sum((label[:, 1:] == label[:, :-1]) & valid[:, 1:],
                          axis=1)
        feasible = feature_size >= label_size + repeats
        loss = jnp.where(feasible & jnp.isfinite(loss), loss, 0.0)
        if self.reduction == 'mean':
            # torch CTCLoss reduction='mean' parity: each sample's loss is
            # divided by its target length before the batch mean
            # (reduction='sum' is a plain sum in both).
            sizes = jnp.maximum(label_size.astype(loss.dtype), 1)
            loss = loss / sizes
        if example_weights is not None:
            # pad-and-mask form for the mesh-sharded eval: zero-weight rows
            # (whose all-blank CTC path is NOT zero-loss) contribute
            # nothing; 'mean' normalizes by the real-example count.
            ew = example_weights.astype(loss.dtype)
            total = jnp.sum(loss * ew)
            if self.reduction == 'mean':
                total = total / jnp.maximum(jnp.sum(ew), 1.0)
            return total.reshape(1, -1)
        if self.reduction == 'mean':
            return jnp.mean(loss).reshape(1, -1)
        return jnp.sum(loss).reshape(1, -1)


class IDModule(nn.Module):
    """Pre-computed feature passthrough
    (reference `common_voices_eval.py:215-222`)."""

    @nn.compact
    def __call__(self, feature, label=None, hidden=None, train=True,
                 mask_indices=None):
        # (B, C, S) -> (B, S, C)
        return jnp.transpose(feature, (0, 2, 1)), None, None, None


class CVSteps:
    """Jitted CTC-eval steps, data-parallel over the local device mesh.

    The reference DataParallel-izes both the CPC feature model and the CTC
    head (`common_voices_eval.py:542,549`); here batches commit sharded over
    the mesh, parameters replicated, and the weighted loss (pad rows carry
    weight 0) keeps the trajectory identical at any device count — ragged
    tail batches included.
    """

    def __init__(self, model, criterion, tx, freeze: bool, mesh=None):
        self._mesh = mesh
        self._n_dev = 1 if mesh is None else mesh.devices.size
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import batch_pspec, data_axes
            self._shardings = {
                nd: NamedSharding(mesh, batch_pspec(mesh, nd))
                for nd in (2, 3)}
            self._shardings[1] = NamedSharding(
                mesh, PartitionSpec(data_axes(mesh)))

        def forward(params, seq, size_seq, phone, size_phone, w, train,
                    rng=None):
            # --freeze runs the feature net in eval mode with detached
            # features; unfrozen training puts it in train mode, like the
            # reference's `model.train()` when `model.optimize`
            # (`common_voices_eval.py:248-249,568-571`).
            model_train = train and not freeze
            m_rng = c_rng = None
            if train and rng is not None:
                m_rng, c_rng = jax.random.split(rng)
            c, _, _, _ = model.apply(
                {'params': params['model']}, seq, None, train=model_train,
                rngs={'dropout': m_rng} if m_rng is not None else None)
            if freeze:
                c = jax.lax.stop_gradient(c)
            # criterion.train() is unconditional in the reference train_step
            # (`common_voices_eval.py:251`), so --dropout is active here.
            return criterion.apply(
                {'params': params['criterion']}, c, size_seq, phone,
                size_phone, train=train, example_weights=w,
                rngs={'dropout': c_rng} if c_rng is not None else None)

        @jax.jit
        def train_step(params, opt_state, seq, size_seq, phone, size_phone,
                       w, rng):
            def loss_fn(p):
                return jnp.mean(forward(p, seq, size_seq, phone, size_phone,
                                        w, True, rng))
            loss, grads = jax.value_and_grad(loss_fn)(params)
            if freeze:
                grads['model'] = jax.tree.map(jnp.zeros_like,
                                              grads['model'])
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def val_step(params, seq, size_seq, phone, size_phone, w):
            return jnp.mean(forward(params, seq, size_seq, phone,
                                    size_phone, w, False))

        @jax.jit
        def predict_step(params, seq, size_seq):
            c, _, _, _ = model.apply({'params': params['model']}, seq, None,
                                     train=False)
            logits = criterion.apply({'params': params['criterion']}, c,
                                     size_seq, train=False,
                                     method=criterion.get_prediction)
            return jax.nn.softmax(logits, axis=2)

        self._train = train_step
        self._val = val_step
        self._predict = predict_step

    def _stage(self, *arrays):
        """Pad host batches to a device-divisible size and commit them;
        returns (*staged, weights)."""
        if self._mesh is None:
            return (*[jnp.asarray(a) for a in arrays],
                    jnp.ones((arrays[0].shape[0],), jnp.float32))
        from ..parallel.mesh import pad_rows
        padded = pad_rows(*[np.asarray(a) for a in arrays],
                          multiple=self._n_dev)
        return tuple(jax.device_put(a, self._shardings[a.ndim])
                     for a in padded)

    def train_batch(self, params, opt_state, seq, size_seq, phone,
                    size_phone, rng):
        seq, size_seq, phone, size_phone, w = self._stage(
            seq, size_seq, phone, size_phone)
        return self._train(params, opt_state, seq, size_seq, phone,
                           size_phone, w, rng)

    def val_batch(self, params, seq, size_seq, phone, size_phone):
        seq, size_seq, phone, size_phone, w = self._stage(
            seq, size_seq, phone, size_phone)
        return self._val(params, seq, size_seq, phone, size_phone, w)

    def predict_batch(self, params, seq, size_seq):
        n = seq.shape[0]
        seq, size_seq, _w = self._stage(seq, size_seq)
        return np.asarray(self._predict(params, seq, size_seq))[:n]


def build_cv_steps(model, criterion, tx, freeze: bool, mesh=None):
    """Compatibility wrapper over `CVSteps` returning the three raw-batch
    callables."""
    steps = CVSteps(model, criterion, tx, freeze, mesh)
    return steps.train_batch, steps.val_batch, steps.predict_batch


def get_per(data):
    """(reference `common_voices_eval.py:294-301`)."""
    pred, size_pred, gt, size_gt, blank_label = data
    l_ = min(int(size_pred) // 4, pred.shape[0])
    p_ = pred[:l_].reshape(l_, -1)
    gt_seq = gt[:int(size_gt)].reshape(-1).tolist()
    pred_seq = beam_search(p_, 20, blank_label)[0][1]
    return get_seq_PER(gt_seq, pred_seq)


def per_step(dataset, params, predict_step, blank_label, batch_size,
             downsampling_factor):
    avg_per, var_per, n_items = 0.0, 0.0, 0
    print("Starting the PER computation through beam search")
    for seq, size_seq, phone, size_phone in dataset.batches(batch_size,
                                                            shuffle=False):
        seq_in = seq[:, 0, :] if seq.shape[1] == 1 else seq
        feat_size = size_seq // downsampling_factor
        predictions = np.asarray(predict_step(params, seq_in, feat_size))
        for b in range(seq.shape[0]):
            score = get_per((predictions[b], size_seq[b]
                             // downsampling_factor, phone[b], size_phone[b],
                             blank_label))
            avg_per += score
            var_per += score * score
            n_items += 1
    avg_per /= n_items
    var_per = var_per / n_items - avg_per ** 2
    print(f"Average PER {avg_per}")
    print(f"Standard deviation PER {math.sqrt(max(var_per, 0))}")
    return avg_per


def run_training(dataset_train, dataset_val, params, tx, opt_state,
                 train_step, val_step, batch_size, n_epochs,
                 path_checkpoint, args_ns):
    print(f"Starting the training for {n_epochs} epochs")
    best_loss = float('inf')
    rng = jax.random.PRNGKey(0)
    step_idx = 0
    for epoch in range(n_epochs):
        tot, n = 0.0, 0
        for seq, size_seq, phone, size_phone in dataset_train.batches(
                batch_size):
            seq_in = seq[:, 0, :] if seq.shape[1] == 1 else seq
            params, opt_state, loss = train_step(
                params, opt_state, seq_in, size_seq // 160, phone,
                size_phone, jax.random.fold_in(rng, step_idx))
            step_idx += 1
            tot += float(loss)
            n += 1
        print(f"Epoch {epoch} loss train : {tot / max(n, 1)}")

        tot, n = 0.0, 0
        for seq, size_seq, phone, size_phone in dataset_val.batches(
                batch_size, shuffle=False):
            seq_in = seq[:, 0, :] if seq.shape[1] == 1 else seq
            loss = val_step(params, seq_in, size_seq // 160, phone,
                            size_phone)
            tot += float(loss)
            n += 1
        loss_val = tot / max(n, 1)
        print(f"Epoch {epoch} loss val : {loss_val}")
        if loss_val < best_loss:
            best_loss = loss_val
            from ..io.torch_ckpt import params_to_torch_state_dict
            import torch
            state_dict = {
                'classifier': params_to_torch_state_dict(
                    jax.tree.map(np.asarray, params['criterion'])),
                'model': params_to_torch_state_dict(
                    jax.tree.map(np.asarray, params['model'])),
                'bestLoss': best_loss}
            torch.save(state_dict, path_checkpoint)
    return params


def _local_eval_mesh():
    """Data mesh over the local devices (None single-device/multi-process),
    the analogue of the reference's DataParallel wrap of the CTC model
    (`common_voices_eval.py:542,549`)."""
    if jax.process_count() > 1 or len(jax.local_devices()) <= 1:
        return None
    from ..parallel.mesh import eval_mesh
    return eval_mesh()


def get_PER_args(args):
    path_args_training = os.path.join(args.output, "args_training.json")
    with open(path_args_training, 'rb') as f:
        data = json.load(f)
    if args.pathDB is None:
        args.pathDB = data["pathDB"]
        args.file_extension = data["file_extension"]
    if args.pathVal is None and args.pathPhone is None:
        args.pathPhone = data["pathPhone"]
        args.pathVal = data["pathVal"]
    args.pathCheckpoint = data["pathCheckpoint"]
    args.no_pretraining = data["no_pretraining"]
    args.LSTM = data.get("LSTM", False)
    args.seqNorm = data.get("seqNorm", False)
    args.dropout = data.get("dropout", False)
    args.in_dim = data.get("in_dim", 1)
    args.loss_reduction = data.get("loss_reduction", "mean")
    return args


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description='Simple phone recognition pipeline for the common '
                    'voices datasets')
    subparsers = parser.add_subparsers(dest='command')

    parser_train = subparsers.add_parser('train')
    parser_train.add_argument('pathDB', type=str)
    parser_train.add_argument('pathPhone', type=str)
    parser_train.add_argument('pathCheckpoint', type=str,
                              help='Path to the CPC checkpoint to load. Set '
                              'to ID to work with pre-computed features.')
    parser_train.add_argument('--freeze', action='store_true')
    parser_train.add_argument('--pathTrain', default=None, type=str)
    parser_train.add_argument('--pathVal', default=None, type=str)
    parser_train.add_argument('--file_extension', type=str, default=".mp3")
    parser_train.add_argument('--batchSize', type=int, default=8)
    parser_train.add_argument('--nEpochs', type=int, default=30)
    parser_train.add_argument('--beta1', type=float, default=0.9)
    parser_train.add_argument('--beta2', type=float, default=0.999)
    parser_train.add_argument('--epsilon', type=float, default=1e-08)
    parser_train.add_argument('--lr', type=float, default=2e-04)
    parser_train.add_argument('-o', '--output', type=str, default='out')
    parser_train.add_argument('--debug', action='store_true')
    parser_train.add_argument('--no_pretraining', action='store_true')
    parser_train.add_argument('--LSTM', action='store_true')
    parser_train.add_argument('--seqNorm', action='store_true')
    parser_train.add_argument('--kernelSize', type=int, default=8)
    parser_train.add_argument('--dropout', action='store_true')
    parser_train.add_argument('--in_dim', type=int, default=1)
    parser_train.add_argument('--loss_reduction', type=str, default='mean',
                              choices=['mean', 'sum'])
    parser_train.add_argument('--roffset', type=int, default=0)
    parser_train.add_argument('-a', '--augments', type=json.loads, nargs='*',
                              default=None)
    parser_train.add_argument('--t_ms', type=int, default=100)

    parser_per = subparsers.add_parser('per')
    parser_per.add_argument('output', type=str)
    parser_per.add_argument('--batchSize', type=int, default=8)
    parser_per.add_argument('--debug', action='store_true')
    parser_per.add_argument('--pathDB', type=str, default=None)
    parser_per.add_argument('--pathVal', type=str, default=None)
    parser_per.add_argument('--pathPhone', default=None, type=str)
    parser_per.add_argument('--file_extension', type=str, default=".mp3")
    parser_per.add_argument('--name', type=str, default="0")
    return parser.parse_args(argv)


def main(argv):
    from .. import feature_loader as fl

    args = parse_args(argv)
    random.seed()
    if args.command == 'per':
        args = get_PER_args(args)

    if not os.path.isdir(args.output):
        os.mkdir(args.output)

    phoneLabels, nPhones = parseSeqLabels(args.pathPhone)
    inSeqs, _ = findAllSeqs(args.pathDB, extension=args.file_extension,
                            loadCache=False)

    if args.command == 'train' and args.pathTrain is not None:
        seqTrain = filterSeqs(args.pathTrain, inSeqs)
    else:
        seqTrain = inSeqs

    if args.pathVal is None and args.command == 'train':
        random.shuffle(seqTrain)
        sizeTrain = int(0.9 * len(seqTrain))
        seqTrain, seqVal = seqTrain[:sizeTrain], seqTrain[sizeTrain:]
    elif args.pathVal is not None:
        seqVal = filterSeqs(args.pathVal, inSeqs)
    else:
        seqVal = inSeqs

    if args.debug:
        seqVal = seqVal[:100]

    downsampling_factor = 160
    if args.pathCheckpoint == 'ID':
        downsampling_factor = 1
        module = IDModule()
        variables = {'params': {}}
        hiddenGar = args.in_dim
    else:
        bundle, hiddenGar, _ = fl.loadModel(
            [args.pathCheckpoint], loadStateDict=not args.no_pretraining)
        module = bundle.module
        variables = bundle.variables

    criterion = CTCPhoneCriterionCV(dim_encoder=hiddenGar, n_phones=nPhones,
                                    use_lstm=args.LSTM,
                                    size_kernel=args.kernelSize
                                    if hasattr(args, 'kernelSize') else 8,
                                    seq_norm=args.seqNorm,
                                    dropout=args.dropout,
                                    reduction=args.loss_reduction)

    print(f"Loading the validation dataset at {args.pathDB}")
    transform = None
    datasetVal = SingleSequenceDataset(args.pathDB, seqVal, phoneLabels,
                                       inDim=args.in_dim,
                                       random_offset_amplitude=0,
                                       transform=transform)

    pathCheckpoint = os.path.join(args.output, 'checkpoint.pt')

    frames = max(datasetVal.maxSize // downsampling_factor, 8)
    crit_vars = criterion.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        jnp.zeros((2, frames, hiddenGar)), jnp.ones((2,), jnp.int32) * 8,
        jnp.zeros((2, 8), jnp.int32), jnp.ones((2,), jnp.int32), train=False)

    params = {'model': variables['params'],
              'criterion': crit_vars['params']}

    if args.command == 'train':
        if args.debug:
            random.shuffle(seqTrain)
            seqTrain = seqTrain[:1000]
            seqVal = seqVal[:100]
        print(f"Loading the training dataset at {args.pathDB}")
        transform = None
        if args.augments is not None:
            from ..data.augmentation import AugmentCfg, CombinedTransforms
            augment_cfgs = [AugmentCfg(**cfg) for cfg in args.augments]
            transform = CombinedTransforms(augment_cfgs)
        datasetTrain = SingleSequenceDataset(
            args.pathDB, seqTrain, phoneLabels, inDim=args.in_dim,
            random_offset_amplitude=args.roffset, transform=transform)

        # AdamW, lower LR for the feature network in fine-tune mode
        if not args.freeze:
            import optax as _optax
            tx = _optax.multi_transform(
                {'criterion': _optax.adamw(args.lr, b1=args.beta1,
                                           b2=args.beta2, eps=args.epsilon),
                 'model': _optax.adamw(args.lr / 10, b1=args.beta1,
                                       b2=args.beta2, eps=args.epsilon)},
                lambda p: {'model': 'model', 'criterion': 'criterion'})
        else:
            tx = optax.adamw(args.lr, b1=args.beta1, b2=args.beta2,
                             eps=args.epsilon)
        opt_state = tx.init(params)
        mesh = _local_eval_mesh()
        if mesh is not None:
            from ..parallel.mesh import replicate
            params = replicate(mesh, params)
            opt_state = replicate(mesh, opt_state)
            print(f"CTC eval over {mesh.devices.size} devices")
        train_step, val_step, predict_step = build_cv_steps(
            module, criterion, tx, args.freeze, mesh)

        with open(os.path.join(args.output, "args_training.json"), 'w') as f:
            json.dump(vars(args), f, indent=2)

        run_training(datasetTrain, datasetVal, params, tx, opt_state,
                     train_step, val_step, args.batchSize, args.nEpochs,
                     pathCheckpoint, args)
    else:
        print(f"Loading data at {pathCheckpoint}")
        import torch
        from ..io.torch_ckpt import params_from_torch_state_dict
        state_dict = torch.load(pathCheckpoint, map_location='cpu',
                                weights_only=False)
        if 'bestLoss' in state_dict:
            print(f"Best loss : {state_dict['bestLoss']}")
        crit_params, _, _ = params_from_torch_state_dict(
            state_dict['classifier'], params['criterion'])
        model_params, _, _ = params_from_torch_state_dict(
            state_dict['model'], params['model'])
        params = {'model': model_params, 'criterion': crit_params}

        tx = optax.adamw(2e-4)
        mesh = _local_eval_mesh()
        if mesh is not None:
            from ..parallel.mesh import replicate
            params = replicate(mesh, params)
        _, _, predict_step = build_cv_steps(module, criterion, tx, True,
                                            mesh)

        with open(os.path.join(args.output,
                               f"args_validation_{args.name}.json"),
                  'w') as f:
            json.dump(vars(args), f, indent=2)

        per_step(datasetVal, params, predict_step, criterion.blank_label,
                 args.batchSize, downsampling_factor)


if __name__ == "__main__":
    main(sys.argv[1:])
