"""The compiled training/validation step.

One `jax.jit`-of-`shard_map` program over the `('data',)` mesh replaces the
reference's DataParallel/DDP wrapping (`cpc/train.py:523-532`):

* the per-device body computes the reference's past/future two-view forward
  (`train.py:95-104`): encoder+AR on `concat([past, future])`, context from
  the past half, targets from the future half — XLA's DCE removes the unused
  AR pass over the future half, which torch eagerly computes;
* InfoNCE negatives are sampled inside the shard over the *local* batch,
  preserving the reference's per-GPU negative-pool semantics;
* gradients/metrics are `psum`-averaged across the mesh (the NCCL all-reduce,
  compiled onto ICI);
* optimizer update runs replicated (params are replicated in DP).

The returned functions are pure: `(state, batch, labels, rng[, quality])
-> (state, losses, accs)`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
import functools as _functools
try:
    shard_map = _functools.partial(jax.shard_map, check_vma=False)
except AttributeError:  # older jax
    from jax.experimental.shard_map import shard_map as _sm
    shard_map = _functools.partial(_sm, check_rep=False)

Array = jax.Array


@struct.dataclass
class TrainState:
    params: Dict[str, Any]            # {'model': ..., 'criterion': ...}
    opt_state: Any
    batch_stats: Dict[str, Any]       # {'model': ...} (empty if unused)
    step: Array


def make_optimizer(args) -> optax.GradientTransformation:
    """Adam/SGD (reference `train.py:475-484`) with an injected learning rate
    so per-epoch LR schedules don't recompile the step."""
    if args.optimizer == 'adam':
        mu_dtype = (jnp.bfloat16
                    if getattr(args, 'adam_mu_dtype', 'fp32') == 'bf16'
                    else None)
        return optax.inject_hyperparams(optax.adam,
                                        static_args=('mu_dtype',))(
            learning_rate=args.learningRate, b1=args.beta1, b2=args.beta2,
            eps=args.epsilon, mu_dtype=mu_dtype)
    elif args.optimizer == 'sgd':
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=args.learningRate, momentum=0.9)
    raise ValueError("Unsupported optimizer: %s" % args.optimizer)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected learning rate (host-side, between epochs).

    The new scalar is placed with the SAME sharding as the one it
    replaces: a fresh uncommitted host scalar inside an otherwise
    device-committed state changes the jit signature and forces a full
    train-step recompile at every epoch boundary (observed: 10-22 s per
    epoch on a remote backend)."""
    old = state.opt_state.hyperparams['learning_rate']
    new = jnp.asarray(lr, jnp.float32)
    if isinstance(old, jax.Array) and hasattr(old, 'sharding'):
        new = jax.device_put(new, old.sharding)
    hyperparams = dict(state.opt_state.hyperparams)
    hyperparams['learning_rate'] = new
    return dataclasses.replace(
        state, opt_state=state.opt_state._replace(hyperparams=hyperparams))


def create_train_state(model_vars: Dict, criterion_vars: Dict,
                       tx: optax.GradientTransformation) -> TrainState:
    params = {'model': model_vars['params'],
              'criterion': criterion_vars.get('params', {})}
    batch_stats = {}
    if 'batch_stats' in model_vars:
        batch_stats['model'] = model_vars['batch_stats']
    return TrainState(params=params, opt_state=tx.init(params),
                      batch_stats=batch_stats, step=jnp.zeros((), jnp.int32))


def init_hidden(model, args, batch_size: int):
    """Zero AR hidden state for the stateful (`keepHidden`) training mode:
    (nLevelsGRU, B, H) arrays — a (h, c) tuple for LSTM."""
    shape = (args.nLevelsGRU, batch_size, args.hiddenGar)
    h = jnp.zeros(shape, jnp.float32)
    if args.arMode == 'LSTM':
        return (h, jnp.zeros(shape, jnp.float32))
    return h


def build_steps(model: nn.Module, criterion: nn.Module,
                tx: optax.GradientTransformation, mesh: Mesh,
                has_quality: bool = False, uses_mask: bool = False,
                keep_hidden: bool = False, remat: bool = False,
                device_augment=None, example_weighted: bool = False,
                _return_bodies: bool = False):
    """Returns (train_step, val_step), jitted over `mesh`.

    example_weighted: the steps take an extra `valid` (B,) float operand
    (sharded like the batch) and compute the EXACT global mean over
    valid examples — per-shard weighted sums from the criterion,
    normalized by the psum of weights, gradients psum'd (each shard's
    loss term is its share of the global mean). This is how multi-host
    ragged tails run (train.PodTailRunner): every host pads its short
    tail to the full batch shape, zero-weight pad rows contribute
    nothing, and the replicated state stays in sync. With all-ones
    weights the math coincides with the pmean path. keep_hidden is not
    supported in this mode.

    Batch layout: (B_local*n_dev, 2, 1, W) float32 on axis 0 of the mesh.

    keep_hidden: thread the AR hidden state across steps (the reference's
    `keepHidden=True` under `--samplingType sequential`,
    `feature_loader.py:230-232`); the carry is stop-gradiented like the
    reference's `.detach()` (`cpc/model.py:196-201`).

    remat: rematerialize the forward in the backward (`jax.checkpoint`) —
    activations are recomputed instead of stored, trading FLOPs for HBM on
    configs that would not otherwise fit. Identical results, smaller peak
    memory.

    device_augment: optional (fn, augment_past, augment_future,
    past_equal_future) — `--augment_on_device`: the waveform augmentations
    run batched INSIDE the train step (`data/augment_device.py`) instead
    of per-window on host CPU, keyed from the step PRNG (train steps only;
    validation stays clean like the host pipeline).
    """
    # The reference runs the AR over BOTH halves of the two-view batch and
    # discards the future half's context (`train.py:99-104`). XLA cannot DCE
    # half a `lax.scan` batch, so the forward is split explicitly: encoder on
    # the combined batch, AR on the past half only — identical outputs for
    # everything the loss consumes, half the recurrence cost. CPCBertModel
    # keeps the reference's single forward (its mask label couples halves).
    is_bert = model.__class__.__name__ == 'CPCBertModel'
    # 'data' on the flat mesh, ('dcn_data','ici_data') on the 2-level
    # multi-slice mesh — same program either way (parallel.mesh.data_axes)
    from .parallel.mesh import data_axes
    DATA = data_axes(mesh)

    def forward(params, batch_stats, batch, labels, quality, rng, train,
                mask_indices, hidden=None, valid=None):
        b = batch.shape[0]
        past, future = batch[:, 0, 0, :], batch[:, 1, 0, :]
        combined = jnp.concatenate([past, future], axis=0)
        if labels is not None and labels.ndim >= 1:
            labels2 = jnp.concatenate([labels, labels], axis=0)
        else:
            labels2 = labels

        model_vars = {'params': params['model']}
        mutable = []
        if batch_stats and 'model' in batch_stats and batch_stats['model']:
            model_vars['batch_stats'] = batch_stats['model']
            mutable = ['batch_stats'] if train else []

        # Per-device, per-step rng streams.
        dev = jax.lax.axis_index(DATA)
        key = jax.random.fold_in(jax.random.fold_in(rng, dev), 0)
        k_drop, k_neg, k_drop2 = jax.random.split(key, 3)

        if device_augment is not None and train:
            aug_fn, aug_past, aug_future, same = device_augment
            k_aug = jax.random.fold_in(key, 3)
            if aug_past:
                past = aug_fn(past, k_aug)
            if aug_future:
                future = aug_fn(future, k_aug if same
                                else jax.random.fold_in(k_aug, 1))
            combined = jnp.concatenate([past, future], axis=0)

        new_bs = batch_stats
        if is_bert:
            kwargs = dict(train=train)
            if uses_mask:
                kwargs['mask_indices'] = mask_indices
            if mutable:
                (c, e, lab, _), updates = model.apply(
                    model_vars, combined, labels2,
                    rngs={'dropout': k_drop}, mutable=mutable, **kwargs)
                new_bs = {'model': updates['batch_stats']}
            else:
                c, e, lab, _ = model.apply(model_vars, combined, labels2,
                                           rngs={'dropout': k_drop},
                                           **kwargs)
            c = c[:b]
            e = e[b:]
            lab = lab[:b] if (lab is not None and hasattr(lab, 'ndim')
                              and lab.ndim >= 1) else lab
        else:
            def encode(m, x):
                return m.gEncoder(x, train=train)

            if mutable:
                encoded, updates = model.apply(
                    model_vars, combined, method=encode, mutable=mutable,
                    rngs={'dropout': k_drop})
                new_bs = {'model': updates['batch_stats']}
            else:
                encoded = model.apply(model_vars, combined, method=encode,
                                      rngs={'dropout': k_drop})
            e = encoded[b:]
            ar_input = encoded[:b]
            if uses_mask and mask_indices is not None \
                    and 'mask_emb' in params['model']:
                mask_emb = params['model']['mask_emb']
                ar_input = jnp.where(mask_indices[:b][..., None], mask_emb,
                                     ar_input)

            def context(m, z):
                return m.gAR(z, hidden=hidden, train=train)

            c, new_hidden = model.apply(model_vars, ar_input, method=context,
                                        rngs={'dropout': k_drop})
            lab = labels

        crit_vars = {'params': params['criterion']}
        crit_kwargs = {} if valid is None else {'example_weights': valid}
        losses, accs = criterion.apply(
            crit_vars, c, e, lab, quality, train=train,
            rngs={'negatives': k_neg, 'dropout': k_drop2}, **crit_kwargs)
        if is_bert or not keep_hidden:
            new_hidden = None
        elif new_hidden is not None:
            # reference detaches the carried hidden (`model.py:196-201`)
            new_hidden = jax.lax.stop_gradient(new_hidden)
        return losses, accs, new_bs, new_hidden

    if remat:
        # `train` (arg 6) is a Python bool, everything else is traced.
        fwd_train = jax.checkpoint(forward, static_argnums=(6,))
    else:
        fwd_train = forward

    def train_body(state: TrainState, batch, labels, quality, rng,
                   mask_indices, hidden):
        def loss_fn(params):
            losses, accs, new_bs, new_hidden = fwd_train(
                params, state.batch_stats, batch, labels, quality,
                jax.random.fold_in(rng, state.step), True, mask_indices,
                hidden)
            return jnp.sum(losses), (losses, accs, new_bs, new_hidden)

        grads, (losses, accs, new_bs, new_hidden) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, DATA)
        losses = jax.lax.pmean(losses, DATA)
        accs = jax.lax.pmean(accs, DATA)
        if new_bs:
            new_bs = jax.lax.pmean(new_bs, DATA)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               batch_stats=new_bs, step=state.step + 1)
        return new_state, losses, accs, new_hidden

    def val_body(state: TrainState, batch, labels, quality, rng,
                 mask_indices, hidden):
        losses, accs, _, new_hidden = forward(
            state.params, state.batch_stats, batch, labels, quality,
            jax.random.fold_in(rng, state.step), False, mask_indices,
            hidden)
        return (jax.lax.pmean(losses, DATA), jax.lax.pmean(accs, DATA),
                new_hidden)

    # --- example-weighted variant (multi-host ragged tails) ---
    def train_body_w(state: TrainState, batch, labels, quality, rng,
                     mask_indices, valid):
        # total valid examples across the whole mesh — independent of
        # params, so taking it outside loss_fn is exact
        total = jnp.maximum(jax.lax.psum(jnp.sum(valid), DATA), 1e-9)

        def loss_fn(params):
            losses, accs, new_bs, _ = fwd_train(
                params, state.batch_stats, batch, labels, quality,
                jax.random.fold_in(rng, state.step), True, mask_indices,
                None, valid)
            # local share of the global valid-mean objective
            return jnp.sum(losses) / total, (losses, accs, new_bs)

        grads, (losses, accs, new_bs) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        # each shard holds its share of the global mean: SUM, not mean
        grads = jax.lax.psum(grads, DATA)
        losses = jax.lax.psum(losses, DATA) / total
        accs = jax.lax.psum(accs, DATA) / total
        if new_bs:
            # Batch-norm running stats average only over shards holding
            # at least one REAL example: the validity weights mask loss/
            # grads/metrics but a shard's batch statistics are computed
            # from whatever rows it carries, and an out-of-tails host's
            # all-zero filler must not pollute the replicated stats.
            # (Cyclic-repeat pad rows within a participating shard DO
            # enter its stats — real audio, same trade a reference
            # DataParallel tail shard makes.) Some shard always
            # participates: a round exists only because some host holds
            # a real tail.
            m = (jnp.sum(valid) > 0).astype(jnp.float32)
            m_tot = jnp.maximum(jax.lax.psum(m, DATA), 1.0)
            new_bs = jax.tree.map(
                lambda n: jax.lax.psum(n * m, DATA) / m_tot, new_bs)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               batch_stats=new_bs, step=state.step + 1)
        return new_state, losses, accs

    def val_body_w(state: TrainState, batch, labels, quality, rng,
                   mask_indices, valid):
        total = jnp.maximum(jax.lax.psum(jnp.sum(valid), DATA), 1e-9)
        losses, accs, _, _ = forward(
            state.params, state.batch_stats, batch, labels, quality,
            jax.random.fold_in(rng, state.step), False, mask_indices,
            None, valid)
        return (jax.lax.psum(losses, DATA) / total,
                jax.lax.psum(accs, DATA) / total)

    if _return_bodies:
        return train_body, val_body

    data_spec = P(DATA)
    rep = P()

    if example_weighted:
        assert not keep_hidden, \
            "example-weighted steps do not carry hidden state"
        n_in_w = (rep, data_spec, data_spec,
                  data_spec if has_quality else rep, rep,
                  data_spec if uses_mask else rep, data_spec)
        train_w = jax.jit(shard_map(train_body_w, mesh=mesh,
                                    in_specs=n_in_w,
                                    out_specs=(rep, rep, rep)),
                          donate_argnums=(0,))
        val_w = jax.jit(shard_map(val_body_w, mesh=mesh, in_specs=n_in_w,
                                  out_specs=(rep, rep)))

        def train_step_w(state, batch, labels, rng, valid, quality=None,
                         mask_indices=None):
            return train_w(state, batch, labels, quality, rng,
                           mask_indices, valid)

        def val_step_w(state, batch, labels, rng, valid, quality=None,
                       mask_indices=None):
            return val_w(state, batch, labels, quality, rng, mask_indices,
                         valid)
        return train_step_w, val_step_w

    hid_spec = P(None, DATA) if keep_hidden else rep

    n_in = (rep, data_spec, data_spec,
            data_spec if has_quality else rep, rep,
            data_spec if uses_mask else rep, hid_spec)

    train_sm = shard_map(train_body, mesh=mesh, in_specs=n_in,
                         out_specs=(rep, rep, rep, hid_spec))
    val_sm = shard_map(val_body, mesh=mesh, in_specs=n_in,
                       out_specs=(rep, rep, hid_spec))

    train_jit = jax.jit(train_sm, donate_argnums=(0,))
    val_jit = jax.jit(val_sm)

    if keep_hidden:
        def train_step(state, batch, labels, rng, quality=None,
                       mask_indices=None, hidden=None):
            return train_jit(state, batch, labels, quality, rng,
                             mask_indices, hidden)

        def val_step(state, batch, labels, rng, quality=None,
                     mask_indices=None, hidden=None):
            return val_jit(state, batch, labels, quality, rng, mask_indices,
                           hidden)
    else:
        def train_step(state, batch, labels, rng, quality=None,
                       mask_indices=None):
            out = train_jit(state, batch, labels, quality, rng,
                            mask_indices, None)
            return out[:3]

        def val_step(state, batch, labels, rng, quality=None,
                     mask_indices=None):
            out = val_jit(state, batch, labels, quality, rng, mask_indices,
                          None)
            return out[:2]

    return train_step, val_step


def head_shard_specs(tree, model_axis: str = 'model',
                     multihead: bool = False):
    """PartitionSpec tree for head-sharded model parallelism: prediction-head
    leaves (stacked on their leading K axis by `nn.vmap`) shard over
    `model_axis`; everything else (encoder/AR params, optimizer scalars) is
    replicated. Matches params AND the optax state mirroring them.

    `multihead` (`--multihead_rnn`): the predictor is ONE shared
    transformer trunk whose only K-dependent parameters are the
    classifier FF's output layer (`MultiClassifierTransformerHead`'s
    `ffnetwork/lin2`, torch-layout weight (K*dmodel, dff) with head-major
    rows and bias (K*dmodel,)) — those shard over their leading axis
    (contiguous dmodel-row blocks per head, so each rank's block equals a
    local module built with K/m heads); the trunk replicates like the
    encoder."""
    def leaf(path, x):
        ks = jax.tree_util.keystr(path)
        if 'wPrediction' not in ks or getattr(x, 'ndim', 0) < 1:
            return P()
        if multihead and not ('ffnetwork' in ks and 'lin2' in ks):
            return P()
        return P(model_axis, *([None] * (x.ndim - 1)))
    return jax.tree_util.tree_map_with_path(leaf, tree)


def shard_state_2d(mesh: Mesh, state: TrainState,
                   multihead: bool = False) -> TrainState:
    """Commit a TrainState to a ('data','model') mesh: head leaves split
    over 'model' (each device holds K/m heads' params+moments), the rest
    replicated.

    Multi-host: the 'model' axis lives WITHIN each host (train.py enforces
    local_device_count % model_axis == 0), and every process holds the full
    identical same-seed value, so each process's local slice of any leaf —
    replicated or model-sharded — equals the global value; assembly goes
    through `jax.make_array_from_process_local_data` like
    `parallel.mesh.replicate`."""
    from jax.sharding import NamedSharding
    specs = head_shard_specs(state, multihead=multihead)
    if jax.process_count() > 1:
        import numpy as np
        return jax.tree.map(
            lambda x, s: jax.make_array_from_process_local_data(
                NamedSharding(mesh, s), np.asarray(x)), state, specs)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def build_steps_2d(model: nn.Module, criterion_local: nn.Module,
                   tx: optax.GradientTransformation, mesh: Mesh,
                   state_template: TrainState, n_skipped: int = 0,
                   device_augment=None, has_quality: bool = False,
                   uses_mask: bool = False, keep_hidden: bool = False,
                   multihead: bool = False, _return_bodies: bool = False):
    """Head-sharded model parallelism (extension beyond the reference's
    DP-only design): train/val steps over a ('data','model') mesh.

    The K=nPredicts InfoNCE heads are independent networks scored against
    shifted slices of the same encodings, so they shard cleanly: each
    model-axis rank computes its K/m heads' predictions and loss terms;
    `criterion_local` must be built with the LOCAL head count,
    `head_axis='model'`, and `n_predicts_total=K` (the absolute positive
    offsets come from `lax.axis_index('model')`).

    Collectives: encoder/AR grads psum over 'model' (ranks cover disjoint
    head subsets, so the sum IS the full gradient) then pmean over 'data';
    head grads pmean over 'data' only; per-head loss/acc columns all_gather
    over 'model' for reference-format logging. Encoder compute is
    replicated across 'model' — the right trade at CPC scale, where the
    heads dominate the step (see docs/performance.md) and the encoder is
    cheap.

    Scope: the unsupervised CPC path (no phone labels, no BERT mode).
    `multihead=True` composes the `--multihead_rnn` predictor: the shared
    trunk replicates (grads psum over 'model') and only the classifier
    FF's K-expanding output layer shards — see `head_shard_specs`.
    Signal-quality loss weighting, wav2vec-style span masking, and the
    sequential-sampling hidden carry (`keep_hidden`, the reference's
    `keepHidden=True`) compose: the per-window weight, the mask, and the
    carried hidden are identical across head shards (the carry comes from
    the replicated AR compute keyed only by the data index), so each
    rank's loss terms stay exact.
    """
    def forward(params, batch, quality, rng, train, mask_indices,
                hidden=None):
        b = batch.shape[0]
        past, future = batch[:, 0, 0, :], batch[:, 1, 0, :]
        model_vars = {'params': params['model']}

        def encode(m, x):
            return m.gEncoder(x, train=train)

        def context(m, z):
            return m.gAR(z, hidden=hidden, train=train)

        d_idx = jax.lax.axis_index('data')
        key = jax.random.fold_in(jax.random.fold_in(rng, d_idx), 0)
        k_drop, k_neg, k_drop2 = jax.random.split(key, 3)

        # --augment_on_device under head sharding: the key folds in only the
        # data index, so every 'model' rank augments identically and the
        # replicated encoder compute stays consistent across head shards.
        if device_augment is not None and train:
            aug_fn, aug_past, aug_future, same = device_augment
            k_aug = jax.random.fold_in(key, 3)
            if aug_past:
                past = aug_fn(past, k_aug)
            if aug_future:
                future = aug_fn(future, k_aug if same
                                else jax.random.fold_in(k_aug, 1))
        combined = jnp.concatenate([past, future], axis=0)
        # Head dropout differs per model rank (distinct heads live there);
        # k_drop (encoder/AR) and k_neg (negatives) stay identical across
        # 'model' so the replicated encoder compute and the shared negative
        # pool match the single-axis semantics.
        k_drop2 = jax.random.fold_in(k_drop2, jax.lax.axis_index('model'))

        encoded = model.apply(model_vars, combined, method=encode,
                              rngs={'dropout': k_drop})
        e = encoded[b:]
        ar_input = encoded[:b]
        if uses_mask and mask_indices is not None \
                and 'mask_emb' in params['model']:
            mask_emb = params['model']['mask_emb']
            ar_input = jnp.where(mask_indices[:b][..., None], mask_emb,
                                 ar_input)
        c, new_hidden = model.apply(model_vars, ar_input, method=context,
                                    rngs={'dropout': k_drop})
        if not keep_hidden:
            new_hidden = None
        elif new_hidden is not None:
            # reference detaches the carried hidden (`model.py:196-201`)
            new_hidden = jax.lax.stop_gradient(new_hidden)
        # LOCAL head columns: (1, K_local)
        losses, accs = criterion_local.apply(
            {'params': params['criterion']}, c, e, None, quality,
            train=train, rngs={'negatives': k_neg, 'dropout': k_drop2})
        return losses, accs, new_hidden

    def gather_cols(x):
        # (1, K_local) -> (1, K_total) for reference-format logging
        x = jax.lax.all_gather(x, 'model', axis=1, tiled=True)
        return x[:, n_skipped:]

    def is_head(path):
        # multihead (`--multihead_rnn`): only the classifier FF's output
        # layer holds per-head parameters; the shared trunk replicates and
        # its grads psum over 'model' like the encoder's (each rank's loss
        # covers a disjoint head subset, so the sum is the full gradient).
        # Per-rank dropout streams (k_drop2 folds in the model index) mean
        # each head block sees its own trunk dropout sample — a valid
        # stochastic program; the FF2-slice masks are independent per head
        # exactly like the 1-D program's single (B, S, K*dmodel) mask.
        ks = jax.tree_util.keystr(path)
        if 'wPrediction' not in ks:
            return False
        if multihead and not ('ffnetwork' in ks and 'lin2' in ks):
            return False
        return True

    k_local = criterion_local.n_predicts

    def train_body(state: TrainState, batch, quality, rng, mask_indices,
                   hidden):
        def loss_fn(params):
            losses, accs, new_hidden = forward(
                params, batch, quality,
                jax.random.fold_in(rng, state.step), True, mask_indices,
                hidden)
            # ranks cover disjoint head subsets: the global loss is the
            # psum of these local sums, so local-sum grads + the 'model'
            # psum below ARE the full gradient. n_skipped heads are
            # excluded from the trained loss exactly like the 1-D
            # criterion (`losses/criterion.py` drops them before the sum).
            k_abs = (jax.lax.axis_index('model') * k_local
                     + jnp.arange(k_local))
            trained = jnp.where(k_abs[None, :] >= n_skipped, losses, 0.0)
            return jnp.sum(trained), (losses, accs, new_hidden)

        grads, (losses, accs, new_hidden) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.tree_util.tree_map_with_path(
            lambda p, g: (jax.lax.pmean(g, 'data') if is_head(p)
                          else jax.lax.pmean(jax.lax.psum(g, 'model'),
                                             'data')),
            grads)
        losses = gather_cols(jax.lax.pmean(losses, 'data'))
        accs = gather_cols(jax.lax.pmean(accs, 'data'))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               batch_stats=state.batch_stats,
                               step=state.step + 1)
        return new_state, losses, accs, new_hidden

    def val_body(state: TrainState, batch, quality, rng, mask_indices,
                 hidden):
        losses, accs, new_hidden = forward(
            state.params, batch, quality,
            jax.random.fold_in(rng, state.step), False, mask_indices,
            hidden)
        return (gather_cols(jax.lax.pmean(losses, 'data')),
                gather_cols(jax.lax.pmean(accs, 'data')), new_hidden)

    if _return_bodies:
        return train_body, val_body

    rep = P()
    data_spec = P('data')
    # The carry is data-sharded and replicated over 'model' (every head
    # shard runs the same replicated AR on the same data shard).
    hid_spec = P(None, 'data') if keep_hidden else rep
    state_specs = head_shard_specs(state_template, multihead=multihead)
    n_in = (state_specs, data_spec, data_spec if has_quality else rep,
            rep, data_spec if uses_mask else rep, hid_spec)

    train_jit = jax.jit(
        shard_map(train_body, mesh=mesh, in_specs=n_in,
                  out_specs=(state_specs, rep, rep, hid_spec)),
        donate_argnums=(0,))
    val_jit = jax.jit(
        shard_map(val_body, mesh=mesh, in_specs=n_in,
                  out_specs=(rep, rep, hid_spec)))

    if keep_hidden:
        def train_step(state, batch, rng, quality=None, mask_indices=None,
                       hidden=None):
            return train_jit(state, batch, quality, rng, mask_indices,
                             hidden)

        def val_step(state, batch, rng, quality=None, mask_indices=None,
                     hidden=None):
            return val_jit(state, batch, quality, rng, mask_indices, hidden)
    else:
        def train_step(state, batch, rng, quality=None, mask_indices=None):
            return train_jit(state, batch, quality, rng, mask_indices,
                             None)[:3]

        def val_step(state, batch, rng, quality=None, mask_indices=None):
            return val_jit(state, batch, quality, rng, mask_indices,
                           None)[:2]

    return train_step, val_step


def build_multi_step(model: nn.Module, criterion: nn.Module,
                     tx: optax.GradientTransformation, mesh: Mesh,
                     n_inner: int, has_quality: bool = False,
                     uses_mask: bool = False, remat: bool = False,
                     device_augment=None, gather_window: int = None,
                     corpus_sharded: bool = False):
    """One host dispatch = `n_inner` optimizer steps (`lax.scan` over the
    per-step body inside a single jitted shard_map program).

    On backends where each dispatch pays a host<->device (or tunnel)
    round-trip, the per-step launch overhead disappears: the device chews
    through a stack of batches without talking to the host. Trajectories match
    `n_inner` calls of the `build_steps` train step with the same rng to
    fp-fusion tolerance (same math; XLA may fuse reductions differently
    inside the scan) (the per-step key folds in `state.step`, which the scan
    advances exactly like the single-step path).

    Returns `multi_step(state, batches, labels, rng, quality=None,
    mask_indices=None) -> (state, losses, accs)` where `batches` is
    (n_inner, B, 2, 1, W) and losses/accs carry a leading n_inner axis.
    Stateful AR carry (keep_hidden) is not supported here — sequential
    sampling needs per-step host batches anyway.

    gather_window: composes with `--corpus_on_device`. When set, the
    returned step is `multi_step(state, corpus, offsets, labels, rng, ...)`
    where `corpus` is the device-resident flat pack (replicated) and
    `offsets` is (n_inner, B) int32 window starts: each scanned step
    gathers its own batch from HBM (`mesh.device_gather_windows` —
    bit-identical to `DeviceCorpus.put`), so one dispatch of ~n_inner*B*4
    wire bytes drives n_inner optimizer steps with no per-step host work.
    """
    train_body, _ = build_steps(model, criterion, tx, mesh,
                                has_quality=has_quality, uses_mask=uses_mask,
                                keep_hidden=False, remat=remat,
                                device_augment=device_augment,
                                _return_bodies=True)

    def multi_body(state: TrainState, corpus, batches, labels, quality, rng,
                   mask_indices):
        # lax.scan needs uniform pytrees: scan over the stacked operands
        # that exist, close over the Nones.
        xs = {'batch': batches, 'labels': labels}
        if quality is not None:
            xs['quality'] = quality
        if mask_indices is not None:
            xs['mask'] = mask_indices

        def scan_fn(st, x):
            batch = x['batch']
            if gather_window is not None:
                from .parallel.mesh import device_gather_windows
                # corpus_sharded: (n_dev, cap) row-per-device slab — this
                # shard's row IS its host's pack (multi-process
                # --corpus_on_device); offsets are host-local by the same
                # per-rank sharding.
                c = corpus[0] if corpus_sharded else corpus
                batch = device_gather_windows(c, batch, gather_window)
            new_st, losses, accs, _ = train_body(
                st, batch, x['labels'], x.get('quality'), rng,
                x.get('mask'), None)
            return new_st, (losses, accs)

        state, (losses, accs) = jax.lax.scan(scan_fn, state, xs)
        return state, losses, accs

    from .parallel.mesh import data_axes
    DATA = data_axes(mesh)
    rep = P()
    stacked = P(None, DATA)
    corpus_spec = P(DATA, None) if corpus_sharded else rep
    n_in = (rep, corpus_spec, stacked, stacked,
            stacked if has_quality else rep, rep,
            stacked if uses_mask else rep)
    multi_sm = shard_map(multi_body, mesh=mesh, in_specs=n_in,
                         out_specs=(rep, rep, rep))
    multi_jit = jax.jit(multi_sm, donate_argnums=(0,))

    if gather_window is not None:
        def multi_step(state, corpus, offsets, labels, rng, quality=None,
                       mask_indices=None):
            assert offsets.shape[0] == n_inner, (offsets.shape, n_inner)
            return multi_jit(state, corpus, offsets, labels, quality, rng,
                             mask_indices)
    else:
        # placeholder corpus operand keeps ONE program shape either way
        _corpus = jnp.zeros((0,), jnp.float32)

        def multi_step(state, batches, labels, rng, quality=None,
                       mask_indices=None):
            assert batches.shape[0] == n_inner, (batches.shape, n_inner)
            return multi_jit(state, _corpus, batches, labels, quality, rng,
                             mask_indices)

    return multi_step


def build_multi_step_2d(model: nn.Module, criterion_local: nn.Module,
                        tx: optax.GradientTransformation, mesh: Mesh,
                        state_template: TrainState, n_inner: int,
                        n_skipped: int = 0, device_augment=None,
                        has_quality: bool = False, uses_mask: bool = False,
                        multihead: bool = False):
    """`build_multi_step` for the head-sharded ('data','model') mesh: one
    host dispatch = `n_inner` optimizer steps, scanned inside the same
    shard_map program as `build_steps_2d` (whose per-shard train body —
    including its 'model'-psum gradient assembly and all_gather logging
    columns — is reused verbatim as the scan body, so trajectories match
    the 2-D single-step path to fp-fusion tolerance).

    Composes the two extensions the reference has neither of: dispatch
    amortization (`--steps_per_dispatch`) and model-axis head sharding
    (`--model_axis_size`). The hidden carry stays single-step, like the
    1-D multi-step path.
    """
    train_body, _ = build_steps_2d(
        model, criterion_local, tx, mesh, state_template,
        n_skipped=n_skipped, device_augment=device_augment,
        has_quality=has_quality, uses_mask=uses_mask, keep_hidden=False,
        multihead=multihead, _return_bodies=True)

    def multi_body(state: TrainState, batches, quality, rng, mask_indices):
        xs = {'batch': batches}
        if quality is not None:
            xs['quality'] = quality
        if mask_indices is not None:
            xs['mask'] = mask_indices

        def scan_fn(st, x):
            new_st, losses, accs, _ = train_body(
                st, x['batch'], x.get('quality'), rng, x.get('mask'), None)
            return new_st, (losses, accs)

        state, (losses, accs) = jax.lax.scan(scan_fn, state, xs)
        return state, losses, accs

    rep = P()
    stacked = P(None, 'data')
    state_specs = head_shard_specs(state_template, multihead=multihead)
    n_in = (state_specs, stacked, stacked if has_quality else rep, rep,
            stacked if uses_mask else rep)
    multi_jit = jax.jit(
        shard_map(multi_body, mesh=mesh, in_specs=n_in,
                  out_specs=(state_specs, rep, rep)),
        donate_argnums=(0,))

    def multi_step(state, batches, labels, rng, quality=None,
                   mask_indices=None):
        # labels accepted for signature parity with the 1-D multi_step;
        # the unsupervised 2-D path has no label input.
        assert batches.shape[0] == n_inner, (batches.shape, n_inner)
        return multi_jit(state, batches, quality, rng, mask_indices)

    return multi_step


def shard_stacked_batch(mesh: Mesh, *arrays):
    """Place (n_inner, B, ...) host arrays on the mesh, sharded over axis 1
    (the per-step batch axis used by `build_multi_step`). Multi-host, each
    process holds its (n_inner, B_local, ...) slice of the global stack
    and the global array is assembled with
    `jax.make_array_from_process_local_data` (same contract as
    `parallel.mesh.shard_batch`, axis 1 instead of 0)."""
    from jax.sharding import NamedSharding
    from .parallel.mesh import data_axes
    import numpy as _np
    n_proc = jax.process_count()
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        spec = P(None, data_axes(mesh), *([None] * (_np.ndim(a) - 2)))
        sharding = NamedSharding(mesh, spec)
        if n_proc > 1:
            a = _np.asarray(a)
            global_shape = (a.shape[0], a.shape[1] * n_proc) + a.shape[2:]
            out.append(jax.make_array_from_process_local_data(
                sharding, a, global_shape))
        else:
            out.append(jax.device_put(a, sharding))
    return out if len(out) != 1 else out[0]
