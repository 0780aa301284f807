"""CPC pretraining driver (reference `cpc/train.py`).

Same CLI surface (flags, defaults, checkpoint layout, auto-resume, logging
format); the compute path is a single jitted shard_map program per step
(see `training.py`).

Run: `python -m cpc2_tpu.train --pathDB ... --pathCheckpoint ...`
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import feature_loader as fl
from .config import set_default_cpc_config, set_tpu_config
from .data.augmentation import augmentation_factory, canonical_augment_type
from .data.corpus import filterSeqs, findAllSeqs, parseSeqLabels
from .data.dataset import AudioBatchData, PeakNorm
from .io.checkpoint import get_checkpoint_data, load_args
from .io.torch_ckpt import (load_torch_checkpoint,
                            params_from_torch_state_dict,
                            params_to_torch_state_dict, save_checkpoint)
from .losses import (CPCUnsupervisedCriterion, CTCPhoneCriterion,
                     NoneCriterion, PhoneCriterion, SpeakerCriterion)
from .models.encoder import encoded_seq_len
from .parallel.distributed import init_distributed_mode
from .parallel.mesh import (DeviceCorpus,
                            data_extent as _mesh_data_extent, make_mesh,
                            shard_batch)
from .training import (build_steps, create_train_state,
                       make_optimizer, set_learning_rate)
from .utils import misc as utils


def get_criterion(args, downsampling, n_speakers, n_phones,
                  pool_axis_size=1, data_axis='data'):
    """Reference `train.py:27-59`. `data_axis` names the mesh axis (or
    axis pair, on the 2-level --dcn_axis_size mesh) the global-negatives
    pool gathers over."""
    dim_features = args.hiddenGar if not args.onEncoder else args.hiddenEncoder
    if not getattr(args, 'supervised', False):
        if args.cpc_mode == 'none':
            return NoneCriterion()
        if args.cpc_mode == 'bert':
            # The reference's CPCUnsupersivedCriterion rejects mode='bert'
            # (`criterion.py:232-233`) so its train.py cannot actually run
            # BERT mode; wire the intended masked-position criterion
            # (`criterion/research/bert.py`) instead.
            from .losses import CPCBertCriterion
            return CPCBertCriterion(
                dim_ar=args.hiddenGar, dim_enc=args.hiddenEncoder,
                negative_sampling_ext=args.negativeSamplingExt)
        size_input_seq = args.sizeWindow // downsampling
        return CPCUnsupervisedCriterion(
            n_predicts=args.nPredicts, dim_ar=args.hiddenGar,
            dim_enc=args.hiddenEncoder,
            negative_sampling_ext=args.negativeSamplingExt,
            mode=args.cpc_mode, rnn_mode=args.rnnMode, dropout=args.dropout,
            n_speakers=n_speakers, size_input_seq=size_input_seq,
            multihead_rnn=args.multihead_rnn, n_skipped=args.n_skipped,
            growth_rate=args.growth_rate,
            inflection_point_x=args.inflection_point_x,
            global_negatives=getattr(args, 'global_negatives', False),
            pool_axis_size=pool_axis_size, data_axis=data_axis,
            neg_pool_group=getattr(args, 'neg_pool_group', 0),
            head_remat=getattr(args, 'head_remat', False))
    elif getattr(args, 'pathPhone', None) is not None:
        if not getattr(args, 'CTC', False):
            return PhoneCriterion(dim_encoder=dim_features,
                                  n_phones=n_phones,
                                  on_encoder=args.onEncoder,
                                  n_layers=args.nLevelsPhone)
        return CTCPhoneCriterion(dim_encoder=dim_features,
                                 n_phones=n_phones,
                                 on_encoder=args.onEncoder)
    return SpeakerCriterion(dim_encoder=dim_features, n_speakers=n_speakers)


# Reference-spelled alias
getCriterion = get_criterion


def init_criterion_vars(criterion, args, model_bundle, seed=1):
    """Initialize criterion params with correctly-shaped dummies (on the
    CPU backend — see `feature_loader.init_model`)."""
    try:
        # local_devices, not devices: under multi-process JAX,
        # jax.devices('cpu')[0] is process 0's device and is not
        # addressable from the other processes.
        cpu_devs = jax.local_devices(backend='cpu')
    except RuntimeError:
        cpu_devs = []
    if cpu_devs:
        with jax.default_device(cpu_devs[0]):
            return _init_criterion_vars_impl(criterion, args, seed)
    return _init_criterion_vars_impl(criterion, args, seed)


def _init_criterion_vars_impl(criterion, args, seed):
    # Init traces outside shard_map where the data axis is unbound, so a
    # global-negatives criterion is cloned local for init (the all_gather
    # does not change parameter shapes).
    if getattr(criterion, 'global_negatives', False):
        criterion = criterion.clone(global_negatives=False,
                                    pool_axis_size=1)
    frames = encoded_seq_len(args.sizeWindow)
    b = 2
    c = jnp.zeros((b, frames, args.hiddenGar), jnp.float32)
    e = jnp.zeros((b, frames, args.hiddenEncoder), jnp.float32)
    label = jnp.zeros((b,), jnp.int32)
    if getattr(args, 'supervised', False) and \
            getattr(args, 'pathPhone', None) is not None:
        label = jnp.zeros((b, frames), jnp.int32)
    elif args.cpc_mode == 'bert':
        label = jnp.zeros((b, frames), jnp.int32)  # mask labels
    rngs = {'params': jax.random.PRNGKey(seed),
            'negatives': jax.random.PRNGKey(seed + 1),
            'dropout': jax.random.PRNGKey(seed + 2)}
    return criterion.init(rngs, c, e, label, train=False)


# Tail runners and host dispatch machinery live in their own modules
# (round-5 split of the train driver); the names stay importable from
# here for compatibility.
from .train_tails import PodTailRunner, TailRunner  # noqa: E402
from .dispatch import (EPOCH_END as _EPOCH_END,  # noqa: E402
                       GroupAssembler, WindowLogger,
                       make_label_stager as _make_label_stager,
                       stack_batch as _stack_batch)


# The per-epoch loops live in train_loop.py (round-5 split); the names
# stay importable from here for compatibility.
from .train_loop import train_epoch, val_epoch  # noqa: E402


def run(train_dataset, val_dataset, batch_size, sampling_mode, state,
        train_step, val_step, mesh, args, n_epoch, path_checkpoint,
        lr_fn, logs, model_bundle, criterion, multi_step=None,
        tail_runner=None):
    print(f"Running {n_epoch} epochs")
    start_epoch = len(logs["epoch"])
    best_acc = -1
    best_state_params = None
    start_time = time.time()
    frames = encoded_seq_len(args.sizeWindow)
    rng = jax.random.PRNGKey(args.random_seed or 0)

    # --corpus_on_device: corpora live in HBM across epochs (one upload per
    # pack, not per epoch); loaders yield window offsets instead of audio.
    # Multi-process: each host's pack shard lives in ITS devices' rows of a
    # pod-uniform slab (DeviceCorpus.plan_pod — one setup collective).
    yield_indices = bool(getattr(args, 'corpus_on_device', False))
    corpus_train = corpus_val = None
    if yield_indices:
        corpus_train = DeviceCorpus(mesh, args.sizeWindow)
        if val_dataset is not None:
            corpus_val = DeviceCorpus(mesh, args.sizeWindow)
        if jax.process_count() > 1:
            from .parallel.mesh import pcm16_wire as _p16
            corpus_train.plan_pod(
                train_dataset.max_pack_samples(),
                _p16(np.asarray(train_dataset.data, np.float32))[1])
            if corpus_val is not None:
                corpus_val.plan_pod(
                    val_dataset.max_pack_samples(),
                    _p16(np.asarray(val_dataset.data, np.float32))[1])

    for epoch in range(start_epoch, n_epoch):
        print(f"Starting epoch {epoch}")
        utils.cpu_stats()

        state = set_learning_rate(state, lr_fn(epoch))

        # Host-side draws (sampler shuffles, pack offsets, host-pipeline
        # augmentation) are re-keyed per epoch as a pure function of
        # (random_seed, epoch): a killed-and-resumed run replays epoch N's
        # exact batch sequence, so resume is bit-identical to an
        # uninterrupted run (tests/test_orbax.py pins this; the device-side
        # key is already fold_in(rng, epoch) below). The reference's single
        # global stream (`/root/reference/cpc/train.py:296`) loses
        # replayability the moment a job is preempted.
        if args.random_seed is not None:
            utils.set_seed((args.random_seed + 7919 * (epoch + 1))
                           % (2 ** 31))

        train_loader = train_dataset.getDataLoader(
            batch_size, sampling_mode, True, numWorkers=0,
            remove_artefacts=args.no_artefacts,
            batch_size_per_gpu=args.batchSizeGPU,
            yield_indices=yield_indices)
        val_loader = (val_dataset.getDataLoader(batch_size, 'sequential',
                                                False, numWorkers=0,
                                                yield_indices=yield_indices)
                      if val_dataset is not None else [])

        print("Training dataset %d batches, Validation dataset %d batches, "
              "batch size %d" % (len(train_loader),
                                 len(val_loader) if val_loader else 0,
                                 batch_size))

        if args.distributed and jax.process_count() > 1:
            # Lock-step guard: every process must dispatch the same number
            # of FULL-batch global steps; a host with more would issue a
            # collective no one else joins (the reference's DDP hangs the
            # same way on unequal per-rank loaders). PodTailRunner lifts
            # the tail-SIZE constraint — ragged batches of any per-host
            # size train — but ragged batches must occur at matching
            # positions (pack ends / the epoch end, where samplers place
            # them). This up-front check catches length divergence with a
            # clear error instead of a mid-epoch hang; a full-vs-ragged
            # COMPOSITION mismatch at the same index remains the caller's
            # sharding responsibility (docs/parallelism.md), as in the
            # reference.
            from jax.experimental import multihost_utils
            counts = multihost_utils.process_allgather(np.asarray(
                [len(train_loader), len(val_loader) if val_loader else 0],
                np.int32))
            if not (counts == counts[0]).all():
                raise RuntimeError(
                    "per-host loader lengths diverge across processes "
                    f"({counts.tolist()}): the lock-step epoch loop needs "
                    "every process to yield the same batch count. Shard "
                    "--pathTrain/--pathVal so hosts carry equal window "
                    "counts (see docs/parallelism.md).")

        state, loc_logs_train = train_epoch(
            train_loader, state, train_step, mesh, args,
            logs["logging_step"], jax.random.fold_in(rng, epoch), frames,
            batch_size, multi_step=multi_step, tail_runner=tail_runner,
            device_corpus=corpus_train)
        loc_logs_val = (val_epoch(val_loader, state, val_step, mesh, args,
                                  jax.random.fold_in(rng, 2**20 + epoch),
                                  frames, batch_size,
                                  tail_runner=tail_runner,
                                  device_corpus=corpus_val)
                        if val_dataset is not None else {})

        print(f'Ran {epoch + 1} epochs '
              f'in {time.time() - start_time:.2f} seconds')

        if loc_logs_val.get("locAcc_val") is not None:
            current_accuracy = float(
                np.asarray(loc_logs_val["locAcc_val"]).mean())
            if current_accuracy > best_acc:
                best_acc = current_accuracy
                best_state_params = jax.tree.map(np.asarray, state.params)

        for key, value in dict(loc_logs_train, **loc_logs_val).items():
            if key not in logs:
                logs[key] = [None for _ in range(epoch)]
            if isinstance(value, np.ndarray):
                value = value.tolist()
            logs[key].append(value)
        logs["epoch"].append(epoch)

        if path_checkpoint is not None \
                and (epoch % logs["saveStep"] == 0 or epoch == n_epoch - 1):
            _save_training_checkpoint(
                state, best_state_params, model_bundle, args,
                f"{path_checkpoint}_{epoch}.pt")
            if getattr(args, 'is_local_master', True):
                utils.save_logs(logs, path_checkpoint + "_logs.json")
    return state


def _save_training_checkpoint(state, best_params, model_bundle, args, path):
    """Reference layout: {gEncoder, cpcCriterion, optimizer, best} torch
    pickle; model/criterion state dicts readable by the reference code.

    With --ckpt_format orbax, the full TrainState additionally goes into a
    native orbax checkpoint (`<path>.orbax/`) used preferentially on resume
    (exact optimizer state, async-friendly, no host pickling of 100M+ params
    runs); the torch pickle stays for reference interop."""
    master = getattr(args, 'is_local_master', True)
    batch_stats = (state.batch_stats.get('model')
                   if state.batch_stats else None)
    model_sd = crit_sd = best_sd = None
    if master:
        model_sd = params_to_torch_state_dict(
            jax.tree.map(np.asarray, state.params['model']),
            batch_stats=jax.tree.map(np.asarray, batch_stats)
            if batch_stats else None,
            norm_mode=args.normMode)
        crit_sd = params_to_torch_state_dict(
            jax.tree.map(np.asarray, state.params['criterion']),
            rnn_mode=args.rnnMode)
        if best_params is not None:
            best_sd = params_to_torch_state_dict(best_params['model'],
                                                 norm_mode=args.normMode)
    if getattr(args, 'ckpt_format', 'torch') == 'orbax':
        # collective under multi-process: EVERY rank enters the save (the
        # commit barrier needs all of them); orbax writes from the
        # primary only.
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path) + '.orbax',
                   {'params': jax.tree.map(np.asarray, state.params),
                    'opt_state': jax.tree.map(np.asarray, state.opt_state),
                    'step': np.asarray(state.step)},
                   force=True)
        if master:
            save_checkpoint(model_sd, crit_sd, {}, best_sd, path)
    else:
        # Flat tensor leaves, not the optax pytree: raw optax named-tuples
        # pickled into the file would make it unreadable by
        # torch.load(weights_only=True) — the default since torch 2.6 and
        # what the reference's loadModel effectively calls — breaking
        # reference-side interop. The treedef is reconstructed on resume
        # from a freshly built optimizer state.
        import torch
        leaves = [torch.from_numpy(np.array(leaf))
                  for leaf in jax.tree_util.tree_leaves(state.opt_state)]
        # 'step' restores the global step counter: the compiled step's
        # negative-sampling key is fold_in(rng, state.step), so a resume
        # that restarted at step 0 would replay epoch 0's negative draws
        # (and diverge from the uninterrupted trajectory — test_orbax.py)
        opt_plain = {'format': 'optax_leaves', 'leaves': leaves,
                     'step': int(state.step)}
        save_checkpoint(model_sd, crit_sd, opt_plain, best_sd, path)


def _peek_distributed(argv) -> bool:
    """True when this run will end up in distributed mode — either a literal
    `--distributed` flag, or a checkpoint auto-resume whose saved
    `checkpoint_args.json` carries distributed=true (restarting a pod run
    with just `--pathCheckpoint <dir>` is the documented resume idiom; the
    restored flag must trigger the same early bootstrap). File IO only —
    must not touch the JAX backend."""
    if '--distributed' in argv:
        return True
    if '--restart' in argv:
        return False
    path = None
    for i, a in enumerate(argv):
        if a == '--pathCheckpoint' and i + 1 < len(argv):
            path = argv[i + 1]
        elif a.startswith('--pathCheckpoint='):
            path = a.split('=', 1)[1]
    if path is None:
        return False
    cdata = get_checkpoint_data(path)
    if cdata is None:
        return False
    return bool(getattr(cdata[2], 'distributed', False))


def main(argv):
    from .utils.cache import enable_compilation_cache
    enable_compilation_cache()
    # Multi-host bootstrap must run BEFORE the first backend touch:
    # parse_args counts jax.devices(), which initializes the local backend,
    # and jax.distributed.initialize refuses to run after that. Peek argv
    # (and, on auto-resume, the saved checkpoint args) and bootstrap first;
    # the discovered rank fields are copied onto args after parsing.
    dist_boot = None
    if _peek_distributed(argv):
        dist_boot = argparse.Namespace()
        init_distributed_mode(dist_boot)
    args = parse_args(argv)
    utils.apply_precision(args.precision)
    utils.apply_prng_impl(getattr(args, 'prng', 'rbg'))

    logs = {"epoch": [], "iter": [], "saveStep": args.save_step}
    logs["logging_step"] = args.logging_step
    load_optimizer = False

    if args.pathCheckpoint is not None and not args.restart:
        cdata = get_checkpoint_data(args.pathCheckpoint)
        if cdata is not None:
            data, logs, loc_args = cdata
            print(f"Checkpoint detected at {data}")
            load_args(args, loc_args,
                      forbidden_attr={"nGPU", "pathCheckpoint", "debug",
                                      "restart", "world_size", "global_rank",
                                      "local_rank", "n_nodes", "node_id",
                                      "n_gpu_per_node", "max_size_loaded",
                                      "nEpoch", "save_step",
                                      "corpus_on_device"})
            args.load, load_optimizer = [data], True
            args.loadCriterion = True

    logs["logging_step"] = args.logging_step

    if args.nGPU == 0:
        args.nGPU = 1

    if args.signal_quality_path is not None and \
            not os.path.exists(args.signal_quality_path):
        raise ValueError("%s can't be found. Are you sure you provided the "
                         "right location ?" % args.signal_quality_path)

    if args.distributed:
        print('Distributed mode, moving to 1 process for data loading')
        args.n_process_loader = 1
        if dist_boot is not None:
            for k, v in vars(dist_boot).items():
                setattr(args, k, v)
        else:
            init_distributed_mode(args)
    args.is_local_master = (not args.distributed) or (args.global_rank == 0)

    # Host-side loader batch. Multi-host: each process loads only its
    # per-host slice (batchSizeGPU x addressable devices); the global batch
    # (world_size x this) is assembled in shard_batch via
    # jax.make_array_from_process_local_data. Single-host: nGPU devices.
    model_axis = max(getattr(args, 'model_axis_size', 1), 1)
    if getattr(args, 'dcn_axis_size', 0) > 1 and model_axis > 1:
        raise ValueError("--dcn_axis_size composes with the data-parallel "
                         "paths only, not --model_axis_size > 1")
    if model_axis > 1:
        if (getattr(args, 'supervised', False)
                or args.cpc_mode in ('bert', 'none')):
            raise ValueError("--model_axis_size > 1 supports the "
                             "unsupervised CPC path only (signal-quality "
                             "weighting, masking, augmentation, "
                             "--multihead_rnn, --steps_per_dispatch and "
                             "the sequential-sampling hidden carry "
                             "compose; BERT/supervised do not)")
        if args.nPredicts % model_axis:
            raise ValueError(f"nPredicts={args.nPredicts} not divisible by "
                             f"model_axis_size={model_axis}")
        if args.distributed and jax.process_count() > 1:
            # Multi-host 2-D mesh: the model axis must stay WITHIN each
            # host so head collectives ride local links and every process's
            # addressable devices form whole ('data') rows — the layout
            # shard_state_2d and shard_batch assume.
            if jax.local_device_count() % model_axis:
                raise ValueError(
                    f"local device count {jax.local_device_count()} not "
                    f"divisible by model_axis_size={model_axis}")
        elif args.nGPU % model_axis:
            raise ValueError(f"nGPU={args.nGPU} not divisible by "
                             f"model_axis_size={model_axis}")
    if args.distributed and jax.process_count() > 1:
        # per-host slice of the global batch; with a model axis the batch
        # is replicated across it, so only the host's data rows count
        batch_size = (jax.local_device_count() // model_axis
                      * args.batchSizeGPU)
    elif model_axis > 1:
        # ('data','model') mesh: the model axis replicates the batch
        batch_size = (args.nGPU // model_axis) * args.batchSizeGPU
    else:
        batch_size = args.nGPU * args.batchSizeGPU

    utils.set_seed(args.random_seed)
    print(f'CONFIG:\n{json.dumps(vars(args), indent=4, sort_keys=True)}')
    print('-' * 50)

    seq_names, speakers = findAllSeqs(args.pathDB,
                                      no_speaker=args.no_speaker,
                                      extension=args.file_extension,
                                      loadCache=not args.ignore_cache,
                                      format=args.naming_convention,
                                      cache_path=args.path_cache)

    print(f'Found files: {len(seq_names)} seqs, {len(speakers)} speakers')

    if args.pathTrain is not None:
        seq_train = filterSeqs(args.pathTrain, seq_names)
    else:
        seq_train = seq_names
    if len(seq_train) == 0:
        raise ValueError("No training sequences can be found. Please check "
                         "that you provided the right path, and specified "
                         "the right audio extension.")

    if args.pathVal is None:
        print('No validation data specified!')
        if args.samplingType == "temporalsamespeaker":
            blocks, curr = [], None
            for seq_id, seq_path in seq_train:
                if curr != seq_id:
                    blocks.append([(seq_id, seq_path)])
                    curr = seq_id
                else:
                    blocks[-1].append((seq_id, seq_path))
            random.shuffle(blocks)
            seq_train = [item for b in blocks for item in b]
        else:
            random.shuffle(seq_train)
        size_train = int(0.95 * len(seq_train))
        seq_train, seq_val = seq_train[:size_train], seq_train[size_train:]
        print(f'Found files: {len(seq_train)} train, {len(seq_val)} val')
    else:
        seq_val = filterSeqs(args.pathVal, seq_names)

    if args.debug:
        seq_train = seq_train[-1000:]
        seq_val = seq_val[-100:]

    phone_labels, n_phones = None, None
    if args.supervised and args.pathPhone is not None:
        print("Loading the phone labels at " + args.pathPhone)
        phone_labels, n_phones = parseSeqLabels(args.pathPhone)
        print(f"{n_phones} phones found")

    # Noise dataset
    seq_noise = None
    noise_dataset = None
    if args.pathDBNoise is not None and (args.augment_past
                                         or args.augment_future):
        seq_noise, _ = findAllSeqs(args.pathDBNoise,
                                   extension=args.noise_extension,
                                   loadCache=True, speaker_level=0)
        if args.pathSeqNoise is not None:
            seq_noise = filterSeqs(args.pathSeqNoise, seq_noise)
        if args.debug:
            seq_noise = seq_noise[:100]
        print(f'\nLoading noise data at {args.pathDBNoise}')
        noise_dataset = AudioBatchData(
            args.pathDBNoise, args.sizeWindow, seq_noise, None, 1,
            transform=PeakNorm(), nProcessLoader=args.n_process_loader,
            MAX_SIZE_LOADED=args.max_size_loaded, augment_future=False,
            augment_past=args.meta_aug,
            augmentation=augmentation_factory(args, None,
                                              applied_on_noise=True),
            keep_temporality=(args.naming_convention or '').startswith(
                "id_spkr_onset_offset"),
            past_equal_future=args.meta_aug)

    if args.distributed:
        def filter_distributed(files):
            start = len(files) * args.global_rank // args.world_size
            end = len(files) * (args.global_rank + 1) // args.world_size
            return files[start:end]
        print(f'Initial worker files: {len(seq_train)} train, '
              f'{len(seq_val)} val')
        seq_train = filter_distributed(seq_train)
        seq_val = filter_distributed(seq_val)
        if seq_noise is not None:
            seq_noise = filter_distributed(seq_noise)
        print(f'Current worker files: {len(seq_train)} train, '
              f'{len(seq_val)} val')

    # --augment_on_device: the chip augments after upload; the host ships
    # clean (dedup/int16-wire-friendly) windows for every device-ported
    # augmentation. Types with no device implementation stay on the host
    # pipeline (hybrid split): the host chain runs first, then the device
    # chain on top. The reference applies a combined chain in listed
    # order, so an order the split cannot honor (a device type listed
    # BEFORE a host type) is rejected below rather than silently training
    # on a reordered composition.
    device_augment = None
    host_aug_types = args.augment_type
    # --augment_type is nargs='+' (a list), so a plain `!= 'none'` compare
    # is vacuously True for ['none']; count only real augmentation names
    aug_active = any(t != 'none' for t in (args.augment_type or []))
    if getattr(args, 'augment_on_device', False) and (
            args.augment_past or args.augment_future) and aug_active:
        from .data.augment_device import (DEVICE_AUGMENTATIONS,
                                          make_device_augment)

        def _device_ok(t):
            # device pitch ports cover every algo family: vocoder or WSOLA
            # for 'pitch' (per --pitch_algo), quick resample for
            # 'pitch_quick', and quick-or-WSOLA for 'pitch_dropout' (host
            # semantics: PitchDropout(quick=(algo != 'wsola')))
            return t in DEVICE_AUGMENTATIONS
        # 'none' entries are no-ops (the factory drops them too): filter
        # them BEFORE the split so they neither trip the ordering check
        # nor reach the host factory as a bogus host-only type.
        aug_types = [canonical_augment_type(t) for t in args.augment_type
                     if t != 'none']
        dev_types = [t for t in aug_types if _device_ok(t)]
        host_aug_types = [t for t in aug_types if not _device_ok(t)]
        dev_pos = [i for i, t in enumerate(aug_types) if _device_ok(t)]
        host_pos = [i for i, t in enumerate(aug_types) if not _device_ok(t)]
        if dev_pos and host_pos and min(dev_pos) < max(host_pos):
            raise ValueError(
                "--augment_on_device runs the chain as host types first, "
                f"then device types ({host_aug_types} -> {dev_types}), "
                "which would silently reorder the composition you listed "
                f"({aug_types}; the reference applies --augment_type in "
                "order). List the host-only types first, or drop "
                "--augment_on_device.")
        chain = make_device_augment(
            dev_types, shift_max=int(args.shift_max),
            bandreject_scaler=args.bandreject_scaler, t_ms=args.t_ms,
            noise_dataset=noise_dataset,
            snr_min=args.min_snr_in_db, snr_max=args.max_snr_in_db,
            batch_size=batch_size,
            ir_paths=args.pathImpulseResponses,
            ir_prob=args.impulse_response_prob,
            ir_batch_wise=args.ir_batch_wise,
            noise_sampling=("temporalsamespeaker"
                            if args.temporal_additive_noise else "uniform"),
            pitch_algo=getattr(args, 'pitch_algo', 'vocoder'))
        if chain is not None:
            device_augment = (chain, args.augment_past, args.augment_future,
                              args.past_equal_future)
            print("Augmentations run ON DEVICE: %s" % dev_types)
            if host_aug_types:
                print("Augmentations kept ON HOST (no device port): %s"
                      % host_aug_types)

    # Hybrid split: host pipeline handles only the types the device chain
    # doesn't cover (all of them when --augment_on_device is off).
    use_host_aug = device_augment is None or bool(host_aug_types)

    if getattr(args, 'corpus_on_device', False):
        host_aug_active = any(
            t != 'none' for t in (host_aug_types or []))
        if (args.augment_past or args.augment_future) and use_host_aug \
                and host_aug_active:
            raise ValueError(
                "--corpus_on_device needs clean host windows, but "
                f"host-side augmentations are active ({host_aug_types}). "
                "Use --augment_on_device with device-ported types, or "
                "drop --corpus_on_device.")

    print(f'\nLoading audio data at {args.pathDB}')
    host_args = args
    if device_augment is not None and host_aug_types:
        host_args = argparse.Namespace(**vars(args))
        host_args.augment_type = host_aug_types
    train_dataset = AudioBatchData(
        args.pathDB, args.sizeWindow, seq_train, phone_labels, len(speakers),
        nProcessLoader=args.n_process_loader,
        MAX_SIZE_LOADED=args.max_size_loaded,
        augment_future=args.augment_future and use_host_aug,
        augment_past=args.augment_past and use_host_aug,
        augmentation=(augmentation_factory(host_args, noise_dataset)
                      if use_host_aug else None),
        keep_temporality=args.samplingType == "temporalsamespeaker",
        signal_quality_path=args.signal_quality_path,
        signal_quality_step=args.signal_quality_step,
        signal_quality_mode=args.signal_quality_mode,
        past_equal_future=args.past_equal_future)
    print("Training dataset loaded\n")

    if seq_val:
        val_dataset = AudioBatchData(args.pathDB, args.sizeWindow, seq_val,
                                     phone_labels, len(speakers),
                                     nProcessLoader=args.n_process_loader)
        print("Validation dataset loaded\n")
    else:
        val_dataset = None

    # Model
    if args.load is not None:
        model_bundle, args.hiddenGar, args.hiddenEncoder = \
            fl.loadModel(args.load)
    else:
        model_bundle = fl.init_model(args, seed=args.random_seed or 0)

    # Mesh. Built BEFORE the criterion: the global-negatives pool size must
    # be the mesh's ACTUAL data-axis extent — with --model_axis_size>1 the
    # data axis has nGPU/model_axis devices, and under multi-host it spans
    # every process; sizing the pool from nGPU would make the criterion's
    # promise_in_bounds gather read out of bounds silently. Multi-host: the
    # mesh must span every device in the pod (shard_map's psum is the
    # gradient all-reduce); nGPU only sizes single-host meshes.
    if model_axis > 1:
        from .parallel.mesh import make_mesh_2d
        if args.distributed and jax.process_count() > 1:
            # All devices pod-wide, process-major: with the model axis
            # within each host (validated above) the reshaped device grid
            # gives every process whole 'data' rows.
            mesh = make_mesh_2d(len(jax.devices()) // model_axis,
                                model_axis)
        else:
            mesh = make_mesh_2d(args.nGPU // model_axis, model_axis)
    elif args.distributed and jax.process_count() > 1:
        mesh = make_mesh(-1, dcn_axis_size=args.dcn_axis_size)
    else:
        mesh = make_mesh(args.data_axis_size if args.data_axis_size > 0
                         else args.nGPU,
                         dcn_axis_size=args.dcn_axis_size)
    print(f"Mesh: {mesh}")

    # Criterion
    from .parallel.mesh import data_axes as _data_axes
    _dax = _data_axes(mesh)
    _data_extent = _mesh_data_extent(mesh)
    criterion = get_criterion(
        args, 160, len(speakers), n_phones, data_axis=_dax,
        pool_axis_size=_data_extent
        if getattr(args, 'global_negatives', False) else 1)
    criterion_vars = init_criterion_vars(criterion, args, model_bundle)
    if args.load is not None and args.loadCriterion:
        state_dict = load_torch_checkpoint(args.load[0])
        crit_params, _, unmatched = params_from_torch_state_dict(
            state_dict["cpcCriterion"], criterion_vars['params'])
        criterion_vars = {'params': _merge(criterion_vars['params'],
                                           crit_params)}
        if unmatched:
            print(f"(criterion: skipped {len(unmatched)} keys)")

    criterion_local = None
    if model_axis > 1:
        criterion_local = criterion.clone(
            n_predicts=args.nPredicts // model_axis, head_axis='model',
            n_predicts_total=args.nPredicts, n_skipped=0)
    tx = make_optimizer(args)
    state = create_train_state(model_bundle.variables, criterion_vars, tx)

    if load_optimizer and args.load is not None:
        orbax_dir = args.load[0] + '.orbax'
        if os.path.isdir(orbax_dir):
            import orbax.checkpoint as ocp
            ckptr = ocp.PyTreeCheckpointer()
            restored = ckptr.restore(
                orbax_dir,
                item={'params': state.params,
                      'opt_state': state.opt_state,
                      'step': np.asarray(state.step)})
            state = state.replace(
                params=jax.tree.map(jnp.asarray, restored['params']),
                opt_state=jax.tree.map(jnp.asarray, restored['opt_state']),
                step=jnp.asarray(restored['step']))
            print("Restored full train state from orbax")
        else:
            state_dict = load_torch_checkpoint(args.load[0])
            opt_saved = state_dict.get("optimizer")
            try:
                if (isinstance(opt_saved, dict)
                        and opt_saved.get('format') == 'optax_leaves'):
                    treedef = jax.tree_util.tree_structure(state.opt_state)
                    leaves = [jnp.asarray(np.asarray(leaf))
                              for leaf in opt_saved['leaves']]
                    state = state.replace(
                        opt_state=jax.tree_util.tree_unflatten(treedef,
                                                               leaves))
                    if 'step' in opt_saved:
                        state = state.replace(
                            step=jnp.asarray(opt_saved['step']))
                    print("Restored optimizer state")
                elif opt_saved is not None and not isinstance(opt_saved,
                                                              dict):
                    # legacy round-1 layout: the raw optax pytree
                    state = state.replace(opt_state=jax.tree.map(
                        jnp.asarray, opt_saved))
                    print("Restored optimizer state (legacy layout)")
            except Exception as e:
                print(f"Could not restore optimizer state: {e}")

    # Commit the whole train state to the mesh up front: the first step
    # would otherwise compile once for uncommitted host inputs and again
    # for the committed donated outputs of step 1 (two full remote
    # compiles of the same program).
    if criterion_local is not None:
        from .training import shard_state_2d
        state = shard_state_2d(mesh, state, multihead=args.multihead_rnn)
    else:
        from .parallel.mesh import replicate
        state = replicate(mesh, state)

    # Checkpoint dir
    if args.pathCheckpoint is not None:
        if not os.path.isdir(args.pathCheckpoint):
            os.makedirs(args.pathCheckpoint, exist_ok=True)
        args.pathCheckpoint = os.path.join(args.pathCheckpoint, "checkpoint")
        if args.is_local_master:
            with open(args.pathCheckpoint + "_args.json", 'w') as f:
                json.dump(vars(args), f, indent=2)

    lr_fn = utils.make_lr_schedule(args.learningRate, args.schedulerStep,
                                   args.schedulerRamp)

    uses_mask = args.cpc_mode == 'bert' or args.mask_prob > 0
    keep_hidden = (args.samplingType == 'sequential'
                   and args.arMode in ('GRU', 'LSTM', 'RNN')
                   and args.cpc_mode != 'bert')
    args._keep_hidden = keep_hidden
    if criterion_local is not None:
        from .training import build_steps_2d
        ts2, vs2 = build_steps_2d(model_bundle.module, criterion_local, tx,
                                  mesh, state, n_skipped=args.n_skipped,
                                  device_augment=device_augment,
                                  has_quality=args.signal_quality_path
                                  is not None, uses_mask=uses_mask,
                                  keep_hidden=keep_hidden,
                                  multihead=args.multihead_rnn)

        if keep_hidden:
            def train_step(state, batch, labels=None, rng=None,
                           quality=None, mask_indices=None, hidden=None):
                return ts2(state, batch, rng, quality=quality,
                           mask_indices=mask_indices, hidden=hidden)

            def val_step(state, batch, labels=None, rng=None, quality=None,
                         mask_indices=None, hidden=None):
                return vs2(state, batch, rng, quality=quality,
                           mask_indices=mask_indices, hidden=hidden)
        else:
            def train_step(state, batch, labels=None, rng=None,
                           quality=None, mask_indices=None):
                return ts2(state, batch, rng, quality=quality,
                           mask_indices=mask_indices)

            def val_step(state, batch, labels=None, rng=None, quality=None,
                         mask_indices=None):
                return vs2(state, batch, rng, quality=quality,
                           mask_indices=mask_indices)
    else:
        train_step, val_step = build_steps(
            model_bundle.module, criterion, tx, mesh,
            has_quality=args.signal_quality_path is not None,
            uses_mask=uses_mask, keep_hidden=keep_hidden,
            remat=getattr(args, 'remat', False),
            device_augment=device_augment)

    # Optional n-steps-per-dispatch program (amortizes per-dispatch host
    # round-trips; same math as single-step). Sequential sampling needs a
    # per-batch hidden carry from the host, so it stays single-step.
    multi_step = None
    spd = max(getattr(args, 'steps_per_dispatch', 1), 1)
    if spd > 1 and keep_hidden:
        print("--steps_per_dispatch > 1 is incompatible with the "
              "sequential-sampling hidden carry; using 1")
        spd = 1
    if (spd > 1 and getattr(args, 'corpus_on_device', False)
            and criterion_local is not None):
        # the 2-D multi-step program has no in-scan corpus gather
        print("--steps_per_dispatch > 1 with --corpus_on_device is not "
              "wired on the 2-D head-sharded mesh; using 1")
        spd = 1
    if (spd > 1 and getattr(args, 'corpus_on_device', False)
            and jax.process_count() > 1):
        # GroupAssembler flushes partial groups at pack swaps; hosts cross
        # pack boundaries at different steps, so multi-pack corpora would
        # dispatch different program sequences per process and desync the
        # pod. Single-pack corpora (the case the HBM-resident path is for)
        # have no swaps: groups flush only when full or at the epoch tail,
        # identically on every host (batch counts are lock-step-checked).
        from jax.experimental import multihost_utils
        pod_packs = multihost_utils.process_allgather(
            np.int32(train_dataset.getNPacks()))
        if int(np.max(pod_packs)) > 1:
            print("--steps_per_dispatch > 1 with --corpus_on_device needs "
                  "single-pack corpora under multi-process (pack-swap "
                  "group flushes would desync the pod); using 1. Raise "
                  "--max_size_loaded to fit one pack per host.")
            spd = 1
    if spd > 1 and criterion_local is not None:
        from .training import build_multi_step_2d
        multi_step = build_multi_step_2d(
            model_bundle.module, criterion_local, tx, mesh, state, spd,
            n_skipped=args.n_skipped, device_augment=device_augment,
            has_quality=args.signal_quality_path is not None,
            uses_mask=uses_mask, multihead=args.multihead_rnn)
    elif spd > 1:
        from .training import build_multi_step
        multi_step = build_multi_step(
            model_bundle.module, criterion, tx, mesh, spd,
            has_quality=args.signal_quality_path is not None,
            uses_mask=uses_mask, remat=getattr(args, 'remat', False),
            device_augment=device_augment,
            # --corpus_on_device composes: the scan body gathers each
            # step's batch from the HBM-resident pack, so one dispatch of
            # (spd, B) int32 offsets drives spd optimizer steps
            gather_window=(args.sizeWindow
                           if getattr(args, 'corpus_on_device', False)
                           else None),
            corpus_sharded=(getattr(args, 'corpus_on_device', False)
                            and jax.process_count() > 1))
    args._spd = spd

    # Ragged tail batches: single-host, the natural-size single-device
    # TailRunner; multi-host, the pad-and-mask PodTailRunner on the main
    # mesh (example-weighted steps keep every process in sync). The 2-D
    # head-sharded mesh keeps the single-host runner only — the weighted
    # step variant is built for the data-parallel paths.
    tail_runner = None
    if jax.process_count() == 1:
        if criterion_local is not None:
            from .training import shard_state_2d
            restore_fn = lambda s: shard_state_2d(  # noqa: E731
            mesh, s, multihead=args.multihead_rnn)
        else:
            from .parallel.mesh import replicate as _rep
            restore_fn = lambda s: _rep(mesh, s)            # noqa: E731
        tail_runner = TailRunner(model_bundle.module, criterion, tx, args,
                                 mesh, restore_fn,
                                 device_augment=device_augment)
    elif criterion_local is None:
        tail_runner = PodTailRunner(model_bundle.module, criterion, tx,
                                    args, mesh, batch_size,
                                    encoded_seq_len(args.sizeWindow),
                                    device_augment=device_augment)

    # Every rank keeps the checkpoint path when --ckpt_format orbax: the
    # orbax save is internally collective under multi-process (all ranks
    # must enter it; a master-only call deadlocks the pod on its commit
    # barrier). The torch pickle and log writes stay master-only inside
    # _save_training_checkpoint / run.
    ckpt_path = args.pathCheckpoint
    if not args.is_local_master \
            and getattr(args, 'ckpt_format', 'torch') != 'orbax':
        ckpt_path = None
    run(train_dataset, val_dataset, batch_size, args.samplingType, state,
        train_step, val_step, mesh, args, args.nEpoch,
        ckpt_path,
        lr_fn, logs, model_bundle, criterion, multi_step=multi_step,
        tail_runner=tail_runner)


def _merge(base, override):
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def parse_args(argv):
    parser = argparse.ArgumentParser(description='Trainer')
    parser = set_default_cpc_config(parser)
    parser = set_tpu_config(parser)

    group_db = parser.add_argument_group('Dataset')
    group_db.add_argument('--pathDB', type=str, default=None,
                          help='Path to the directory containing the data.')
    group_db.add_argument('--file_extension', type=str, default=".flac",
                          help="Extension of the audio files in the dataset.")
    group_db.add_argument('--pathTrain', type=str, default=None,
                          help='Path to a .txt file containing the list of '
                          'the training sequences.')
    group_db.add_argument('--pathVal', type=str, default=None,
                          help='Path to a .txt file containing the list of '
                          'the validation sequences.')
    group_db.add_argument('--n_process_loader', type=int, default=8,
                          help='Number of processes to call to load the '
                          'dataset')
    group_db.add_argument('--ignore_cache', action='store_true',
                          help='Activate if the dataset has been modified '
                          'since the last training session.')
    group_db.add_argument('--path_cache', type=str, default=None,
                          help="For big datasets, path to an existing cache")
    group_db.add_argument('--max_size_loaded', type=int, default=4000000000,
                          help='Maximal amount of data (in byte) a dataset '
                          'can hold in memory at any given time')

    group_supervised = parser.add_argument_group(
        'Supervised mode (depreciated)')
    group_supervised.add_argument('--supervised', action='store_true',
                                  help='(Depreciated) Disable the CPC loss '
                                  'and activate the supervised mode.')
    group_supervised.add_argument('--pathPhone', type=str, default=None,
                                  help='(Supervised mode only) Path to a '
                                  '.txt containing the phone labels.')
    group_supervised.add_argument('--CTC', action='store_true')

    group_save = parser.add_argument_group('Save')
    group_save.add_argument('--pathCheckpoint', type=str, default=None,
                            help="Path of the output directory.")
    group_save.add_argument('--logging_step', type=int, default=1000)
    group_save.add_argument('--save_step', type=int, default=5,
                            help="Frequency (in epochs) at which a "
                            "checkpoint should be saved")

    group_load = parser.add_argument_group('Load')
    group_load.add_argument('--load', type=str, default=None, nargs='*',
                            help="Load an exsiting checkpoint. Should give a "
                            "path to a .pt file.")
    group_load.add_argument('--loadCriterion', action='store_true',
                            help="If --load is activated, load the state of "
                            "the training criterion as well.")
    group_load.add_argument('--restart', action='store_true',
                            help="If any checkpoint is found, ignore it and "
                            "restart the training from scratch.")

    group_gpu = parser.add_argument_group('GPUs')
    group_gpu.add_argument('--nGPU', type=int, default=-1,
                           help="Number of devices to use (default: all "
                           "available devices)")
    group_gpu.add_argument('--batchSizeGPU', type=int, default=8,
                           help='Number of batches per device.')
    parser.add_argument('--debug', action='store_true',
                        help="Load only a very small amount of files for "
                        "debugging purposes.")

    group_dist = parser.add_argument_group('Distributed training')
    group_dist.add_argument('--distributed', action='store_true')
    group_dist.add_argument("--local_rank", type=int, default=-1,
                            help="Multi-GPU - Local rank")
    group_dist.add_argument("--master_port", type=int, default=-1,
                            help="Master port (for multi-node SLURM jobs)")

    args = parser.parse_args(argv)

    if args.pathDB is None and (args.pathCheckpoint is None or args.restart):
        parser.print_help()
        print("Either provides an input dataset or a checkpoint to load")
        sys.exit()

    assert args.bandreject_scaler >= 0

    if getattr(args, 'neg_pool_group', 0):
        if getattr(args, 'global_negatives', False):
            raise ValueError("--neg_pool_group and --global_negatives are "
                             "mutually exclusive (one narrows the negative "
                             "pool, the other widens it)")
        per_shard = args.batchSizeGPU
        if per_shard % args.neg_pool_group:
            raise ValueError(
                f"--neg_pool_group {args.neg_pool_group} must divide the "
                f"per-shard batch (batchSizeGPU={per_shard})")

    if args.samplingType == "temporalsamespeaker" and \
            (args.pathTrain is not None or args.pathVal is not None):
        raise ValueError(
            "Can not apply temporal sampling (with same speaker) if "
            "pathTrain or pathVal is specified.")

    if args.samplingType == "temporalsamespeaker" and \
            args.naming_convention not in [
                'id_spkr_onset_offset',
                'id_spkr_onset_offset_spkr_onset_offset', 'spkr-id',
                'spkr_id_nb', 'spkr-id-nb', 'no_speaker', 'full_seedlings']:
        raise ValueError(
            "If you want to use temporalsamespeaker sampling type, you must "
            "set naming_convention accordingly.")

    # The reference writes these two checks with a precedence bug
    # (`A and B or C` parses as `(A and B) or C`) and compares the
    # nargs='+' LIST against the string "none" (always False,
    # `cpc/train.py:657-661`) — so `--meta_aug --meta_aug_type none`
    # sails past its validation and crashes later in the factory.
    # Implement the intended rules instead (SURVEY §2.10).
    meta_aug_active = any(t != 'none' for t in (args.meta_aug_type or []))
    if not args.meta_aug and args.meta_aug_type is not None:
        raise ValueError("You specified parameters --meta_aug_type without "
                         "having activated --meta_aug flag.")
    if args.meta_aug and not meta_aug_active:
        raise ValueError("You specified flag --meta_aug, but you haven't "
                         "specified meta_aug_type")

    if args.pathCheckpoint is not None:
        args.pathCheckpoint = os.path.abspath(args.pathCheckpoint)
    if args.load is not None:
        args.load = [os.path.abspath(x) for x in args.load]

    if args.random_seed is None:
        args.random_seed = random.randint(0, 2**31)

    n_devices = len(jax.devices())
    if args.nGPU < 0:
        args.nGPU = n_devices
    assert args.nGPU <= n_devices, \
        f"number of devices asked: {args.nGPU}, " \
        f"number of devices detected: {n_devices}"
    print(f"Let's use {args.nGPU} devices!")

    if args.arMode == 'no_ar':
        args.hiddenGar = args.hiddenEncoder
    return args


# Reference-spelled alias
parseArgs = parse_args


def cli():
    main(sys.argv[1:])


if __name__ == "__main__":
    cli()
