"""The per-epoch train/validation loops (split out of `train.py`,
round-5 verdict item 6).

`train_epoch` drives the compiled step programs through the prefetch
pipeline: staged single steps, stacked multi-step dispatch groups
(`--steps_per_dispatch`), device-resident-corpus offset groups
(`--corpus_on_device`), ragged-tail routing (`train_tails`), windowed
telemetry (`dispatch.WindowLogger`) and the optional `jax.profiler`
trace window. `val_epoch` mirrors the staging paths with per-batch rng
folds and one end-of-pass metric fetch.

Unit surface: tests/test_train_e2e.py (tail routing, val rng),
tests/test_corpus_on_device.py, tests/test_multi_step.py,
tests/test_prefetch.py.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .dispatch import (EPOCH_END as _EPOCH_END, GroupAssembler,
                       WindowLogger, make_label_stager as _make_label_stager,
                       stack_batch as _stack_batch)
from .parallel.mesh import (WireStager, data_extent as _mesh_data_extent,
                            shard_batch)
from .utils import misc as utils
from .utils.prefetch import prefetch


def train_epoch(data_loader, state, train_step, mesh, args, logging_step,
                rng, frames, expected_batch, multi_step=None,
                tail_runner=None, device_corpus=None):
    dropped = 0
    keep_hidden = getattr(args, '_keep_hidden', False)
    hidden = None
    if keep_hidden:
        from .training import init_hidden
        hidden = init_hidden(None, args, expected_batch)

    # n optimizer steps per host dispatch (lax.scan inside the program):
    # amortizes dispatch latency; trajectories match the single-step path
    # to fp-fusion tolerance (tests/test_multi_step.py).
    spd = getattr(args, '_spd', 1) if multi_step is not None else 1
    dispatch_buffer = []
    ragged = []
    idx_buffer = []
    stager = WireStager(mesh)
    _stage_labels = _make_label_stager(mesh, args)
    window = WindowLogger(logging_step)

    def _route_tail(sequence, label, quality, mask):
        """Route a short batch so every example still trains (reference
        `cpc/train.py:145-187` semantics): single-host, mesh-divisible
        sizes join the ragged-program list and others go to the
        single-device TailRunner; multi-host, EVERY short batch goes to
        the PodTailRunner, whose pad-and-mask example-weighted steps run
        on the main mesh at epoch end with counts agreed pod-wide — so
        per-host tails of differing sizes train without desyncing the
        replicated state. Drops are structurally impossible outside the
        hidden-carry mode, whose SequentialSampler emits exclusively
        full batches (`data/samplers.py:69-89`; the reference's cuDNN
        RNN would reject a carry/batch size mismatch anyway)."""
        nonlocal dropped
        if keep_hidden or sequence.shape[0] == 0:
            dropped += 1
        elif getattr(tail_runner, 'wants_all_ragged', False):
            tail_runner.add((sequence, label, quality, mask))
        elif sequence.shape[0] % _mesh_data_extent(mesh) == 0:
            ragged.append((sequence, label, quality, mask))
        elif tail_runner is not None:
            tail_runner.add((sequence, label, quality, mask))
        else:
            dropped += 1

    def _dispatch_stacked(state):
        from .training import shard_stacked_batch
        seqs = np.stack([b[0] for b in dispatch_buffer])
        labs = np.stack([b[1] for b in dispatch_buffer])
        quals = (np.stack([b[2] for b in dispatch_buffer])
                 if dispatch_buffer[0][2] is not None else None)
        masks = (np.stack([b[3] for b in dispatch_buffer])
                 if dispatch_buffer[0][3] is not None else None)
        batches = shard_stacked_batch(mesh, seqs)
        labs = _stage_labels(labs, stacked=True)
        if quals is not None:
            quals = shard_stacked_batch(mesh, quals)
        if masks is not None:
            masks = shard_stacked_batch(mesh, masks)
        dispatch_buffer.clear()
        return multi_step(state, batches, labs, rng, quality=quals,
                          mask_indices=masks)

    def _drain_idx(state):
        """Run a partial offset group (pack boundary / epoch tail) through
        the single-step program — identical math, natural group size."""
        for corpus_ref, offs, lab, qual, msk in idx_buffer:
            batch = device_corpus.put(offs, corpus=corpus_ref)
            lab = shard_batch(mesh, lab)
            qual = shard_batch(mesh, qual) if qual is not None else None
            msk = shard_batch(mesh, msk) if msk is not None else None
            state, all_losses, all_acc = train_step(
                state, batch, lab, rng, quality=qual, mask_indices=msk)
            window.account(all_losses, all_acc)
        idx_buffer.clear()
        return state

    profile_dir = getattr(args, 'profile_dir', None)
    profile_started = False

    # Single-step path: _stack_batch AND the WireStager upload run ON the
    # prefetch thread — batch N+1's host DSP + host->device transfer
    # overlap step N's compute (double-buffered device staging;
    # jax.device_put is thread-safe and asynchronous). The multi-step path
    # keeps raw batches (they're stacked per dispatch group).
    if spd == 1:
        def _prep(full_data):
            sequence, label, quality, mask = _stack_batch(
                full_data, frames, args, True)
            if device_corpus is not None:
                # `--corpus_on_device`: `sequence` is the (B,) window-offset
                # vector (loader built with yield_indices=True); the audio
                # batch is gathered ON the accelerator from the resident
                # pack. Ragged tails gather on host — their fixed-shape
                # device programs don't exist.
                if sequence.shape[0] != expected_batch:
                    seq = data_loader.dataset.gather_windows(sequence)
                    return ('ragged', seq, label, quality, mask)
                device_corpus.ensure(data_loader.dataset.data)
                staged = device_corpus.put(sequence)
            elif sequence.shape[0] != expected_batch:
                return ('ragged', sequence, label, quality, mask)
            else:
                staged = stager.put(sequence)
            lab = _stage_labels(label)
            qual = (shard_batch(mesh, quality.astype(np.float32))
                    if quality is not None else None)
            msk = shard_batch(mesh, mask) if mask is not None else None
            return ('staged', sequence.shape[0], staged, lab, qual, msk)
    elif device_corpus is not None:
        # spd>1 x corpus_on_device: the whole dispatch group is assembled
        # AND staged on the prefetch thread (dispatch.GroupAssembler) —
        # np.stack + the (spd, B) offset device_put overlap the previous
        # group's device compute, so the dispatch thread's per-group work
        # is ONE multi_step call. Groups break at pack swaps (offsets
        # must index the pack they were drawn from) and at the epoch tail
        # (partial groups run through the single-step program, identical
        # math).
        groups = GroupAssembler(mesh, spd, _stage_labels)

        def _prep(full_data):
            if full_data is _EPOCH_END:
                return groups.flush()
            sequence, label, quality, mask = _stack_batch(
                full_data, frames, args, True)
            if sequence.shape[0] != expected_batch:
                seq = data_loader.dataset.gather_windows(sequence)
                return ('ragged', seq, label, quality, mask)
            device_corpus.ensure(data_loader.dataset.data)
            return groups.add(
                (device_corpus.resident,
                 np.asarray(sequence, np.int32),
                 np.asarray(label).astype(np.int32),
                 None if quality is None else quality.astype(np.float32),
                 mask))
    else:
        def _prep(full_data):
            return ('host',) + _stack_batch(full_data, frames, args, True)
    src = data_loader
    if spd > 1 and device_corpus is not None:
        def _with_end(loader):
            yield from loader
            yield _EPOCH_END          # lets _prep flush its partial group
        src = _with_end(data_loader)
    data_iter = prefetch(src, getattr(args, 'host_prefetch', 2),
                         transform=_prep)
    for step, item in enumerate(data_iter):
        if item is None:              # buffered into a pending group
            continue
        if profile_dir is not None:
            # Trace a small window of steady-state steps with jax.profiler.
            # One trace per run: clearing args.profile_dir keeps epoch 2
            # from calling start_trace on top of an open (or finished)
            # trace; epochs shorter than 15 steps close theirs after the
            # loop below.
            if step == 5:
                jax.profiler.start_trace(profile_dir)
                profile_started = True
            elif step == 15:
                jax.profiler.stop_trace()
                print(f"Profiler trace written to {profile_dir}")
                profile_dir = args.profile_dir = None
                profile_started = False
        if item[0] == 'ragged':
            # Ragged tail: shapes must stay static for the main program, so
            # tail batches run after the loop through a second program
            # compiled at their natural size (one-time, persistently
            # cached).
            _, sequence, label, quality, mask = item
            _route_tail(sequence, label, quality, mask)
            continue
        if item[0] == 'host':
            _, sequence, label, quality, mask = item
            if sequence.shape[0] != expected_batch:
                _route_tail(sequence, label, quality, mask)
                continue
            window.n_examples += sequence.shape[0]
            dispatch_buffer.append(
                (sequence.astype(np.float32),
                 np.asarray(label).astype(np.int32),
                 None if quality is None else quality.astype(np.float32),
                 mask))
            if len(dispatch_buffer) < spd:
                all_losses = None
            else:
                state, all_losses, all_acc = _dispatch_stacked(state)
                # (spd, 1, nPredicts) -> (spd, nPredicts)
                all_losses = all_losses.reshape(spd, -1)
                all_acc = all_acc.reshape(spd, -1)
        elif item[0] == 'idxgroup':
            # pre-staged on the prefetch thread: one multi_step call
            _, corpus_ref, offs_d, labs_d, quals_d, masks_d, n_ex = item
            window.n_examples += n_ex
            state, all_losses, all_acc = multi_step(
                state, corpus_ref, offs_d, labs_d, rng, quality=quals_d,
                mask_indices=masks_d)
            all_losses = all_losses.reshape(spd, -1)
            all_acc = all_acc.reshape(spd, -1)
        elif item[0] == 'idxpartial':
            # pack boundary / epoch tail: fewer than spd offset vectors —
            # single-step program, same math
            idx_buffer.extend(item[1])
            window.n_examples += sum(b[1].shape[0] for b in item[1])
            state = _drain_idx(state)
            all_losses = None
        else:
            _, bsz, batch, label, quality, mask = item
            window.n_examples += bsz
            if keep_hidden:
                state, all_losses, all_acc, hidden = train_step(
                    state, batch, label, rng, quality=quality,
                    mask_indices=mask, hidden=hidden)
            else:
                state, all_losses, all_acc = train_step(
                    state, batch, label, rng, quality=quality,
                    mask_indices=mask)
        if all_losses is not None and all_losses.size > 0:
            # A freshly dispatched group is now queued on the device:
            # emit the previous window's deferred boundary FIRST, so its
            # metric fetch (a device sync) finds the pipeline full
            # instead of draining it to idle while the host prints
            # (measured ~0.4 ms/batch of device idle per 50-step window
            # on the tunnel backend when the boundary was inline).
            window.maybe_emit()
            window.account(all_losses, all_acc)

    window.maybe_emit()       # epoch ended right after a boundary

    if profile_started:
        # epoch ended before step 15: close the trace instead of leaving
        # it open (a second start_trace next epoch would raise)
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {profile_dir}")
        args.profile_dir = None

    # Ragged tail batches: their own program at their natural size.
    for seq, lab, qual, msk in ragged:
        batch = stager.put(seq)
        lab = shard_batch(mesh, np.asarray(lab).astype(np.int32))
        if qual is not None:
            qual = shard_batch(mesh, qual.astype(np.float32))
        if msk is not None:
            msk = shard_batch(mesh, msk)
        window.n_examples += seq.shape[0]
        state, all_losses, all_acc = train_step(state, batch, lab, rng,
                                                quality=qual,
                                                mask_indices=msk)
        window.account(all_losses, all_acc)

    # Offset-group tail (corpus_on_device x steps_per_dispatch): fewer
    # than spd offset vectors left — single-step program, same math.
    if idx_buffer:
        state = _drain_idx(state)

    # Tail: fewer than spd batches left — run them through the single-step
    # program (identical math) instead of dropping them.
    for seq, lab, qual, msk in dispatch_buffer:
        batch, lab = shard_batch(mesh, seq, lab)
        if qual is not None:
            qual = shard_batch(mesh, qual)
        if msk is not None:
            msk = shard_batch(mesh, msk)
        state, all_losses, all_acc = train_step(state, batch, lab, rng,
                                                quality=qual,
                                                mask_indices=msk)
        window.account(all_losses, all_acc)
    dispatch_buffer.clear()

    # Non-mesh-divisible tails: the single-device tail program
    # (single-host) or the pod-synchronized pad-and-mask program
    # (multi-host).
    n_tail, n_tail_ex = 0, 0
    if tail_runner is not None:
        state, tail_out = tail_runner.run_train(state, rng)
        n_tail = len(tail_out)
        for n_ex, all_losses, all_acc in tail_out:
            window.n_examples += n_ex
            n_tail_ex += n_ex
            window.account(all_losses, all_acc)

    if ragged or n_tail:
        n_ragged_ex = sum(seq.shape[0] for seq, _, _, _ in ragged)
        print(f"(ran {len(ragged) + n_tail} ragged tail batches "
              f"({n_ragged_ex + n_tail_ex} local examples) through "
              f"their own program)")
    if dropped:
        print(f"(dropped {dropped} ragged batches: hidden-carry mode)")
    logs = window.finish()
    utils.show_logs("Average training loss on epoch", logs)
    return state, logs


def val_epoch(data_loader, state, val_step, mesh, args, rng, frames,
              expected_batch, tail_runner=None, device_corpus=None):
    logs = {}
    it = 0
    ragged = []
    pending = []
    stager = WireStager(mesh)
    _stage_labels = _make_label_stager(mesh, args)
    keep_hidden = getattr(args, '_keep_hidden', False)
    hidden = None
    if keep_hidden:
        from .training import init_hidden
        hidden = init_hidden(None, args, expected_batch)
    for step, full_data in enumerate(data_loader):
        sequence, label, quality, mask = _stack_batch(full_data, frames,
                                                      args, False)
        if sequence.shape[0] != expected_batch:
            if device_corpus is not None:
                # offsets -> host windows for the ragged-tail programs
                sequence = data_loader.dataset.gather_windows(sequence)
            if keep_hidden or sequence.shape[0] == 0:
                pass
            elif getattr(tail_runner, 'wants_all_ragged', False):
                # multi-host: every short batch goes to the pod runner
                # (the mesh-divisible path would desync processes whose
                # batch at the same index is full)
                tail_runner.add((sequence, label, None, mask))
            elif sequence.shape[0] % _mesh_data_extent(mesh) == 0:
                ragged.append((sequence, label, mask))
            elif tail_runner is not None:
                tail_runner.add((sequence, label, None, mask))
            continue
        if device_corpus is not None:
            device_corpus.ensure(data_loader.dataset.data)
            batch = device_corpus.put(sequence)
        else:
            batch = stager.put(sequence)
        label = _stage_labels(label)
        if mask is not None:
            mask = shard_batch(mesh, mask)
        # Per-batch key: the compiled val body folds in state.step, which
        # never advances during validation — without a host-side fold
        # every val batch would draw the SAME negative indices (the
        # reference re-draws per batch from the global torch RNG)
        rng_b = jax.random.fold_in(rng, step)
        if keep_hidden:
            all_losses, all_acc, hidden = val_step(
                state, batch, label, rng_b, mask_indices=mask,
                hidden=hidden)
        else:
            all_losses, all_acc = val_step(state, batch, label, rng_b,
                                           mask_indices=mask)
        # metrics stay on device until the end of the pass: one fetch for
        # the whole val set instead of a device sync per batch (each sync
        # is a full round-trip on remote-dispatch backends)
        it += 1
        pending.append((all_losses, all_acc))

    if pending:
        losses_all = np.asarray(jnp.stack([p[0] for p in pending]))
        accs_all = np.asarray(jnp.stack([p[1] for p in pending]))
        logs.setdefault("locLoss_val", np.zeros(losses_all.shape[-1]))
        logs.setdefault("locAcc_val", np.zeros(losses_all.shape[-1]))
        logs["locLoss_val"] += losses_all.mean(1, dtype=np.float64).sum(0)
        logs["locAcc_val"] += accs_all.mean(1, dtype=np.float64).sum(0)

    # Ragged val tail batches: their own program at their natural size, so
    # the val metrics cover the same examples the reference's do.
    for tail_i, (seq, lab, msk) in enumerate(ragged):
        batch = stager.put(seq)
        lab = shard_batch(mesh, np.asarray(lab).astype(np.int32))
        if msk is not None:
            msk = shard_batch(mesh, msk)
        all_losses, all_acc = val_step(state, batch, lab,
                                       jax.random.fold_in(rng,
                                                          2**16 + tail_i),
                                       mask_indices=msk)
        logs.setdefault("locLoss_val", np.zeros(all_losses.shape[1]))
        logs.setdefault("locAcc_val", np.zeros(all_losses.shape[1]))
        it += 1
        logs["locLoss_val"] += np.asarray(all_losses).mean(0)
        logs["locAcc_val"] += np.asarray(all_acc).mean(0)

    if tail_runner is not None:
        for _n_ex, all_losses, all_acc in tail_runner.run_val(state, rng):
            logs.setdefault("locLoss_val", np.zeros(all_losses.shape[1]))
            logs.setdefault("locAcc_val", np.zeros(all_losses.shape[1]))
            it += 1
            logs["locLoss_val"] += np.asarray(all_losses).mean(0)
            logs["locAcc_val"] += np.asarray(all_acc).mean(0)

    logs = utils.update_logs(logs, max(it, 1))
    logs["iter"] = it
    utils.show_logs("Validation loss:", logs)
    return logs

