"""Ragged-tail runners for the training driver.

The reference trains on every batch regardless of size
(`cpc/train.py:145-187`); shard_map programs need mesh-divisible batches,
so the remainders route here (split out of `train.py`, round-5 verdict
item 6):

* `TailRunner` — single-host: a lazily-built program on a 1-device mesh
  at the tail's natural size.
* `PodTailRunner` — multi-host: pad-and-mask example-weighted steps on
  the MAIN mesh with pod-agreed round counts, so per-host tails of
  differing sizes train without desyncing the replicated state.

Unit surface: tests/test_pod_tail.py, tests/test_train_e2e.py (tail
routing), tests/test_multihost.py (2-process CLI tails).
"""

from __future__ import annotations

import jax
import numpy as np

from .parallel.mesh import make_mesh, shard_batch


class TailRunner:
    """Runs ragged batches whose size is NOT divisible by the main mesh.

    The reference trains on every batch regardless of size
    (`cpc/train.py:145-187`); shard_map needs the batch divisible by the
    data axis, so the remainder runs through a lazily-built program on a
    single-device mesh at its natural size — the same semantics as the
    reference's DataParallel placing a short tail on fewer GPUs (per-shard
    negative pools always cover whatever sits on the device). The train
    state round-trips main-mesh -> device0 -> main-mesh once per epoch
    tail. Disabled under multi-host (per-host tails can differ, and a
    process-0-only update would desync the replicated state) and under the
    hidden-carry mode (the carry's batch axis is fixed)."""

    def __init__(self, model_module, criterion, tx, args, main_mesh,
                 restore_fn, device_augment=None):
        self._modules = (model_module, criterion, tx)
        self._args = args
        self._main_mesh = main_mesh
        self._restore_fn = restore_fn
        self._device_augment = device_augment
        self._steps = None
        self._mesh1 = None
        self._items = []

    def add(self, item):
        self._items.append(item)

    def _build(self):
        if self._steps is not None:
            return
        from .training import build_steps
        model_module, criterion, tx = self._modules
        args = self._args
        # A 1-device pool IS the whole tail batch, so global-negatives
        # semantics coincide with local sampling there.
        if getattr(criterion, 'global_negatives', False):
            criterion = criterion.clone(global_negatives=False,
                                        pool_axis_size=1)
        self._mesh1 = make_mesh(1)
        self._steps = build_steps(
            model_module, criterion, tx, self._mesh1,
            has_quality=args.signal_quality_path is not None,
            uses_mask=args.cpc_mode == 'bert' or args.mask_prob > 0,
            keep_hidden=False, remat=getattr(args, 'remat', False),
            device_augment=self._device_augment)

    def _stage(self, seq, lab, qual, msk):
        batch = shard_batch(self._mesh1, seq.astype(np.float32))
        lab = shard_batch(self._mesh1, np.asarray(lab).astype(np.int32))
        if qual is not None:
            qual = shard_batch(self._mesh1, qual.astype(np.float32))
        if msk is not None:
            msk = shard_batch(self._mesh1, msk)
        return batch, lab, qual, msk

    def run_train(self, state, rng):
        """Returns (state, [(n_examples, losses, accs), ...])."""
        if not self._items:
            return state, []
        self._build()
        from jax.sharding import NamedSharding, PartitionSpec
        state = jax.device_put(
            state, NamedSharding(self._mesh1, PartitionSpec()))
        train_step, _ = self._steps
        out = []
        for seq, lab, qual, msk in self._items:
            batch, lab, qual, msk = self._stage(seq, lab, qual, msk)
            state, losses, accs = train_step(state, batch, lab, rng,
                                             quality=qual, mask_indices=msk)
            # numpy: metric tensors from the 1-device mesh can't
            # concatenate with the main mesh's pending device metrics
            out.append((seq.shape[0], np.asarray(losses), np.asarray(accs)))
        self._items = []
        return self._restore_fn(state), out

    def run_val(self, state, rng):
        if not self._items:
            return []
        self._build()
        from jax.sharding import NamedSharding, PartitionSpec
        state = jax.device_put(
            state, NamedSharding(self._mesh1, PartitionSpec()))
        _, val_step = self._steps
        out = []
        for item_i, (seq, lab, qual, msk) in enumerate(self._items):
            batch, lab, qual, msk = self._stage(seq, lab, qual, msk)
            # per-batch key: the val body's fold_in(rng, state.step) is
            # constant during validation
            losses, accs = val_step(state, batch, lab,
                                    jax.random.fold_in(rng,
                                                       2**17 + item_i),
                                    mask_indices=msk)
            out.append((seq.shape[0], np.asarray(losses), np.asarray(accs)))
        self._items = []
        return out


class PodTailRunner:
    """Multi-host ragged tails: pad-and-mask on the MAIN mesh.

    Round-3 verdict item 5: the reference trains every batch
    (`cpc/train.py:145-187`), but under multi-host SPMD a per-host tail
    of differing size used to be dropped (a one-host update would desync
    the replicated state). Instead, every host buffers its short batches
    during the lock-step main loop; at epoch end the pod agrees on the
    maximum buffered count (one tiny `process_allgather`), and runs that
    many example-weighted steps (`training.build_steps(
    example_weighted=True)`): each host pads its i-th tail to the full
    per-host batch shape by cyclically repeating its own rows (so
    batch-norm stats see real audio) with a 0/1 validity vector; hosts
    out of tails submit an all-masked filler. Loss, metrics, and
    gradients normalize by the global psum of valid counts, so the
    update is the EXACT mean over real examples and every process
    executes the same program — no drop, no desync from tail-SIZE
    differences. (Per-host batch COUNTS must still match — the
    lock-step invariant the reference's DDP imposes too; `run` checks
    loader lengths up front and docs/parallelism.md states the full
    sharding contract.)

    Duck-types TailRunner (`add` / `run_train` / `run_val`);
    `wants_all_ragged` routes every non-full batch here (the
    mesh-divisible `ragged` fast path would desync processes whose
    batch at the same index is full)."""

    wants_all_ragged = True

    def __init__(self, model_module, criterion, tx, args, mesh,
                 local_batch, frames, device_augment=None):
        self._modules = (model_module, criterion, tx)
        self._args = args
        self._mesh = mesh
        self._local_batch = int(local_batch)
        self._frames = frames
        self._device_augment = device_augment
        self._steps = None
        self._items = []

    def add(self, item):
        self._items.append(item)

    def _build(self):
        if self._steps is not None:
            return
        from .training import build_steps
        model_module, criterion, tx = self._modules
        args = self._args
        self._steps = build_steps(
            model_module, criterion, tx, self._mesh,
            has_quality=args.signal_quality_path is not None,
            uses_mask=args.cpc_mode == 'bert' or args.mask_prob > 0,
            keep_hidden=False, remat=getattr(args, 'remat', False),
            device_augment=self._device_augment, example_weighted=True)

    def _padded(self, item):
        """Pad one host-local (t, 2, 1, W) item to the full local batch
        by cyclic row repetition; valid marks the real rows."""
        seq, lab, qual, msk = item
        t, b = seq.shape[0], self._local_batch
        idx = np.arange(b) % t
        valid = (np.arange(b) < t).astype(np.float32)
        seq_p = np.asarray(seq, np.float32)[idx]
        lab_p = np.asarray(lab)[idx].astype(np.int32)
        qual_p = None if qual is None else np.asarray(
            qual, np.float32)[idx]
        msk_p = None
        if msk is not None:
            # (2t, F) mask rows: [0,t) past view, [t,2t) future view
            msk_p = np.concatenate([msk[:t][idx], msk[t:][idx]])
        return seq_p, lab_p, qual_p, msk_p, valid

    def _filler(self, with_quality):
        """All-masked stand-in for hosts that ran out of tails: repeat
        the last buffered item if any (real audio for the BN stats),
        zeros otherwise; weight 0 either way. `with_quality` must mirror
        what tail-HOLDING hosts stage this phase (train items carry the
        quality array when --signal_quality_path is set; val items carry
        None) — processes in one collective round must trace the same
        program signature."""
        if self._items:
            seq_p, lab_p, qual_p, msk_p, _ = self._padded(self._items[-1])
        else:
            args, b = self._args, self._local_batch
            seq_p = np.zeros((b, 2, 1, args.sizeWindow), np.float32)
            lab_p = np.zeros((b,), np.int32)
            qual_p = msk_p = None
            if with_quality:
                qual_p = np.zeros((b, self._frames), np.float32)
            if args.cpc_mode == 'bert' or args.mask_prob > 0:
                msk_p = np.zeros((2 * b, self._frames), bool)
        if not with_quality:
            qual_p = None
        return seq_p, lab_p, qual_p, msk_p, np.zeros(
            (self._local_batch,), np.float32)

    def _agreed_rounds(self):
        """Pod-wide max of buffered tail counts (every process calls this
        at the same point — the end of the lock-step epoch loop)."""
        if jax.process_count() == 1:
            return len(self._items)
        from jax.experimental import multihost_utils
        counts = multihost_utils.process_allgather(
            np.int32(len(self._items)))
        return int(np.max(counts))

    def _stage(self, seq, lab, qual, msk, valid):
        batch = shard_batch(self._mesh, seq)
        lab = shard_batch(self._mesh, lab)
        valid = shard_batch(self._mesh, valid)
        qual = None if qual is None else shard_batch(self._mesh, qual)
        msk = None if msk is None else shard_batch(self._mesh, msk)
        return batch, lab, qual, msk, valid

    def _rounds(self, with_quality):
        # agree BEFORE the early-out: the allgather is a collective every
        # process must reach even with an empty local buffer
        n = self._agreed_rounds()
        if n:
            self._build()
        for i in range(n):
            if i < len(self._items):
                yield self._padded(self._items[i])
            else:
                yield self._filler(with_quality)

    def run_train(self, state, rng):
        """Returns (state, [(n_local_examples, losses, accs), ...])."""
        out = []
        with_quality = self._args.signal_quality_path is not None
        for seq, lab, qual, msk, valid in self._rounds(with_quality):
            train_step, _ = self._steps
            n_local = int(valid.sum())
            batch, lab, qual, msk, valid = self._stage(seq, lab, qual,
                                                       msk, valid)
            state, losses, accs = train_step(state, batch, lab, rng, valid,
                                             quality=qual,
                                             mask_indices=msk)
            out.append((n_local, np.asarray(losses), np.asarray(accs)))
        self._items = []
        return state, out

    def run_val(self, state, rng):
        # val items never carry quality (val_epoch stages None), so the
        # filler must not either
        out = []
        for item_i, (seq, lab, qual, msk, valid) in enumerate(
                self._rounds(False)):
            _, val_step = self._steps
            n_local = int(valid.sum())
            batch, lab, qual, msk, valid = self._stage(seq, lab, qual,
                                                       msk, valid)
            losses, accs = val_step(
                state, batch, lab,
                jax.random.fold_in(rng, 2 ** 17 + item_i), valid,
                mask_indices=msk)
            out.append((n_local, np.asarray(losses), np.asarray(accs)))
        self._items = []
        return out

