"""Host-side dispatch machinery for the training loop (split out of
`train.py`, round-5 verdict item 6).

Everything here runs on the host around the compiled step programs:

* `stack_batch` — loader output -> jnp-ready arrays (+ BERT/wav2vec mask);
* `make_label_stager` — caches a zeros label upload when the criterion
  ignores labels (the unsupervised path, reference `criterion.py:329`);
* `WindowLogger` — the per-logging-window telemetry with deferred
  boundary emission (the fetch lands while the next dispatch is in
  flight, keeping the device pipeline full);
* `GroupAssembler` — `--corpus_on_device` x `--steps_per_dispatch`:
  assembles (spd, B) offset groups ON the prefetch thread, breaking at
  pack swaps and flushing partials at the epoch end sentinel.

Unit surface: tests/test_dispatch.py, plus the e2e paths in
tests/test_train_e2e.py and tests/test_corpus_on_device.py.
"""

from __future__ import annotations

import functools
import time
from copy import deepcopy

import jax.numpy as jnp
import numpy as np

from .models.cpc import compute_bert_mask, compute_mask_indices
from .parallel.mesh import shard_batch
from .utils import misc as utils

EPOCH_END = object()       # prefetch-transform sentinel: flush buffers


def stack_batch(full_data, frames, args, train):
    """Host-side batch assembly: numpy -> jnp-ready arrays + optional mask."""
    sequence, label, *signal_quality = full_data
    quality = signal_quality[0] if len(signal_quality) else None
    mask = None
    if args.cpc_mode == 'bert':
        mask = compute_bert_mask((2 * sequence.shape[0], frames),
                                 2, args.nPredicts)
    elif args.mask_prob > 0:
        mask = compute_mask_indices((2 * sequence.shape[0], frames),
                                    args.mask_prob, args.mask_length,
                                    min_masks=2)
    return sequence, label, quality, mask


def make_label_stager(mesh, args):
    """The unsupervised CPC criterion never reads the per-window speaker
    label (its `label` arg is ignored, reference `criterion.py:329`
    likewise) — uploading the (B,) int32 vector per dispatch buys
    nothing but a tunnel RPC. Stage one cached zeros array per shape
    instead; supervised/BERT paths keep the real labels. Shared by the
    train and val epoch loops."""
    labels_unused = (not getattr(args, 'supervised', False)
                     and args.cpc_mode != 'bert')
    cache = {}

    def stage(labs, stacked=False):
        labs = np.asarray(labs).astype(np.int32)
        if stacked:
            from .training import shard_stacked_batch
            put = functools.partial(shard_stacked_batch, mesh)
        else:
            put = functools.partial(shard_batch, mesh)
        if not labels_unused:
            return put(labs)
        key = (labs.shape, stacked)
        if key not in cache:
            cache[key] = put(np.zeros_like(labs))
        return cache[key]
    return stage


class WindowLogger:
    """Per-logging-window training telemetry (the reference's
    per-loggingStep prints, `cpc/train.py:124-134`), with the metric
    fetch DEFERRED one dispatch past the boundary: a freshly queued
    group keeps the device busy while the host syncs and prints
    (measured ~0.4 ms/batch of device idle per 50-step window on the
    tunnel backend when the boundary was processed inline).

    `account(losses, accs)` after each accounted dispatch;
    `maybe_emit()` right after the NEXT dispatch is in flight;
    `finish()` at epoch end (emits a pending boundary, folds the
    remainder, prints the epoch summary, returns the epoch logs)."""

    def __init__(self, logging_step):
        self._logging_step = logging_step
        self.logs = {}
        self._last_logs = None
        self.it = 0
        self._last_it = 0
        self.n_examples = 0
        self._pending_losses = []
        self._pending_accs = []
        self._deferred = None
        self._start = time.perf_counter()

    def account(self, all_losses, all_acc, n_examples=0):
        """Queue one dispatch's device metrics ((n, cols) after reshape);
        returns True if a window boundary was crossed."""
        self.n_examples += n_examples
        if all_losses is None or all_losses.size == 0:
            return False
        if "locLoss_train" not in self.logs:
            self.logs["locLoss_train"] = np.zeros(all_losses.shape[-1])
            self.logs["locAcc_train"] = np.zeros(all_losses.shape[-1])
        self.it += all_losses.shape[0] if all_losses.ndim > 1 else 1
        # keep metrics on device between logging points: materializing
        # them every step would force a device sync per step and stall
        # the dispatch pipeline
        self._pending_losses.append(
            all_losses.reshape(-1, all_losses.shape[-1]))
        self._pending_accs.append(all_acc.reshape(-1, all_acc.shape[-1]))
        # `it` counts optimizer steps actually accounted (a multi-step
        # dispatch lands spd at once), so the trigger and the ms/batch
        # divisor use the REAL step count.
        if self.it - self._last_it >= self._logging_step:
            self._deferred = (self._pending_losses, self._pending_accs,
                              self.it - self._last_it, self.it,
                              self.n_examples)
            self._pending_losses, self._pending_accs = [], []
            self._last_it = self.it
            self.n_examples = 0
            return True
        return False

    def maybe_emit(self):
        """Emit a deferred window boundary now that the next dispatch is
        queued on the device."""
        if self._deferred is not None:
            self._emit(*self._deferred)
            self._deferred = None

    def _emit(self, w_losses, w_accs, window_steps, it_at, w_examples):
        logs = self.logs
        logs["locLoss_train"] += np.asarray(
            jnp.concatenate(w_losses)).sum(0)
        logs["locAcc_train"] += np.asarray(
            jnp.concatenate(w_accs)).sum(0)
        new_time = time.perf_counter()
        elapsed = new_time - self._start
        print(f"Update {it_at}")
        print(f"elapsed: {elapsed:.1f} s")
        print(f"{1000.0 * elapsed / window_steps:.1f} ms per batch, "
              f"{1000.0 * elapsed / max(w_examples, 1):.1f} ms / "
              f"example")
        # window mean: divide the window's sum by the number of optimizer
        # steps accumulated IN the window (the reference divides by
        # loggingStep, `cpc/train.py:160-164`)
        loc_logs = utils.update_logs(logs, max(window_steps, 1),
                                     self._last_logs)
        self._last_logs = deepcopy(logs)
        utils.show_logs("Training loss", loc_logs)
        self._start = new_time

    def finish(self):
        """Epoch end: flush the deferred boundary and any un-windowed
        remainder into the epoch totals; returns the epoch logs dict
        (update_logs-normalized by the true step count)."""
        self.maybe_emit()
        if self._pending_losses:
            n_cols = self._pending_losses[0].shape[-1]
            self.logs.setdefault("locLoss_train", np.zeros(n_cols))
            self.logs.setdefault("locAcc_train", np.zeros(n_cols))
            self.logs["locLoss_train"] += np.asarray(
                jnp.concatenate(self._pending_losses)).sum(0)
            self.logs["locAcc_train"] += np.asarray(
                jnp.concatenate(self._pending_accs)).sum(0)
            self._pending_losses, self._pending_accs = [], []
        logs = utils.update_logs(self.logs, max(self.it, 1))
        logs["iter"] = self.it
        return logs


class GroupAssembler:
    """Assembles `--steps_per_dispatch` offset groups for the
    device-resident corpus ON the prefetch thread.

    Items are (pack_ref, offsets, labels, quality, mask); `add` returns a
    flushed group ('idxgroup', ...) when one completes, a partial
    ('idxpartial', items) when the pack swaps mid-group (offsets must
    index the pack they were drawn from), or None while buffering.
    np.stack + the (spd, B) offset device_put both overlap the previous
    group's device compute — the dispatch thread's per-group work is ONE
    multi_step call. (Measured: group assembly on the dispatch thread
    cost ~0.5 ms/batch of device idle on the tunnel backend.)"""

    def __init__(self, mesh, spd, stage_labels):
        self._mesh = mesh
        self._spd = spd
        self._stage_labels = stage_labels
        self._buf = []

    def add(self, item):
        flushed = None
        if self._buf and self._buf[0][0] is not item[0]:
            flushed = self.flush()        # pack swapped mid-group
        self._buf.append(item)
        if flushed is not None:
            return flushed
        if len(self._buf) == self._spd:
            return self.flush()
        return None

    def flush(self):
        if not self._buf:
            return None
        items = list(self._buf)
        self._buf.clear()
        if len(items) < self._spd:
            return ('idxpartial', items)
        from .training import shard_stacked_batch
        offs_d = shard_stacked_batch(
            self._mesh, np.stack([b[1] for b in items]))
        labs_d = self._stage_labels(np.stack([b[2] for b in items]),
                                    stacked=True)
        quals_d = (shard_stacked_batch(
            self._mesh, np.stack([b[3] for b in items]))
            if items[0][3] is not None else None)
        masks_d = (shard_stacked_batch(
            self._mesh, np.stack([b[4] for b in items]))
            if items[0][4] is not None else None)
        n_ex = sum(b[1].shape[0] for b in items)
        return ('idxgroup', items[0][0], offs_d, labs_d, quals_d,
                masks_d, n_ex)
