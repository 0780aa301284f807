"""Unit surface for the host dispatch machinery split out of train.py
(`cpc2_tpu/dispatch.py`): window telemetry with deferred emission, and the
prefetch-thread offset-group assembler."""

import argparse

import numpy as np
import pytest
import jax


class TestWindowLogger:

    def _mk(self, logging_step=2):
        from cpc2_tpu.dispatch import WindowLogger
        return WindowLogger(logging_step)

    def test_boundary_defers_until_next_dispatch(self, capsys):
        w = self._mk(2)
        l1 = np.ones((1, 3)); a1 = np.full((1, 3), 0.5)
        assert not w.account(l1, a1)
        assert w.account(l1, a1)           # boundary crossed -> deferred
        assert "Update" not in capsys.readouterr().out
        w.maybe_emit()                     # next dispatch in flight
        out = capsys.readouterr().out
        assert "Update 2" in out and "ms per batch" in out

    def test_multi_step_counts_rows(self):
        w = self._mk(10)
        w.account(np.ones((4, 3)), np.ones((4, 3)))
        assert w.it == 4

    def test_finish_folds_remainder(self):
        w = self._mk(100)
        w.account(np.full((1, 2), 3.0), np.full((1, 2), 0.25))
        w.account(np.full((1, 2), 5.0), np.full((1, 2), 0.75))
        logs = w.finish()
        np.testing.assert_allclose(logs["locLoss_train"], [4.0, 4.0])
        np.testing.assert_allclose(logs["locAcc_train"], [0.5, 0.5])
        assert logs["iter"] == 2

    def test_none_and_empty_ignored(self):
        w = self._mk(2)
        assert not w.account(None, None)
        assert not w.account(np.zeros((0, 3)), np.zeros((0, 3)))
        assert w.it == 0


class TestGroupAssembler:

    def _mk(self, spd):
        from cpc2_tpu.dispatch import GroupAssembler
        from cpc2_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(1)
        return GroupAssembler(mesh, spd, lambda labs, stacked=False: labs)

    def _item(self, pack, offs):
        return (pack, np.asarray(offs, np.int32),
                np.zeros(len(offs), np.int32), None, None)

    def test_buffers_until_full_group(self):
        g = self._mk(3)
        pack = np.zeros(10, np.float32)
        assert g.add(self._item(pack, [0, 1])) is None
        assert g.add(self._item(pack, [2, 3])) is None
        out = g.add(self._item(pack, [4, 5]))
        assert out is not None and out[0] == 'idxgroup'
        assert out[1] is pack
        assert out[6] == 6                 # n_examples across the group

    def test_pack_swap_flushes_partial(self):
        g = self._mk(3)
        pack_a = np.zeros(10, np.float32)
        pack_b = np.ones(10, np.float32)
        assert g.add(self._item(pack_a, [0, 1])) is None
        out = g.add(self._item(pack_b, [2, 3]))
        assert out is not None and out[0] == 'idxpartial'
        assert len(out[1]) == 1 and out[1][0][0] is pack_a
        # the new-pack item stays buffered
        assert g.add(self._item(pack_b, [4, 5])) is None
        full = g.add(self._item(pack_b, [6, 7]))
        assert full is not None and full[0] == 'idxgroup'
        assert full[1] is pack_b

    def test_flush_partial_at_epoch_end(self):
        g = self._mk(4)
        pack = np.zeros(10, np.float32)
        g.add(self._item(pack, [0]))
        g.add(self._item(pack, [1]))
        out = g.flush()
        assert out[0] == 'idxpartial' and len(out[1]) == 2
        assert g.flush() is None           # empty after flush


class TestCompatReexports:

    def test_train_still_exports_the_moved_names(self):
        from cpc2_tpu import train
        from cpc2_tpu import train_tails, dispatch
        assert train.TailRunner is train_tails.TailRunner
        assert train.PodTailRunner is train_tails.PodTailRunner
        assert train._stack_batch is dispatch.stack_batch
        assert train._make_label_stager is dispatch.make_label_stager
