"""Example-weighted steps + PodTailRunner: multi-host ragged tails run
via pad-and-mask with count-weighted psum
(`training.build_steps(example_weighted=True)`, `train.PodTailRunner`).

The reference trains every batch (`/root/reference/cpc/train.py:145-187`);
these tests pin that the weighted machinery (a) masks pad rows out of
loss, metrics, and gradients exactly, (b) coincides with the standard
pmean path when every weight is 1, and (c) pads/agrees correctly at the
runner level. The real 2-process run lives in
tests/test_multihost.py::test_two_process_train_cli_ragged_tails.
"""

import numpy as np

import jax
import jax.numpy as jnp

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
from cpc2_tpu.train import PodTailRunner, get_criterion, init_criterion_vars
from cpc2_tpu.training import build_steps, create_train_state, make_optimizer


def _setup(norm_mode='layerNorm'):
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 24
    args.nPredicts, args.negativeSamplingExt = 2, 4
    args.sizeWindow, args.batchSizeGPU = 4160, 1
    args.normMode = norm_mode
    mesh = make_mesh(8)
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(jax.tree.map(jnp.array, bundle.variables),
                               jax.tree.map(jnp.array, criterion_vars), tx)
    return args, mesh, bundle, criterion, tx, state


def _batch(rs, n, w):
    return rs.randn(n, 2, 1, w).astype(np.float32) * 0.1


class TestWeightedStep:

    def test_pad_rows_are_inert(self):
        """With one example per device shard (batchSizeGPU=1), changing a
        zero-weight row's CONTENT must not change the loss, the metrics,
        or the parameter update (layerNorm: no cross-example coupling)."""
        args, mesh, bundle, criterion, tx, state = _setup()
        step, _ = build_steps(bundle.module, criterion, tx, mesh,
                              example_weighted=True)
        rs = np.random.RandomState(0)
        base = _batch(rs, 8, args.sizeWindow)
        valid = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
        variant = base.copy()
        variant[5:] = _batch(np.random.RandomState(99), 3, args.sizeWindow)
        key = jax.random.PRNGKey(0)
        outs = []
        for seq in (base, variant):
            batch, lab, v = shard_batch(mesh, seq, np.zeros((8,), np.int32),
                                        valid)
            st = jax.tree.map(jnp.array, state)
            st, losses, accs = step(st, batch, lab, key, v)
            outs.append((np.asarray(losses), np.asarray(accs),
                         jax.tree.map(np.asarray, st.params)))
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        np.testing.assert_array_equal(outs[0][1], outs[1][1])
        for a, b in zip(jax.tree.leaves(outs[0][2]),
                        jax.tree.leaves(outs[1][2])):
            np.testing.assert_array_equal(a, b)

    def test_all_ones_matches_standard_step(self):
        """weights == 1 everywhere: the count-weighted psum coincides with
        the standard pmean path (same math, different reduction order)."""
        args, mesh, bundle, criterion, tx, state = _setup()
        step_w, val_w = build_steps(bundle.module, criterion, tx, mesh,
                                    example_weighted=True)
        step_s, val_s = build_steps(bundle.module, criterion, tx, mesh)
        rs = np.random.RandomState(1)
        seq = _batch(rs, 8, args.sizeWindow)
        key = jax.random.PRNGKey(3)
        batch, lab, v = shard_batch(mesh, seq, np.zeros((8,), np.int32),
                                    np.ones((8,), np.float32))

        st_w = jax.tree.map(jnp.array, state)
        st_w, losses_w, accs_w = step_w(st_w, batch, lab, key, v)
        st_s = jax.tree.map(jnp.array, state)
        st_s, losses_s, accs_s = step_s(st_s, batch, lab, key)

        np.testing.assert_allclose(np.asarray(losses_w),
                                   np.asarray(losses_s), atol=1e-6)
        np.testing.assert_allclose(np.asarray(accs_w),
                                   np.asarray(accs_s), atol=1e-6)
        for a, b in zip(jax.tree.leaves(st_w.params),
                        jax.tree.leaves(st_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

        vl_w, va_w = val_w(st_w, batch, lab, key, v)
        vl_s, va_s = val_s(st_s, batch, lab, key)
        np.testing.assert_allclose(np.asarray(vl_w), np.asarray(vl_s),
                                   atol=1e-6)

    def test_weighted_loss_value_is_valid_mean(self):
        """The reported loss equals the weighted mean of the criterion's
        per-example losses (checked against a direct criterion call with
        the same weights and negatives... via the all-valid identity and
        the pad-inertness above; here: half weights ~ full weights on a
        duplicated batch)."""
        args, mesh, bundle, criterion, tx, state = _setup()
        _, val_w = build_steps(bundle.module, criterion, tx, mesh,
                               example_weighted=True)
        rs = np.random.RandomState(2)
        half = _batch(rs, 4, args.sizeWindow)
        # batch = [x0..x3, x0..x3]: with batchSizeGPU=1 each example sits
        # alone on its shard, so weighting only the first copy must equal
        # weighting only the second copy
        seq = np.concatenate([half, half])
        key = jax.random.PRNGKey(5)
        st = jax.tree.map(jnp.array, state)
        outs = []
        for valid in (np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32),
                      np.array([0, 0, 0, 0, 1, 1, 1, 1], np.float32)):
            batch, lab, v = shard_batch(mesh, seq,
                                        np.zeros((8,), np.int32), valid)
            losses, accs = val_w(st, batch, lab, key, v)
            outs.append(np.asarray(losses))
        # devices draw different negative keys (fold_in(axis_index)), so
        # allow the negative-sampling wobble, not exact equality
        np.testing.assert_allclose(outs[0], outs[1], rtol=0.2)


class TestPodTailRunnerSingleProcess:
    """Runner mechanics exercised in-process (process_count == 1 skips
    the allgather; the real 2-process path is in test_multihost.py)."""

    def _runner(self):
        args, mesh, bundle, criterion, tx, state = _setup()
        runner = PodTailRunner(bundle.module, criterion, tx, args, mesh,
                               local_batch=8, frames=26)
        return args, mesh, runner, state

    def test_padding_layout(self):
        args, mesh, runner, state = self._runner()
        rs = np.random.RandomState(0)
        seq = _batch(rs, 3, args.sizeWindow)
        lab = np.arange(3, dtype=np.int32)
        seq_p, lab_p, qual_p, msk_p, valid = runner._padded(
            (seq, lab, None, None))
        assert seq_p.shape == (8, 2, 1, args.sizeWindow)
        np.testing.assert_array_equal(valid,
                                      [1, 1, 1, 0, 0, 0, 0, 0])
        np.testing.assert_array_equal(lab_p, [0, 1, 2, 0, 1, 2, 0, 1])
        np.testing.assert_array_equal(seq_p[4], seq[1])

    def test_run_train_trains_every_example(self, capsys):
        args, mesh, runner, state = self._runner()
        rs = np.random.RandomState(1)
        runner.add((_batch(rs, 3, args.sizeWindow),
                    np.zeros(3, np.int32), None, None))
        runner.add((_batch(rs, 5, args.sizeWindow),
                    np.zeros(5, np.int32), None, None))
        step0 = int(state.step)     # the runner's step donates `state`
        state2, out = runner.run_train(state, jax.random.PRNGKey(0))
        assert [n for n, _, _ in out] == [3, 5]
        for _, losses, accs in out:
            assert np.isfinite(losses).all()
        assert int(state2.step) == step0 + 2
        assert runner._items == []

    def test_filler_round_keeps_state_finite(self):
        """A filler round (valid all-zero locally) is what an out-of-tails
        host contributes; single-process its total count clamps to the
        1e-9 floor — the state must stay finite and unchanged-ish (zero
        gradient contribution)."""
        args, mesh, runner, state = self._runner()
        seq_p, lab_p, qual_p, msk_p, valid = runner._filler(
            with_quality=False)
        assert valid.sum() == 0
        runner._build()
        step, _ = runner._steps
        batch, lab, v = shard_batch(mesh, seq_p, lab_p, valid)
        params0 = jax.tree.map(np.asarray, state.params)   # pre-donation
        st, losses, accs = step(jax.tree.map(jnp.array, state), batch,
                                lab, jax.random.PRNGKey(0), v)
        # weighted sums over an all-zero weight vector: exactly zero loss
        np.testing.assert_array_equal(np.asarray(losses), 0.0)
        for a, b in zip(jax.tree.leaves(st.params),
                        jax.tree.leaves(params0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-7)
