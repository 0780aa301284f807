"""Scheduler and CTC-alignment tests, mirroring the reference's
`cpc/utils/unit_tests.py` and `cpc/unit_tests.py:203-276` expectations."""

import numpy as np
import pytest

from cpc2_tpu.losses.seq_alignment import (beam_search, collapse_label_chain,
                                           get_seq_PER)
from cpc2_tpu.utils.misc import (SchedulerCombiner, make_lr_schedule,
                                 ramp_scheduling_function, step_lr,
                                 lambda_lr, update_logs)


class TestSchedulers:

    def test_ramp(self):
        """reference `utils/unit_tests.py:21-33`."""
        lrs = [ramp_scheduling_function(3, e) for e in range(15)]
        assert lrs[0] == pytest.approx(1 / 3)
        assert lrs[1] == pytest.approx(2 / 3)
        assert lrs[2] == 1
        assert all(x == 1 for x in lrs[3:])

    def test_ramp_step_combination(self):
        """reference `utils/unit_tests.py:35-61`: ramp(3) then StepLR(6,0.5):
        lr(e) = 1/3, 2/3, 1, 1, 1, 1, 0.5 ..."""
        lr_fn = make_lr_schedule(1.0, 6, 3)
        expected = [1 / 3, 2 / 3, 1, 1, 1, 1, 0.5]
        for e, want in enumerate(expected):
            assert lr_fn(e) == pytest.approx(want), e

    def test_step_only(self):
        lr_fn = make_lr_schedule(2.0, 4, None)
        assert lr_fn(0) == 2.0
        assert lr_fn(3) == 2.0
        assert lr_fn(4) == 1.0
        assert lr_fn(8) == 0.5

    def test_scheduler_combiner_object(self):
        ramp = lambda_lr(lambda e: ramp_scheduling_function(3, e))
        step = step_lr(6, 0.5)
        comb = SchedulerCombiner([ramp, step], [0, 3])
        scales = []
        for _ in range(7):
            scales.append(comb.scale)
            comb.step()
        # object-based combiner multiplies both (step inactive before e=6)
        assert scales[0] == pytest.approx(1 / 3)
        assert scales[2] == pytest.approx(1.0)
        assert scales[6] == pytest.approx(0.5)


class TestLabelProcess:

    def test_label_collapse(self):
        """reference `unit_tests.py:208-222`."""
        input_chain = np.array([[0, 0, 0, 1, 1, 2, 0, 2, 2],
                                [1, 1, 1, 1, 1, 2, 2, 2, 0]], np.int64)
        out_chain, sizes = collapse_label_chain(input_chain)
        target = np.array([[0, 1, 2, 0, 2], [1, 2, 0, 0, 0]], np.int64)
        assert (out_chain == target).all()
        assert (sizes == np.array([5, 3])).all()

    def test_jit_collapse_matches(self):
        import jax.numpy as jnp
        from cpc2_tpu.losses.criterion import collapse_label_chain_padded
        rng = np.random.RandomState(0)
        labels = rng.randint(0, 3, size=(4, 12))
        ref, ref_sizes = collapse_label_chain(labels)
        got, got_sizes = collapse_label_chain_padded(jnp.asarray(labels))
        got = np.asarray(got)
        assert (np.asarray(got_sizes) == ref_sizes).all()
        for i in range(4):
            assert (got[i, :ref_sizes[i]] == ref[i, :ref_sizes[i]]).all()

    def test_beam_search(self):
        """reference `unit_tests.py:224-245`."""
        blank_label = 2
        n_keep = 10
        data = np.array([[0.1, 0.2, 0.],
                         [0.4, 0.2, 0.6],
                         [0.01, 0.3, 0.]])
        output = beam_search(data, n_keep, blank_label)
        expected = [(0.036, [1, 1]), (0.0004, [0]), (0.012, [1]),
                    (0.024, [1, 0, 1]), (0.0002, [0, 1, 0]),
                    (0.0, [1, 1, 1]), (0.0, [1, 1, 0]), (0.0006, [0, 0]),
                    (0.036, [0, 1]), (0.0024, [1, 0])]
        expected.sort(reverse=True)
        for index, item in enumerate(expected):
            assert item[1] == output[index][1]
            assert abs(item[0] - output[index][0]) < 1e-08

    def test_big_beam_search(self):
        """reference `unit_tests.py:247-259`."""
        blank_label = 11
        data = np.array(
            [[0.1, 0.2, 0., 0., 0., 0., 0., 0.01, 0., 0.1, 0.99, 0.1],
             [0.1, 0.2, 0.6, 0.1, 0.9, 0., 0., 0.01, 0., 0.9, 1., 0.]])
        output = beam_search(data, 10, blank_label)[0]
        assert output[0] == 1.09
        assert output[1] == [10]

    def test_per(self):
        """reference `unit_tests.py:262-276`."""
        ref_seq = [0, 1, 1, 2, 0, 2, 2]
        pred_seq = [1, 1, 2, 2, 0, 0]
        assert get_seq_PER(ref_seq, pred_seq) == 4. / 7.


class TestLogs:

    def test_update_logs(self):
        logs = {"a": np.array([4.0, 8.0])}
        out = update_logs(logs, 2)
        assert (out["a"] == np.array([2.0, 4.0])).all()
        prev = {"a": np.array([2.0, 2.0])}
        out = update_logs(logs, 2, prev)
        assert (out["a"] == np.array([1.0, 3.0])).all()


class TestUpscale2d:

    def test_matches_reference_formulation(self):
        """Nearest-neighbor repeat, same as the reference's view/expand
        trick (`cpc/criterion/custom_layers.py:22-30`)."""
        import torch
        from cpc2_tpu.losses import upscale2d
        x = np.random.RandomState(0).randn(2, 3, 4, 5).astype(np.float32)
        t = torch.from_numpy(x)
        s = t.size()
        ref = (t.view(-1, s[1], s[2], 1, s[3], 1)
                .expand(-1, s[1], s[2], 3, s[3], 3)
                .contiguous().view(-1, s[1], s[2] * 3, s[3] * 3).numpy())
        out = np.asarray(upscale2d(x, factor=3))
        assert out.shape == ref.shape
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_array_equal(np.asarray(upscale2d(x, 1)), x)
