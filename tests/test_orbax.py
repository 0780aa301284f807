"""`--ckpt_format orbax` end-to-end: the native full-TrainState checkpoint
(`train.py:_save_training_checkpoint`, preferential resume at the
`.orbax` branch of `main`) must survive a save -> kill -> relaunch cycle
with a trajectory bit-identical to an uninterrupted run.

Bit-identity needs more than the orbax round-trip: host-side draws
(sampler shuffles, augmentation) must be replayable per epoch, which the
per-epoch `set_seed((random_seed + 7919*(epoch+1)) % 2**31)` re-key in
`train.run` provides. The reference cannot do this — its global RNG
stream advances monotonically (`/root/reference/cpc/train.py:296`), so a
preempted reference job resumes onto different batches.
"""

import os

import numpy as np
import pytest

from cpc2_tpu import train
from cpc2_tpu.io.torch_ckpt import load_torch_checkpoint


def _base_args(db, ckpt, fmt='orbax'):
    return ['--pathDB', str(db), '--file_extension', '.wav',
            '--pathCheckpoint', str(ckpt),
            '--hiddenEncoder', '32', '--hiddenGar', '32',
            '--nPredicts', '4', '--negativeSamplingExt', '8',
            '--sizeWindow', '4160', '--nGPU', '2', '--batchSizeGPU', '2',
            '--rnnMode', 'linear', '--arMode', 'GRU',
            '--samplingType', 'uniform', '--random_seed', '1234',
            '--logging_step', '50', '--save_step', '1',
            '--ckpt_format', fmt]


def _final_state(ckpt_dir, epoch):
    return load_torch_checkpoint(str(ckpt_dir / f'checkpoint_{epoch}.pt'))


def _assert_state_dicts_equal(a, b):
    assert set(a.keys()) == set(b.keys())
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


class TestOrbaxResume:

    @pytest.fixture(scope='class')
    def runs(self, mini_corpus, tmp_path_factory):
        """Leg A: 1 epoch, then relaunch (auto-resume) to 2 epochs.
        Leg B: 2 uninterrupted epochs. Same seed, same corpus."""
        interrupted = tmp_path_factory.mktemp('orbax_interrupted')
        straight = tmp_path_factory.mktemp('orbax_straight')
        train.main(_base_args(mini_corpus, interrupted) + ['--nEpoch', '1'])
        train.main(_base_args(mini_corpus, interrupted) + ['--nEpoch', '2'])
        train.main(_base_args(mini_corpus, straight) + ['--nEpoch', '2'])
        return interrupted, straight

    def test_orbax_dirs_written(self, runs):
        interrupted, straight = runs
        for d in runs:
            assert os.path.isdir(d / 'checkpoint_1.pt.orbax'), \
                sorted(os.listdir(d))

    def test_orbax_payload_holds_full_train_state(self, runs):
        import orbax.checkpoint as ocp
        _, straight = runs
        restored = ocp.PyTreeCheckpointer().restore(
            str(straight / 'checkpoint_1.pt.orbax'))
        assert set(restored.keys()) == {'params', 'opt_state', 'step'}
        assert {'model', 'criterion'} <= set(restored['params'].keys())
        # Adam moments present => resume restores the exact optimizer
        leaves = [np.asarray(x) for x in
                  __import__('jax').tree_util.tree_leaves(
                      restored['opt_state'])]
        assert any(leaf.ndim > 0 for leaf in leaves)
        assert int(np.asarray(restored['step'])) > 0

    def test_resume_restores_from_orbax(self, mini_corpus, runs,
                                        tmp_path_factory, capsys):
        """The relaunch leg must take the orbax branch, not the torch
        pickle (whose optimizer slot is empty under orbax format)."""
        ckpt = tmp_path_factory.mktemp('orbax_probe')
        train.main(_base_args(mini_corpus, ckpt) + ['--nEpoch', '1'])
        capsys.readouterr()
        train.main(_base_args(mini_corpus, ckpt) + ['--nEpoch', '2'])
        out = capsys.readouterr().out
        assert 'Checkpoint detected' in out
        assert 'Restored full train state from orbax' in out

    def test_resume_bit_identical(self, runs):
        """Kill-and-relaunch == uninterrupted, bit for bit: params,
        criterion, and best-model tracking all land on the same values."""
        interrupted, straight = runs
        a = _final_state(interrupted, 1)
        b = _final_state(straight, 1)
        _assert_state_dicts_equal(a['gEncoder'], b['gEncoder'])
        _assert_state_dicts_equal(a['cpcCriterion'], b['cpcCriterion'])
        if a['best'] is not None or b['best'] is not None:
            _assert_state_dicts_equal(a['best'], b['best'])

    def test_resume_logs_continue(self, runs):
        import json
        interrupted, straight = runs
        with open(interrupted / 'checkpoint_logs.json') as f:
            li = json.load(f)
        with open(straight / 'checkpoint_logs.json') as f:
            ls = json.load(f)
        assert li['epoch'] == ls['epoch'] == [0, 1]
        np.testing.assert_allclose(li['locLoss_train'], ls['locLoss_train'],
                                   rtol=0, atol=0)


class TestTorchFormatResumeAlsoReplays:
    """The per-epoch host-RNG re-key makes resume bit-identical in the
    DEFAULT torch-pickle format too (optimizer restored from the
    'optax_leaves' payload)."""

    def test_resume_bit_identical(self, mini_corpus, tmp_path_factory):
        interrupted = tmp_path_factory.mktemp('torch_interrupted')
        straight = tmp_path_factory.mktemp('torch_straight')
        train.main(_base_args(mini_corpus, interrupted, fmt='torch')
                   + ['--nEpoch', '1'])
        train.main(_base_args(mini_corpus, interrupted, fmt='torch')
                   + ['--nEpoch', '2'])
        train.main(_base_args(mini_corpus, straight, fmt='torch')
                   + ['--nEpoch', '2'])
        a = _final_state(interrupted, 1)
        b = _final_state(straight, 1)
        _assert_state_dicts_equal(a['gEncoder'], b['gEncoder'])
        _assert_state_dicts_equal(a['cpcCriterion'], b['cpcCriterion'])
