"""Flag-wiring coverage (round-3 verdict item 9): the orbax hole was
found by grepping tests for a config flag, so every flag in
`config.py`/`train.py:parse_args` was swept for zero test references.
Flags whose MACHINERY is already pinned through function-level tests are
justified line-by-line in INVENTORY.md ("Flag-coverage audit"); the ones
with genuinely untested dispatch get their wiring pinned here — from the
args namespace to the object the value must land in.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc2_tpu.config import get_default_cpc_config


def _args(**kw):
    args = get_default_cpc_config()
    for k, v in kw.items():
        setattr(args, k, v)
    return args


class TestOptimizerFlags:
    """--beta1/--beta2/--epsilon/--adam_mu_dtype ->
    training.make_optimizer (reference `train.py:475-484`)."""

    def test_adam_hyperparams_from_flags(self):
        from cpc2_tpu.training import make_optimizer
        args = _args(beta1=0.7, beta2=0.88, epsilon=1e-4,
                     learningRate=3e-3)
        tx = make_optimizer(args)
        state = tx.init({'w': jnp.zeros((3,))})
        hp = state.hyperparams
        assert float(hp['learning_rate']) == pytest.approx(3e-3)
        assert float(hp['b1']) == pytest.approx(0.7)
        assert float(hp['b2']) == pytest.approx(0.88)
        assert float(hp['eps']) == pytest.approx(1e-4)

    def test_adam_mu_dtype(self):
        from cpc2_tpu.training import make_optimizer
        tx = make_optimizer(_args(adam_mu_dtype='bf16'))
        state = tx.init({'w': jnp.zeros((3,), jnp.float32)})
        mu = jax.tree.leaves(state.inner_state[0].mu)[0]
        assert mu.dtype == jnp.bfloat16
        tx32 = make_optimizer(_args())
        st32 = tx32.init({'w': jnp.zeros((3,), jnp.float32)})
        assert jax.tree.leaves(st32.inner_state[0].mu)[0].dtype \
            == jnp.float32

    def test_sgd_dispatch(self):
        from cpc2_tpu.training import make_optimizer
        tx = make_optimizer(_args(optimizer='sgd', learningRate=0.1))
        state = tx.init({'w': jnp.zeros((3,))})
        assert float(state.hyperparams['learning_rate']) \
            == pytest.approx(0.1)


class TestSchedulerFlags:
    """--schedulerStep/--schedulerRamp -> utils.make_lr_schedule, the
    lr_fn `train.run` applies per epoch (reference StepLR halving +
    ramp warm-up, `train.py:502-520`, `utils/misc.py:77-122`)."""

    def test_step_halving(self):
        from cpc2_tpu.utils.misc import make_lr_schedule
        args = _args(learningRate=2e-4, schedulerStep=10, schedulerRamp=None)
        lr = make_lr_schedule(args.learningRate, args.schedulerStep,
                              args.schedulerRamp)
        assert lr(0) == pytest.approx(2e-4)
        assert lr(9) == pytest.approx(2e-4)
        assert lr(10) == pytest.approx(1e-4)
        assert lr(20) == pytest.approx(5e-5)

    def test_ramp(self):
        from cpc2_tpu.utils.misc import make_lr_schedule
        lr = make_lr_schedule(1e-3, -1, 10)
        assert lr(0) == pytest.approx(1e-3 / 10)
        assert lr(4) == pytest.approx(1e-3 * 5 / 10)
        assert lr(10) == pytest.approx(1e-3)
        assert lr(50) == pytest.approx(1e-3)


class TestCriterionDispatch:
    """--supervised/--pathPhone/--CTC/--nLevelsPhone ->
    train.get_criterion (reference `train.py:27-59`)."""

    def test_phone_layers_from_nLevelsPhone(self):
        from cpc2_tpu.losses import PhoneCriterion
        from cpc2_tpu.train import get_criterion
        args = _args(supervised=True, pathPhone='/tmp/x', nLevelsPhone=3)
        crit = get_criterion(args, 160, n_speakers=4, n_phones=7)
        assert isinstance(crit, PhoneCriterion)
        assert crit.n_layers == 3 and crit.n_phones == 7

    def test_ctc_flag_selects_ctc_criterion(self):
        from cpc2_tpu.losses import CTCPhoneCriterion
        from cpc2_tpu.train import get_criterion
        args = _args(supervised=True, pathPhone='/tmp/x', CTC=True)
        crit = get_criterion(args, 160, n_speakers=4, n_phones=7)
        assert isinstance(crit, CTCPhoneCriterion)

    def test_speaker_fallback(self):
        from cpc2_tpu.losses import SpeakerCriterion
        from cpc2_tpu.train import get_criterion
        args = _args(supervised=True, pathPhone=None)
        crit = get_criterion(args, 160, n_speakers=9, n_phones=None)
        assert isinstance(crit, SpeakerCriterion)
        assert crit.n_speakers == 9


class TestEncoderTypeDispatch:
    """--encoder_type -> feature_loader.init_model / the encoder factory
    (reference `feature_loader.py:202-212`)."""

    @pytest.mark.parametrize('enc,cls', [('cpc', 'CPCEncoder'),
                                         ('mfcc', 'MFCCEncoder'),
                                         ('lfb', 'LFBEncoder')])
    def test_encoder_classes(self, enc, cls):
        from cpc2_tpu import feature_loader as fl
        args = _args(encoder_type=enc, hiddenEncoder=16, hiddenGar=16,
                     sizeWindow=4160, nPredicts=2)
        bundle = fl.init_model(args, seed=0)
        assert type(bundle.module.gEncoder).__name__ == cls
        c, e, _, _ = bundle.apply(
            jnp.zeros((1, args.sizeWindow), jnp.float32))
        assert np.isfinite(np.asarray(c)).all()


class TestAugmentationFlagThreading:
    """CLI flags -> augmentation_factory object fields: the factory is
    the only consumer of --bandreject_scaler/--t_ms/--shift_max/
    --min_snr_in_db/--max_snr_in_db/--impulse_response_prob/
    --ir_sample_rate/--ir_batch_wise (reference
    `data_augmentation.py:347-443`)."""

    def _aug_args(self, types, **kw):
        args = get_default_cpc_config()
        args.augment_type = types
        args.augment_past = True
        args.nGPU, args.batchSizeGPU = 1, 2
        for k, v in kw.items():
            setattr(args, k, v)
        return args

    def test_single_type_fields(self):
        from cpc2_tpu.data import augmentation as ha
        aug = ha.augmentation_factory(
            self._aug_args(['bandreject'], bandreject_scaler=2.5))
        assert isinstance(aug, ha.BandrejectAugment)
        assert aug.scaler == 2.5

        aug = ha.augmentation_factory(
            self._aug_args(['pitch'], shift_max=123))
        assert aug.shift_max == 123

        aug = ha.augmentation_factory(
            self._aug_args(['time_dropout'], t_ms=77))
        assert aug.t_max == int(77 / 1000.0 * 16000)

        aug = ha.augmentation_factory(
            self._aug_args(['pitch_dropout'], t_ms=55, shift_max=44))
        assert aug.dropout.t_max == int(55 / 1000.0 * 16000)
        assert aug.pitch.shift_max == 44

    def test_combined_chain_threads_every_flag(self):
        from cpc2_tpu.data import augmentation as ha
        args = self._aug_args(['bandreject', 'time_dropout'],
                              bandreject_scaler=1.5, t_ms=33)
        aug = ha.augmentation_factory(args)
        assert isinstance(aug, ha.CombinedTransforms)
        kinds = {type(t).__name__: t for t in aug.transfors_cfgs}
        assert kinds['BandrejectAugment'].scaler == 1.5
        assert kinds['TimeDropoutAugment'].t_max == int(33 / 1000.0 * 16000)

    def test_augment_future_only_enables_factory(self):
        from cpc2_tpu.data import augmentation as ha
        args = self._aug_args(['time_dropout'])
        args.augment_past, args.augment_future = False, True
        assert ha.augmentation_factory(args) is not None
        args.augment_future = False
        assert ha.augmentation_factory(args) is None


class TestCorpusFlagThreading:
    """--no_speaker/--naming_convention/--path_cache/--ignore_cache reach
    data.corpus.find_all_seqs through main's call (train.py:1118-1122);
    the semantics themselves are pinned in tests/test_data.py and
    tests/test_cache.py — here the argparse surface stays loyal."""

    def test_parse_defaults(self):
        from cpc2_tpu import train
        args = train.parse_args(['--pathDB', '/tmp/x'])
        assert args.no_speaker is False
        assert args.naming_convention is None
        assert args.path_cache is None
        assert args.ignore_cache is False
        assert args.n_process_loader == 8
        assert args.noise_extension == '.wav'
        assert args.master_port == -1 and args.local_rank == -1

    def test_naming_convention_validated(self):
        from cpc2_tpu import train
        with pytest.raises(SystemExit):
            train.parse_args(['--pathDB', '/tmp/x',
                              '--naming_convention', 'bogus'])
