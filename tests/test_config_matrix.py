"""Compile-check the full model/criterion configuration matrix: every
arMode x rnnMode x cpc_mode combination must build, train one step, and
produce finite losses on a simulated 2-device mesh."""

import numpy as np
import pytest

import jax

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.models.cpc import compute_bert_mask, compute_mask_indices
from cpc2_tpu.models.encoder import encoded_seq_len
from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
from cpc2_tpu.train import get_criterion, init_criterion_vars
from cpc2_tpu.training import build_steps, create_train_state, make_optimizer


def run_one_step(**overrides):
    args = get_default_cpc_config()
    args.hiddenEncoder = 16
    args.hiddenGar = 16
    args.nPredicts = 2
    args.negativeSamplingExt = 4
    args.sizeWindow = 3200
    for k, v in overrides.items():
        setattr(args, k, v)

    mesh = make_mesh(2)
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    crit_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, crit_vars, tx)
    uses_mask = args.cpc_mode == 'bert' or args.mask_prob > 0
    train_step, val_step = build_steps(bundle.module, criterion, tx, mesh,
                                       uses_mask=uses_mask)

    b = 4
    rng = np.random.RandomState(0)
    batch = rng.randn(b, 2, 1, args.sizeWindow).astype(np.float32)
    labels = np.zeros((b,), np.int32)
    batch, labels = shard_batch(mesh, batch, labels)
    mask = None
    if uses_mask:
        frames = encoded_seq_len(args.sizeWindow)
        if args.cpc_mode == 'bert':
            m = compute_bert_mask((2 * b, frames), 2, args.nPredicts)
        else:
            m = compute_mask_indices((2 * b, frames), args.mask_prob,
                                     args.mask_length, min_masks=2)
        mask = shard_batch(mesh, m)
    state, losses, accs = train_step(state, batch, labels,
                                     jax.random.PRNGKey(0),
                                     mask_indices=mask)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all(), losses
    return losses


class TestConfigMatrix:

    @pytest.mark.parametrize("ar_mode", ["GRU", "LSTM", "RNN", "no_ar",
                                         "transformer"])
    def test_ar_modes(self, ar_mode):
        run_one_step(arMode=ar_mode, rnnMode='linear')

    @pytest.mark.parametrize("rnn_mode", ["transformer", "RNN", "LSTM",
                                          "linear", "ffd", "conv4", "conv8",
                                          "conv12"])
    def test_predictor_modes(self, rnn_mode):
        run_one_step(arMode='GRU', rnnMode=rnn_mode)

    def test_multihead(self):
        run_one_step(arMode='GRU', rnnMode='transformer', multihead_rnn=True)

    def test_reverse_mode(self):
        run_one_step(arMode='GRU', rnnMode='linear', cpc_mode='reverse')

    def test_none_mode(self):
        losses = run_one_step(arMode='GRU', rnnMode='linear',
                              cpc_mode='none')
        assert (losses == 0).all()

    def test_bert_mode(self):
        run_one_step(arMode='GRU', rnnMode='linear', cpc_mode='bert')

    def test_wav2vec_masking(self):
        run_one_step(arMode='GRU', rnnMode='linear', mask_prob=0.05)

    def test_dropout_flag(self):
        run_one_step(arMode='GRU', rnnMode='transformer', dropout=True)

    def test_norm_modes(self):
        for norm in ("instanceNorm", "ID", "batchNorm"):
            run_one_step(arMode='GRU', rnnMode='linear', normMode=norm)

    def test_encoder_types(self):
        for enc in ("mfcc", "lfb"):
            run_one_step(arMode='GRU', rnnMode='linear', encoder_type=enc)

    def test_nlevels_gru(self):
        run_one_step(arMode='GRU', rnnMode='linear', nLevelsGRU=2)


class TestStatefulSequential:

    def test_sequential_keep_hidden(self, tmp_path):
        """samplingType=sequential threads the AR hidden state across steps
        (reference keepHidden, `feature_loader.py:230-232`)."""
        from cpc2_tpu import train as train_cli
        from cpc2_tpu.data.audio_io import save_wav
        root = tmp_path / "db"
        rs = np.random.RandomState(0)
        for spk in ['a', 'b']:
            d = root / spk / 'c'
            d.mkdir(parents=True)
            for i in range(2):
                x = (0.2 * np.sin(np.arange(26000) * 0.03)
                     + 0.05 * rs.randn(26000)).astype(np.float32)
                save_wav(str(d / f'{spk}-{i}.wav'), x, 16000)
        ckpt = tmp_path / "ck"
        train_cli.main(['--pathDB', str(root), '--file_extension', '.wav',
                        '--pathCheckpoint', str(ckpt),
                        '--hiddenEncoder', '16', '--hiddenGar', '16',
                        '--nPredicts', '2', '--negativeSamplingExt', '4',
                        '--sizeWindow', '3200', '--nEpoch', '1',
                        '--nGPU', '1', '--batchSizeGPU', '2',
                        '--rnnMode', 'linear', '--arMode', 'GRU',
                        '--samplingType', 'sequential',
                        '--random_seed', '5', '--save_step', '1'])
        assert (ckpt / 'checkpoint_0.pt').exists()


class TestDeterminism:

    def test_step_deterministic(self):
        l1 = run_one_step(arMode='GRU', rnnMode='linear')
        l2 = run_one_step(arMode='GRU', rnnMode='linear')
        np.testing.assert_array_equal(l1, l2)


def test_masked_frames_become_infonce_targets():
    """Reference parity for --mask_prob: getMask writes mask_emb into
    encodedData IN PLACE (`model.py:375-378`), so the returned encodings —
    the InfoNCE targets and negative pool — carry mask_emb at masked
    positions, not the true encoder outputs."""
    import jax.numpy as jnp
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 16
    # mask_prob tiny because of the reference's x100 factor: 0.002 masks
    # ~1/3 of the 20 frames here
    args.sizeWindow, args.mask_prob, args.mask_length = 3200, 0.002, 3
    bundle = fl.init_model(args, seed=0)
    frames = encoded_seq_len(args.sizeWindow)
    mask = compute_mask_indices((2, frames), args.mask_prob,
                                args.mask_length, min_masks=2)
    assert mask.any() and not mask.all()
    x = jnp.asarray(np.random.RandomState(0).randn(2, args.sizeWindow),
                    jnp.float32)
    _, enc_masked, _, _ = bundle.module.apply(
        bundle.variables, x, None, train=False,
        mask_indices=jnp.asarray(mask))
    _, enc_plain, _, _ = bundle.module.apply(bundle.variables, x, None,
                                             train=False)
    mask_emb = np.asarray(bundle.variables['params']['mask_emb'])
    enc_masked, enc_plain = np.asarray(enc_masked), np.asarray(enc_plain)
    np.testing.assert_allclose(enc_masked[mask],
                               np.broadcast_to(mask_emb,
                                               enc_masked[mask].shape))
    np.testing.assert_allclose(enc_masked[~mask], enc_plain[~mask])
