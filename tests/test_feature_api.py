"""Direct coverage for the feature-extraction API surface that was only
covered indirectly: multi-checkpoint `loadModel` -> ConcatenatedModel,
CPCModule, buildFeature_batch, toOneHot, loadSupervisedCriterion
(reference `cpc/feature_loader.py`)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.io.torch_ckpt import (params_to_torch_state_dict,
                                    save_checkpoint)


def _write_ckpt(d, hidden, seed, extra_args=None):
    """Init a fresh tiny model and save it in the reference torch layout."""
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = hidden
    args.nPredicts, args.negativeSamplingExt = 2, 4
    args.sizeWindow, args.load, args.supervised = 4160, None, False
    for k, v in (extra_args or {}).items():
        setattr(args, k, v)
    bundle = fl.init_model(args, seed=seed)
    sd = params_to_torch_state_dict(bundle.variables['params'],
                                    rnn_mode=args.arMode)
    save_checkpoint(sd, {}, {}, None, str(d / "checkpoint_3.pt"))
    with open(d / "checkpoint_args.json", 'w') as f:
        json.dump(vars(args), f)
    with open(d / "checkpoint_logs.json", 'w') as f:
        json.dump({"epoch": [0]}, f)
    return bundle, args


class TestConcatenatedLoad:

    def test_two_checkpoints_concat(self, tmp_path):
        """loadModel([ckpt_a, ckpt_b]) concatenates features channel-wise
        (reference `feature_loader.py:238-283`, `model.py:449-465`)."""
        da, db = tmp_path / "a", tmp_path / "b"
        da.mkdir(), db.mkdir()
        ba, _ = _write_ckpt(da, 20, seed=0)
        bb, _ = _write_ckpt(db, 28, seed=1)

        bundle, hg, he = fl.loadModel([str(da / "checkpoint_3.pt"),
                                       str(db / "checkpoint_3.pt")])
        assert (hg, he) == (48, 48)

        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 4160).astype(np.float32) * 0.1)
        c, e, _, _ = bundle.apply(x)
        assert c.shape == (2, 26, 48) and e.shape == (2, 26, 48)
        ca, ea, _, _ = ba.apply(x)
        cb, eb, _, _ = bb.apply(x)
        np.testing.assert_allclose(np.asarray(c[..., :20]), np.asarray(ca),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c[..., 20:]), np.asarray(cb),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(e[..., 20:]), np.asarray(eb),
                                   atol=1e-5)

    def test_feature_module_over_concat(self, tmp_path):
        da, db = tmp_path / "a", tmp_path / "b"
        da.mkdir(), db.mkdir()
        _write_ckpt(da, 20, seed=0)
        _write_ckpt(db, 20, seed=1)
        bundle, _, _ = fl.loadModel([str(da / "checkpoint_3.pt"),
                                     str(db / "checkpoint_3.pt")])
        maker = fl.FeatureModule(bundle, get_encoded=False)
        out = maker((np.zeros((1, 4160), np.float32), None))
        assert out.shape == (1, 26, 40)


class TestCPCModule:

    def test_prediction_scores(self):
        """CPCModule returns per-step positive cosine scores as a feature map
        (reference `feature_loader.py:57-82`)."""
        from cpc2_tpu.losses import CPCUnsupervisedCriterion
        args = get_default_cpc_config()
        args.hiddenEncoder = args.hiddenGar = 20
        args.nPredicts, args.negativeSamplingExt = 2, 4
        args.sizeWindow = 4160
        bundle = fl.init_model(args, seed=0)
        crit = CPCUnsupervisedCriterion(
            n_predicts=2, dim_ar=20, dim_enc=20, negative_sampling_ext=4,
            rnn_mode='linear', size_input_seq=26)
        dummy = jnp.zeros((1, 26, 20))
        variables = crit.init(
            {'params': jax.random.PRNGKey(0),
             'negatives': jax.random.PRNGKey(1)}, dummy, dummy, None,
            train=False)
        wrapper = fl.CriterionWrapper(crit, variables)

        x = np.random.RandomState(0).randn(3, 4160).astype(np.float32) * 0.1
        mod = fl.CPCModule(bundle, wrapper, n_pred=-1)
        out = np.asarray(mod((x, None)))
        # softmax over the window axis
        assert out.shape == (3, 26 - 2)
        np.testing.assert_allclose(out.sum(1), np.ones(3), atol=1e-5)

        raw = np.asarray(fl.CPCModule(bundle, wrapper, n_pred=-1,
                                      main_distance_only=True)((x, None)))
        np.testing.assert_allclose(
            jax.nn.softmax(jnp.asarray(raw), axis=1), out, atol=1e-5)


class TestBuildFeatureBatch:

    def test_batch_equals_chunked(self, tmp_path):
        """buildFeature_batch == buildFeature when there is no hidden
        carry-over (reference `feature_loader.py:370-433`)."""
        from cpc2_tpu.data.audio_io import save_wav
        args = get_default_cpc_config()
        args.hiddenEncoder = args.hiddenGar = 20
        args.sizeWindow = 4160
        bundle = fl.init_model(args, seed=0)
        maker = fl.FeatureModule(bundle, get_encoded=False,
                                 keep_hidden=False)
        rs = np.random.RandomState(2)
        wav = (0.3 * np.sin(np.arange(10240) * 0.01)
               + 0.01 * rs.randn(10240)).astype(np.float32)
        p = str(tmp_path / "x.wav")
        save_wav(p, wav, 16000)

        a = np.asarray(fl.buildFeature(maker, p, maxSizeSeq=3200))
        b = np.asarray(fl.buildFeature_batch(maker, p, maxSizeSeq=3200,
                                             batch_size=2))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestSupervisedCriterionLoad:

    def test_load_supervised_criterion(self, tmp_path):
        """loadSupervisedCriterion builds a PhoneCriterion from checkpoint
        args + phone labels (reference `feature_loader.py:159-173`)."""
        from cpc2_tpu.losses import PhoneCriterion
        pl = tmp_path / "phones.txt"
        with open(pl, 'w') as f:
            for i in range(3):
                f.write(f"f{i} 0 1 2 1\n")

        d = tmp_path / "ck"
        d.mkdir()
        _, args = _write_ckpt(d, 20, seed=0,
                              extra_args={"pathPhone": str(pl),
                                          "onEncoder": False})
        # write a criterion state into the checkpoint
        crit = PhoneCriterion(dim_encoder=20, n_phones=3, on_encoder=False)
        dummy = jnp.zeros((1, 8, 20))
        cv = crit.init(jax.random.PRNGKey(0), dummy, dummy,
                       jnp.zeros((1, 8), jnp.int32), train=False)
        csd = params_to_torch_state_dict(cv['params'])
        from cpc2_tpu.io.torch_ckpt import load_torch_checkpoint
        full = load_torch_checkpoint(str(d / "checkpoint_3.pt"))
        save_checkpoint(full["gEncoder"], csd, {}, None,
                        str(d / "checkpoint_3.pt"))

        wrapper, n_phones = fl.loadSupervisedCriterion(
            str(d / "checkpoint_3.pt"))
        assert n_phones == 3
        pred = wrapper.get_prediction(jnp.zeros((2, 8, 20)))
        assert pred.shape == (2, 8, 3)


def test_to_one_hot():
    v = jnp.asarray([[0, 2], [1, 1]])
    out = fl.toOneHot(v, 3)
    assert out.shape == (2, 2, 3)
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out[0, 1]), [0, 0, 1])


def test_get_module_unwraps():
    """getModule peels FeatureModule/combined wrappers down to the
    ModelBundle (reference `feature_loader.py:286-293`)."""
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 16
    args.sizeWindow = 4160
    bundle = fl.init_model(args, seed=0)
    maker = fl.FeatureModule(bundle, get_encoded=False)
    assert fl.getModule(maker) is bundle
    assert fl.get_module(bundle) is bundle

    class _Phone:   # ModelPhoneCombined-shaped wrapper
        model = maker
    assert fl.getModule(_Phone()) is bundle


def test_kmean_cluster_step():
    """kMeanClusterStep returns per-cluster (sums, counts) for a Lloyd
    iteration (reference `clustering.py:37-53`)."""
    from cpc2_tpu.clustering import kMeanCluster, kMeanClusterStep
    centers = np.asarray([[[0.0, 0.0], [10.0, 10.0]]], np.float32)
    step = kMeanClusterStep(kMeanCluster(centers))
    feats = jnp.asarray([[[0.5, 0.0], [9.0, 10.0], [0.0, 1.0]]])
    sums, counts = step(feats)
    np.testing.assert_allclose(np.asarray(counts), [2.0, 1.0])
    np.testing.assert_allclose(np.asarray(sums),
                               [[0.5, 1.0], [9.0, 10.0]], atol=1e-6)


class TestBuildFeatureFiles:

    def test_matches_per_file(self, tmp_path):
        """build_feature_files == buildFeature per file, incl. the per-file
        LSTM hidden carry (files batched by identical length)."""
        from cpc2_tpu.data.audio_io import save_wav
        args = get_default_cpc_config()
        args.hiddenEncoder = args.hiddenGar = 20
        args.arMode, args.sizeWindow = 'LSTM', 4160
        bundle = fl.init_model(args, seed=0)

        rs = np.random.RandomState(3)
        paths = []
        for i, n in enumerate([9600, 9600, 6400, 9600]):  # two length groups
            wav = (0.3 * np.sin(np.arange(n) * (0.01 + 0.002 * i))
                   + 0.01 * rs.randn(n)).astype(np.float32)
            p = str(tmp_path / f"f{i}.wav")
            save_wav(p, wav, 16000)
            paths.append(p)

        maker = fl.FeatureModule(bundle, get_encoded=False, keep_hidden=True)
        feats = fl.build_feature_files(maker, paths, maxSizeSeq=3200,
                                       max_batch=2)
        assert set(feats) == set(paths)
        for p in paths:
            ref = np.asarray(fl.buildFeature(maker, p, maxSizeSeq=3200))
            got = np.asarray(feats[p])
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, atol=2e-6)

    def test_strict_mode(self, tmp_path):
        from cpc2_tpu.data.audio_io import save_wav
        args = get_default_cpc_config()
        args.hiddenEncoder = args.hiddenGar = 20
        args.sizeWindow = 4160
        bundle = fl.init_model(args, seed=0)
        wav = np.sin(np.arange(8000) * 0.01).astype(np.float32)
        p = str(tmp_path / "s.wav")
        save_wav(p, wav, 16000)
        maker = fl.FeatureModule(bundle, get_encoded=False, keep_hidden=True)
        feats = fl.build_feature_files(maker, [p], maxSizeSeq=3200,
                                       strict=True)
        ref = np.asarray(fl.buildFeature(maker, p, maxSizeSeq=3200,
                                         strict=True))
        np.testing.assert_allclose(np.asarray(feats[p]), ref, atol=2e-6)


class TestBucketedFeatureFiles:

    def test_bucketing_merges_lengths_and_matches_except_tail(self, tmp_path):
        """bucket_frames pads files of different lengths into shared
        programs; outputs keep each file's true frame count and match the
        exact computation everywhere except the final few conv-edge
        frames."""
        from cpc2_tpu.data.audio_io import save_wav
        args = get_default_cpc_config()
        args.hiddenEncoder = args.hiddenGar = 20
        args.arMode, args.sizeWindow = 'LSTM', 4160
        bundle = fl.init_model(args, seed=0)

        rs = np.random.RandomState(7)
        paths = []
        for i, n in enumerate([9600, 9280, 6400, 8960]):  # 4 unique lengths
            wav = (0.3 * np.sin(np.arange(n) * (0.01 + 0.002 * i))
                   + 0.01 * rs.randn(n)).astype(np.float32)
            p = str(tmp_path / f"b{i}.wav")
            save_wav(p, wav, 16000)
            paths.append(p)

        maker = fl.FeatureModule(bundle, get_encoded=False, keep_hidden=True)
        feats = fl.build_feature_files(maker, paths, maxSizeSeq=3200,
                                       max_batch=4, bucket_frames=20)
        # 60/58/40/56 frames -> buckets 60/60/40/60: two groups, not four
        for p, n in zip(paths, [9600, 9280, 6400, 8960]):
            got = np.asarray(feats[p])
            ref = np.asarray(fl.buildFeature(maker, p, maxSizeSeq=3200))
            assert got.shape == ref.shape, (p, got.shape, ref.shape)
            body = got.shape[1] - 4
            np.testing.assert_allclose(got[:, :body], ref[:, :body],
                                       atol=2e-6)


class TestTrainMode:
    """--train_mode parity (reference `clustering_script.py:236-237`,
    `build_zeroSpeech_features.py:142`): skipping featureMaker.eval() keeps
    dropout active during feature extraction."""

    def _bundle(self):
        args = get_default_cpc_config()
        args.hiddenEncoder = args.hiddenGar = 16
        args.sizeWindow = 3200
        args.arMode = 'transformer'   # the AR stack with dropout (0.1)
        return fl.init_model(args, seed=0)

    def test_train_mode_keeps_dropout_active(self):
        bundle = self._bundle()
        audio = np.random.RandomState(0).randn(2, 3200).astype(np.float32)
        data = (audio, None)

        fm_eval = fl.FeatureModule(bundle, False)
        np.testing.assert_array_equal(np.asarray(fm_eval(data)),
                                      np.asarray(fm_eval(data)))

        fm_train = fl.FeatureModule(bundle, False, train_mode=True)
        first, second = (np.asarray(fm_train(data)),
                         np.asarray(fm_train(data)))
        assert not np.allclose(first, second), \
            "train_mode should draw a fresh dropout mask per forward"

        # deterministic given the seed: a second instance replays the stream
        fm_replay = fl.FeatureModule(bundle, False, train_mode=True)
        np.testing.assert_array_equal(first, np.asarray(fm_replay(data)))


def test_load_model_empty_list_raises_clearly():
    """--no_pretraining still needs a checkpoint (its stored args define
    the architecture); an empty load list must fail with guidance, not
    an IndexError (regression: round-4 probe run)."""
    import pytest
    from cpc2_tpu import feature_loader as fl
    with pytest.raises(ValueError, match='at least one checkpoint'):
        fl.loadModel([], loadStateDict=False)
