"""Direct coverage for auxiliary subsystems previously covered only
indirectly: distributed rank discovery, SLURM sweep helpers, the resampler
tool, hub export, and quantized-units ABX features."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp


class TestDistributedMode:
    """`parallel/distributed.py:init_distributed_mode` mirrors the fields the
    reference sets from SLURM / launcher env (`distributed_mode.py:11-142`)."""

    def _ns(self):
        import argparse
        return argparse.Namespace()

    def test_slurm_env(self, monkeypatch):
        from cpc2_tpu.parallel.distributed import init_distributed_mode
        for k in ('WORLD_SIZE', 'RANK', 'LOCAL_RANK'):
            monkeypatch.delenv(k, raising=False)
        monkeypatch.setenv('SLURM_JOB_ID', '1234')
        monkeypatch.setenv('SLURM_JOB_NUM_NODES', '1')
        monkeypatch.setenv('SLURM_NODEID', '0')
        monkeypatch.setenv('SLURM_LOCALID', '0')
        monkeypatch.setenv('SLURM_PROCID', '0')
        monkeypatch.setenv('SLURM_NTASKS', '1')
        p = self._ns()
        init_distributed_mode(p)
        assert p.is_slurm_job and p.is_master
        assert (p.world_size, p.global_rank, p.n_nodes) == (1, 0, 1)
        assert not p.multi_gpu and not p.multi_node

    def test_launcher_env(self, monkeypatch):
        from cpc2_tpu.parallel.distributed import init_distributed_mode
        monkeypatch.delenv('SLURM_JOB_ID', raising=False)
        monkeypatch.setenv('WORLD_SIZE', '1')
        monkeypatch.setenv('RANK', '0')
        monkeypatch.setenv('LOCAL_RANK', '0')
        p = self._ns()
        init_distributed_mode(p)
        assert not p.is_slurm_job
        assert p.world_size == 1 and p.is_master

    def test_single_host_fallback(self, monkeypatch):
        from cpc2_tpu.parallel.distributed import init_distributed_mode
        for k in ('SLURM_JOB_ID', 'WORLD_SIZE'):
            monkeypatch.delenv(k, raising=False)
        p = self._ns()
        init_distributed_mode(p)
        assert (p.world_size, p.global_rank, p.node_id) == (1, 0, 0)
        assert p.is_master and p.n_gpu_per_node == 1


class TestGridUtils:

    def test_parse_json_sweep(self):
        from cpc2_tpu.utils.grid_utils import parse_json_sweep
        cmds = parse_json_sweep({"hiddenEncoder": [128, 256],
                                 "normMode": "layerNorm",
                                 "samplingType": ["uniform"]})
        assert len(cmds) == 2
        assert "--hiddenEncoder=128" in cmds[0]
        assert "--normMode=layerNorm" in cmds[0]
        assert "--samplingType=uniform" in cmds[1]

    def test_parse_json_sweep_bool_and_errors(self):
        from cpc2_tpu.utils.grid_utils import parse_json_sweep
        cmds = parse_json_sweep({"abspos": [True, False]})
        assert cmds[0] == ["--abspos"] and cmds[1] == [""]
        with pytest.raises(Exception):
            parse_json_sweep({"bad": [{"nested": 1}]})
        with pytest.raises(AssertionError):
            parse_json_sweep({"s": ['has"quote']})

    def test_slurm_wrapper_call(self):
        from cpc2_tpu.utils.grid_utils import SlurmWrapper
        seen = []
        w = SlurmWrapper(seen.append, verbose=True)
        w(["--flag=1"])
        assert seen == [["--flag=1"]] and w.args == ["--flag=1"]


class TestResampler:

    def test_resample_halves_rate(self):
        from cpc2_tpu.tools.adjust_sample_rate import resample
        sr, target = 32000, 16000
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = resample(x, sr, target)
        assert y.shape[0] == target
        # dominant frequency preserved
        f = np.fft.rfftfreq(target, 1 / target)
        peak = f[np.argmax(np.abs(np.fft.rfft(y)))]
        assert abs(peak - 440) < 2
        # no-op path returns input untouched
        assert resample(x, sr, sr) is x

    def test_adjust_sample_rate_end_to_end(self, tmp_path):
        from cpc2_tpu.data.audio_io import load_wav, save_wav
        from cpc2_tpu.tools.adjust_sample_rate import (adjust_sample_rate,
                                                       get_names_list)
        db = tmp_path / "db"
        out = tmp_path / "out"
        db.mkdir(), out.mkdir()
        x = np.sin(np.arange(8000) * 0.05).astype(np.float32)
        save_wav(str(db / "utt1.wav"), x, 8000)
        tsv = tmp_path / "files.tsv"
        tsv.write_text("utt1.wav 0 1 2\n")
        names = get_names_list(str(tsv))
        assert names == ["utt1.wav"]
        adjust_sample_rate(str(db), names, str(out), 16000)
        y, sr = load_wav(str(out / "utt1.wav"))
        assert sr == 16000 and y.shape[0] == 16000


class TestHubExport:

    def test_cpc_audio_fresh(self):
        """hubconf.CPC_audio(pretrained=False) builds a working bundle with
        kwarg config overrides (reference `hubconf.py`)."""
        import hubconf
        bundle = hubconf.CPC_audio(pretrained=False, hiddenEncoder=24,
                                   hiddenGar=24)
        assert bundle.hidden_encoder == 24
        c, e, _, _ = bundle.apply(jnp.zeros((1, 4160), jnp.float32))
        assert c.shape == (1, 26, 24) and e.shape == (1, 26, 24)

    def test_cpc_audio_pretrained_payload(self):
        """The pretrained conversion path, fed the committed miniature
        payload in the exact FB libri-light layout
        (`tests/fixtures/hub_mini_60k.pt`, see scripts/make_hub_fixture.py)
        — only the literal HTTP fetch stays untested offline."""
        import os
        import numpy as np
        import pytest
        torch = pytest.importorskip("torch")
        import hubconf
        fixture = os.path.join(os.path.dirname(__file__), 'fixtures',
                               'hub_mini_60k.pt')
        bundle = hubconf.CPC_audio(pretrained=True,
                                   pretrained_path=fixture)
        assert bundle.hidden_encoder == 32
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 4160).astype(np.float32))
        c, e, _, _ = bundle.apply(x)
        assert c.shape == (1, 26, 32)
        assert np.isfinite(np.asarray(c)).all()
        # the converted params are the payload's, not fresh init:
        # round-trip back to torch layout and compare every key
        from cpc2_tpu.io.torch_ckpt import params_to_torch_state_dict
        payload = torch.load(fixture, weights_only=False)
        back = params_to_torch_state_dict(bundle.variables['params'],
                                          norm_mode='layerNorm')
        for k, v in payload['weights'].items():
            np.testing.assert_allclose(np.asarray(back[k]), v.numpy(),
                                       atol=1e-6, err_msg=k)

    def test_hub_fixture_is_exact_fb_layout(self):
        """Strict-load the fixture's flat `gEncoder.*`/`gAR.*` weights into
        real torch modules mirroring the reference CPCModel — pins the
        committed payload to the layout `model.load_state_dict` expects
        (`/root/reference/hubconf.py:33-34`)."""
        import os
        import pytest
        torch = pytest.importorskip("torch")
        from tests.test_parity_torch import build_torch_encoder
        fixture = os.path.join(os.path.dirname(__file__), 'fixtures',
                               'hub_mini_60k.pt')
        weights = torch.load(fixture, weights_only=False)['weights']
        enc_sd = {k[len('gEncoder.'):]: v for k, v in weights.items()
                  if k.startswith('gEncoder.')}
        ar_sd = {k[len('gAR.baseNet.'):]: v for k, v in weights.items()
                 if k.startswith('gAR.baseNet.')}
        assert enc_sd and ar_sd
        build_torch_encoder(32).load_state_dict(enc_sd)   # strict
        torch.nn.LSTM(32, 32, batch_first=True).load_state_dict(ar_sd)


class TestQuantizedUnitsABXFeatures:
    """`eval/eval_ABX_clustering.py:QuantizedClustering` — features from a
    precomputed quantized_outputs.txt (reference
    `eval_ABX_clustering.py:151-240`)."""

    def test_digit_units(self, tmp_path):
        from cpc2_tpu.eval.eval_ABX_clustering import QuantizedClustering
        q = tmp_path / "quantized_outputs.txt"
        q.write_text("/some/path/fileA.wav\t0,3,2,2\n"
                     "fileB\t1,0,1,1\n")
        maker = QuantizedClustering(str(q))
        assert maker.n_units == 4
        feats = maker.feature_function("fileA.wav")
        assert feats.shape == (1, 4, 4)
        np.testing.assert_array_equal(feats[0, 0],
                                      np.array([1, 0, 0, 0], feats.dtype))
        np.testing.assert_array_equal(feats[0, 1],
                                      np.array([0, 0, 0, 1], feats.dtype))
        assert maker.step_feature_multiplication == 1

    def test_multi_group_units_need_dict(self, tmp_path):
        from cpc2_tpu.eval.eval_ABX_clustering import QuantizedClustering
        q = tmp_path / "quantized_outputs.txt"
        q.write_text("fileA\t0-1,1-0\n")
        with pytest.raises(AssertionError):
            QuantizedClustering(str(q))
        d = tmp_path / "dict.txt"
        d.write_text("0-1 12\n1-0 7\n")
        maker = QuantizedClustering(str(q), onehot_dict=str(d))
        assert maker.n_units == 2
        feats = maker.feature_function("fileA")
        assert feats.shape == (1, 2, 2)
        np.testing.assert_array_equal(feats[0, 0],
                                      np.array([1, 0], feats.dtype))


class TestCCATraining:

    def test_train_cca_end_to_end(self, tmp_path):
        """`research/train_cca.py:main` fits a CCA between two checkpoints'
        features and pickles it (reference `CCA_analysis/train_CCA.py`)."""
        pytest.importorskip("sklearn")
        import pickle
        from cpc2_tpu.data.audio_io import save_wav
        from cpc2_tpu.research import train_cca
        from tests.test_feature_api import _write_ckpt

        da, db_ = tmp_path / "a", tmp_path / "b"
        da.mkdir(), db_.mkdir()
        _write_ckpt(da, 20, seed=0)
        _write_ckpt(db_, 20, seed=1)

        db = tmp_path / "audio"
        db.mkdir()
        rs = np.random.RandomState(0)
        for i in range(2):
            x = (0.2 * np.sin(np.arange(21000) * (0.01 + 0.003 * i))
                 + 0.01 * rs.randn(21000)).astype(np.float32)
            save_wav(str(db / f"f{i}.wav"), x, 16000)

        out = tmp_path / "cca_out"
        train_cca.main(['--path_cp_X', str(da / "checkpoint_3.pt"),
                        '--path_cp_Y', str(db_ / "checkpoint_3.pt"),
                        '--path_db', str(db), '--path_output', str(out),
                        '--n_components', '4', '--max_size_seq', '10240',
                        '--no_batch'])
        with open(out / "cca_model_n_components_4.pkl", 'rb') as f:
            cca = pickle.load(f)
        proj = cca.transform(np.zeros((5, 20)))
        assert proj.shape == (5, 4)
        assert (out / "CCA_info_args.json").exists()


class TestPrecisionFlag:

    def test_apply_precision(self):
        import jax
        from cpc2_tpu.utils.misc import apply_precision
        before = jax.config.jax_default_matmul_precision
        try:
            apply_precision('fp32')
            assert jax.config.jax_default_matmul_precision == 'highest'
            apply_precision('bf16')
            assert jax.config.jax_default_matmul_precision == 'bfloat16'
            apply_precision('bf16mix')  # no-op: backend default
            assert jax.config.jax_default_matmul_precision == 'bfloat16'
            with pytest.raises(ValueError):
                apply_precision('fp8')
        finally:
            jax.config.update('jax_default_matmul_precision', before)
