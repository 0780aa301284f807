"""Full checkpoint interop: a reference-layout torch checkpoint (written by
torch modules with reference state-dict names + checkpoint_args.json) loads
through `cpc2_tpu.feature_loader.loadModel` and produces bit-matched features
— the foundation of the ABX-parity target (`SURVEY.md` §7 hard parts)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from tests.test_parity_torch import build_torch_encoder

TOL = 3e-4


@pytest.fixture(scope="module")
def torch_checkpoint(tmp_path_factory):
    """Write a reference-format checkpoint from torch modules: 24-d conv
    encoder (layerNorm) + 1-layer LSTM AR, linear prediction heads."""
    d = tmp_path_factory.mktemp("tckpt")
    hidden = 24
    torch.manual_seed(0)
    tenc = build_torch_encoder(hidden)
    tlstm = torch.nn.LSTM(hidden, hidden, num_layers=1, batch_first=True)

    state = {}
    state.update({f'gEncoder.{k}': v for k, v in tenc.state_dict().items()})
    state.update({f'gAR.baseNet.{k}': v
                  for k, v in tlstm.state_dict().items()})
    crit = {}
    for k in range(4):
        w = torch.randn(hidden, hidden) * 0.05
        crit[f'wPrediction.predictors.{k}.weight'] = w

    ckpt = {"gEncoder": state, "cpcCriterion": crit, "optimizer": {},
            "best": None}
    torch.save(ckpt, str(d / "checkpoint_9.pt"))

    args = vars(get_default_cpc_config())
    args.update({"hiddenEncoder": hidden, "hiddenGar": hidden,
                 "nPredicts": 4, "negativeSamplingExt": 8,
                 "arMode": "LSTM", "rnnMode": "linear",
                 "sizeWindow": 4160, "load": None, "supervised": False})
    with open(d / "checkpoint_args.json", 'w') as f:
        json.dump(args, f)
    with open(d / "checkpoint_logs.json", 'w') as f:
        json.dump({"epoch": [0]}, f)
    return d, tenc, tlstm


class TestCheckpointInterop:

    def test_load_model_feature_parity(self, torch_checkpoint):
        d, tenc, tlstm = torch_checkpoint
        bundle, hg, he = fl.loadModel([str(d / "checkpoint_9.pt")])
        assert (hg, he) == (24, 24)

        x = np.random.RandomState(0).randn(3, 4160).astype(np.float32) * 0.2
        c, e, _, _ = bundle.apply(jnp.asarray(x))
        with torch.no_grad():
            et = tenc(torch.from_numpy(x).unsqueeze(1)).permute(0, 2, 1)
            ct, _ = tlstm(et)
        np.testing.assert_allclose(np.asarray(e), et.numpy(), atol=TOL)
        np.testing.assert_allclose(np.asarray(c), ct.numpy(), atol=TOL)

    def test_load_criterion_stacked(self, torch_checkpoint):
        """Per-head torch predictor weights stack into the vmap layout."""
        from cpc2_tpu.io.torch_ckpt import (load_torch_checkpoint,
                                            params_from_torch_state_dict)
        from cpc2_tpu.losses import CPCUnsupervisedCriterion
        d, _, _ = torch_checkpoint
        crit = CPCUnsupervisedCriterion(
            n_predicts=4, dim_ar=24, dim_enc=24, negative_sampling_ext=8,
            rnn_mode='linear', size_input_seq=26)
        dummy = jnp.zeros((1, 26, 24))
        variables = crit.init(
            {'params': jax.random.PRNGKey(0),
             'negatives': jax.random.PRNGKey(1)}, dummy, dummy, None,
            train=False)
        sd = load_torch_checkpoint(str(d / "checkpoint_9.pt"))
        params, _, unmatched = params_from_torch_state_dict(
            sd["cpcCriterion"], variables['params'])
        assert not unmatched
        stacked = np.asarray(params['wPrediction']['predictors']['weight'])
        assert stacked.shape == (4, 24, 24)
        for k in range(4):
            np.testing.assert_allclose(
                stacked[k],
                sd["cpcCriterion"][f'wPrediction.predictors.{k}.weight']
                .numpy(), atol=1e-7)

    def test_feature_module_and_build_feature(self, torch_checkpoint,
                                              tmp_path):
        """buildFeature over a real file == torch chunked forward with LSTM
        hidden carry (keepHidden semantics)."""
        from cpc2_tpu.data.audio_io import save_wav
        d, tenc, tlstm = torch_checkpoint
        bundle, _, _ = fl.loadModel([str(d / "checkpoint_9.pt")])
        maker = fl.FeatureModule(bundle, get_encoded=False, keep_hidden=True)

        rs = np.random.RandomState(1)
        wav = (0.3 * np.sin(np.arange(9600) * 0.02)
               + 0.02 * rs.randn(9600)).astype(np.float32)
        p = str(tmp_path / "f.wav")
        save_wav(p, wav, 16000)
        # save_wav quantizes to PCM16; reload to get the exact stored values
        from cpc2_tpu.data.audio_io import load_wav
        wav_q, _ = load_wav(p)

        feats = np.asarray(fl.buildFeature(maker, p, maxSizeSeq=3200))
        with torch.no_grad():
            hidden = None
            outs = []
            t = torch.from_numpy(wav_q)
            for start in range(0, 9600, 3200):
                chunk = t[start:start + 3200].view(1, 1, -1)
                enc = tenc(chunk).permute(0, 2, 1)
                c, hidden = tlstm(enc, hidden)
                outs.append(c)
            ref = torch.cat(outs, dim=1).numpy()
        assert feats.shape == ref.shape
        np.testing.assert_allclose(feats[0], ref[0], atol=TOL)


class TestTransformerPredictorInterop:

    def test_stacked_transformer_heads_parity(self):
        """Default-recipe criterion: K torch transformer heads (built by the
        reference's buildTransformerAR) -> stacked vmap params -> identical
        predictions per head."""
        from tests.test_parity_torch import load_reference_transformers
        from cpc2_tpu.io.torch_ckpt import params_from_torch_state_dict
        from cpc2_tpu.losses.criterion import PredictionNetwork
        ref = load_reference_transformers()

        k_heads, dim, w = 3, 16, 10
        torch.manual_seed(1)
        theads = [ref.buildTransformerAR(dim, dim, 1, w, False)
                  for _ in range(k_heads)]
        for t in theads:
            t.eval()
        sd = {}
        for k, t in enumerate(theads):
            for name, v in t.state_dict().items():
                sd[f'wPrediction.predictors.{k}.{name}'] = v

        net = PredictionNetwork(n_predicts=k_heads, dim_ar=dim, dim_enc=dim,
                                rnn_mode='transformer', size_input_seq=w)
        c = np.random.RandomState(0).randn(2, w, dim).astype(np.float32)
        template = net.init({'params': jax.random.PRNGKey(0)},
                            jnp.asarray(c), train=False)
        # strip the wPrediction prefix: PredictionNetwork IS wPrediction here
        sd_stripped = {kk[len('wPrediction.'):]: v for kk, v in sd.items()}
        params, _, unmatched = params_from_torch_state_dict(
            sd_stripped, template['params'])
        assert not unmatched
        preds = net.apply({'params': params}, jnp.asarray(c), train=False)
        assert preds.shape == (2, k_heads, w, dim)
        for k, t in enumerate(theads):
            with torch.no_grad():
                ref_out = t(torch.from_numpy(c)).numpy()
            np.testing.assert_allclose(np.asarray(preds[:, k]), ref_out,
                                       atol=3e-4)
