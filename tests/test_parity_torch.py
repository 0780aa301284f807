"""Bit-parity tests of the JAX model layer against PyTorch CPU.

The converter (`cpc2_tpu.io.torch_ckpt`) is exercised in both directions:
torch modules are built, their state dicts converted into flax params, and
outputs compared within fp32 tolerance. The transformer is checked against the
actual reference implementation loaded from /root/reference/cpc/transformers.py
(torch-only module, importable without torchaudio).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cpc2_tpu.io.torch_ckpt import (params_from_torch_state_dict,
                                    params_to_torch_state_dict)
from cpc2_tpu.models import CPCAR, CPCEncoder, CPCModel, BiDIRAR
from cpc2_tpu.models.encoder import ChannelNorm

TOL = 2e-4


def convert(module_torch, params_template):
    params, batch_stats, unmatched = params_from_torch_state_dict(
        module_torch.state_dict(), params_template)
    assert not unmatched, f"unmatched keys: {unmatched}"
    return params


def build_torch_encoder(size_hidden):
    """Reference CPCEncoder architecture built from torch primitives
    (layerNorm mode = per-timestep channel norm with unbiased variance)."""

    class TorchChannelNorm(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = torch.nn.Parameter(torch.ones(1, c, 1))
            self.bias = torch.nn.Parameter(torch.zeros(1, c, 1))

        def forward(self, x):
            m = x.mean(dim=1, keepdim=True)
            v = x.var(dim=1, keepdim=True)
            return (x - m) * torch.rsqrt(v + 1e-5) * self.weight + self.bias

    class TorchEncoder(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv0 = torch.nn.Conv1d(1, c, 10, stride=5, padding=3)
            self.batchNorm0 = TorchChannelNorm(c)
            self.conv1 = torch.nn.Conv1d(c, c, 8, stride=4, padding=2)
            self.batchNorm1 = TorchChannelNorm(c)
            self.conv2 = torch.nn.Conv1d(c, c, 4, stride=2, padding=1)
            self.batchNorm2 = TorchChannelNorm(c)
            self.conv3 = torch.nn.Conv1d(c, c, 4, stride=2, padding=1)
            self.batchNorm3 = TorchChannelNorm(c)
            self.conv4 = torch.nn.Conv1d(c, c, 4, stride=2, padding=1)
            self.batchNorm4 = TorchChannelNorm(c)

        def forward(self, x):
            import torch.nn.functional as F
            for i in range(5):
                conv = getattr(self, f'conv{i}')
                norm = getattr(self, f'batchNorm{i}')
                x = F.relu(norm(conv(x)))
            return x

    return TorchEncoder(size_hidden)


class TestEncoderParity:

    def test_channel_norm(self):
        c = 16
        x = np.random.RandomState(0).randn(3, 50, c).astype(np.float32)
        mod = ChannelNorm(num_features=c)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = mod.apply(params, jnp.asarray(x))
        xt = torch.from_numpy(x).permute(0, 2, 1)  # NCW
        m = xt.mean(dim=1, keepdim=True)
        v = xt.var(dim=1, keepdim=True)
        yt = ((xt - m) * torch.rsqrt(v + 1e-5)).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)

    def test_conv_stack(self):
        c = 24
        tenc = build_torch_encoder(c)
        jenc = CPCEncoder(size_hidden=c, norm_mode='layerNorm')
        x = np.random.RandomState(1).randn(2, 4800).astype(np.float32) * 0.1
        template = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = convert(tenc, template['params'])
        y = jenc.apply({'params': params}, jnp.asarray(x))
        with torch.no_grad():
            yt = tenc(torch.from_numpy(x).unsqueeze(1)).permute(0, 2, 1)
        assert y.shape == tuple(yt.shape)
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=TOL)

    def test_roundtrip_params(self):
        c = 8
        jenc = CPCEncoder(size_hidden=c, norm_mode='layerNorm')
        x = jnp.zeros((1, 1600))
        template = jenc.init(jax.random.PRNGKey(3), x)
        sd = params_to_torch_state_dict(template['params'])
        tenc = build_torch_encoder(c)
        tenc.load_state_dict(sd)  # must load cleanly (strict)
        back = convert(tenc, template['params'])
        flat1 = jax.tree_util.tree_leaves(template['params'])
        flat2 = jax.tree_util.tree_leaves(back)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)


class TestARParity:

    @pytest.mark.parametrize("mode", ["GRU", "LSTM", "RNN"])
    @pytest.mark.parametrize("layers", [1, 2])
    def test_rnn(self, mode, layers):
        din, dh, b, t = 12, 20, 3, 17
        cls = {"GRU": torch.nn.GRU, "LSTM": torch.nn.LSTM,
               "RNN": torch.nn.RNN}[mode]
        tnet = cls(din, dh, num_layers=layers, batch_first=True)
        jnet = CPCAR(dim_encoded=din, dim_output=dh, n_levels=layers,
                     mode=mode)
        x = np.random.RandomState(0).randn(b, t, din).astype(np.float32)
        template = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x))

        # torch keys are baseNet.weight_ih_l0 under CPCAR scope
        sd = {f'baseNet.{k}': v for k, v in tnet.state_dict().items()}
        params = convert(types.SimpleNamespace(state_dict=lambda: sd),
                         template['params'])
        y, h = jnet.apply({'params': params}, jnp.asarray(x))
        with torch.no_grad():
            yt, ht = tnet(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=TOL)
        if mode == "LSTM":
            np.testing.assert_allclose(np.asarray(h[0]), ht[0].numpy(),
                                       atol=TOL)
            np.testing.assert_allclose(np.asarray(h[1]), ht[1].numpy(),
                                       atol=TOL)
        else:
            np.testing.assert_allclose(np.asarray(h), ht.numpy(), atol=TOL)

    def test_hidden_carry(self):
        """keepHidden: running two chunks with carried hidden must equal one
        pass over the concatenated sequence."""
        din, dh = 8, 8
        jnet = CPCAR(dim_encoded=din, dim_output=dh, n_levels=1, mode="GRU")
        x = np.random.RandomState(0).randn(2, 20, din).astype(np.float32)
        params = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y_full, _ = jnet.apply(params, jnp.asarray(x))
        y1, h = jnet.apply(params, jnp.asarray(x[:, :9]))
        y2, _ = jnet.apply(params, jnp.asarray(x[:, 9:]), hidden=h)
        np.testing.assert_allclose(np.asarray(y_full),
                                   np.concatenate([y1, y2], axis=1),
                                   atol=1e-5)

    def test_bidir(self):
        din, dh = 6, 8
        tnet = torch.nn.Module()
        tnet.netForward = torch.nn.GRU(din, dh // 2, batch_first=True)
        tnet.netBackward = torch.nn.GRU(din, dh // 2, batch_first=True)
        jnet = BiDIRAR(dim_encoded=din, dim_output=dh)
        x = np.random.RandomState(0).randn(2, 11, din).astype(np.float32)
        template = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = convert(tnet, template['params'])
        y, _ = jnet.apply({'params': params}, jnp.asarray(x))
        with torch.no_grad():
            xf, _ = tnet.netForward(torch.from_numpy(x))
            xb, _ = tnet.netBackward(torch.flip(torch.from_numpy(x), [1]))
            yt = torch.cat([xf, torch.flip(xb, [1])], dim=2)
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=TOL)


def load_reference_transformers():
    pkg = types.ModuleType('cpc')
    pkg.__path__ = ['/root/reference/cpc']
    sys.modules.setdefault('cpc', pkg)
    spec = importlib.util.spec_from_file_location(
        'cpc.transformers', '/root/reference/cpc/transformers.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestTransformerParity:

    @pytest.mark.parametrize("abspos", [False, True])
    def test_transformer_ar(self, abspos):
        ref = load_reference_transformers()
        dim_enc, dim_ar, s = 16, 16, 12
        tnet = ref.buildTransformerAR(dim_enc, dim_ar, 1, s, abspos)
        tnet.eval()
        from cpc2_tpu.models import build_transformer_ar
        jnet = build_transformer_ar(dim_enc, dim_ar, 1, s, abspos)
        x = np.random.RandomState(0).randn(2, s, dim_ar).astype(np.float32)
        template = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             train=False)
        params = convert(tnet, template['params'])
        y, _ = jnet.apply({'params': params}, jnp.asarray(x), train=False)
        with torch.no_grad():
            yt = tnet(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=TOL)

    def test_transformer_blocking(self):
        """Sequences longer than sizeSeq are processed in independent blocks;
        check vs reference with S = 2.5 blocks."""
        ref = load_reference_transformers()
        dim, s_block = 8, 8
        tnet = ref.buildTransformerAR(dim, dim, 1, s_block, False)
        tnet.eval()
        from cpc2_tpu.models import build_transformer_ar
        jnet = build_transformer_ar(dim, dim, 1, s_block, False)
        x = np.random.RandomState(0).randn(1, 20, dim).astype(np.float32)
        template = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             train=False)
        params = convert(tnet, template['params'])
        y, _ = jnet.apply({'params': params}, jnp.asarray(x), train=False)
        with torch.no_grad():
            yt = tnet(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=TOL)

    def test_multihead_transformer(self):
        ref = load_reference_transformers()
        dim, s, k = 16, 10, 3
        tnet = ref.buildMultHeadTransformerAR(dim, dim, 1, s, False, k)
        tnet.eval()
        from cpc2_tpu.models import build_multihead_transformer_ar
        jnet = build_multihead_transformer_ar(dim, dim, 1, s, False, k)
        x = np.random.RandomState(0).randn(2, s, dim).astype(np.float32)
        template = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             train=False)
        params = convert(tnet, template['params'])
        y = jnet.apply({'params': params}, jnp.asarray(x), train=False)
        with torch.no_grad():
            yt = tnet(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=TOL)


class TestFullModelParity:

    def test_relpos_reformulation_matches_shift_trick(self):
        """The causal-equivalent relpos form in ScaledDotProductAttention
        (static (dk, s, s) gather + one contraction) must match the
        reference's zero-diagonal shift trick (`transformers.py:61-66`)
        in BOTH the masked logits and the Krelpos/q gradients."""
        import math
        rs = np.random.RandomState(1)
        s, dk, bsz = 12, 4, 3
        q = jnp.asarray(rs.randn(bsz, s, dk).astype(np.float32))
        krel = jnp.asarray(rs.randn(dk, s).astype(np.float32))
        causal = jnp.asarray(np.triu(np.full((s, s), -np.inf, np.float32), 1))

        def logits_shift(krelpos, qq):
            qp = jnp.einsum('bik,kj->bij', qq, krelpos)
            z = jnp.zeros((bsz, s, 1), qp.dtype)
            qp = jnp.concatenate([z, qp], axis=2)
            qk = qp.reshape(bsz, s + 1, s)[:, 1:, :]
            return jax.nn.softmax(qk / math.sqrt(dk) + causal, axis=2)

        def logits_w2(krelpos, qq):
            offs = jnp.clip(jnp.arange(s)[:, None] - jnp.arange(s)[None, :],
                            0, s - 1)
            w2 = jnp.take(krelpos[:, ::-1], offs, axis=1)
            qk = jnp.einsum('brd,drc->brc', qq, w2)
            return jax.nn.softmax(qk / math.sqrt(dk) + causal, axis=2)

        np.testing.assert_allclose(np.asarray(logits_shift(krel, q)),
                                   np.asarray(logits_w2(krel, q)),
                                   atol=1e-6)
        g_shift = jax.grad(lambda kk, qq: (logits_shift(kk, qq) ** 2).sum(),
                           argnums=(0, 1))(krel, q)
        g_w2 = jax.grad(lambda kk, qq: (logits_w2(kk, qq) ** 2).sum(),
                        argnums=(0, 1))(krel, q)
        for a, b in zip(g_shift, g_w2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_cpc_model_features(self):
        """Encoder+GRU features match a torch pipeline end-to-end."""
        c = 16
        tenc = build_torch_encoder(c)
        tgru = torch.nn.GRU(c, c, batch_first=True)
        jmod = CPCModel(gEncoder=CPCEncoder(size_hidden=c),
                        gAR=CPCAR(dim_encoded=c, dim_output=c))
        x = np.random.RandomState(0).randn(2, 3200).astype(np.float32) * 0.2
        template = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x), None)
        sd = {f'gEncoder.{k}': v for k, v in tenc.state_dict().items()}
        sd.update({f'gAR.baseNet.{k}': v for k, v in tgru.state_dict().items()})
        params = convert(types.SimpleNamespace(state_dict=lambda: sd),
                         template['params'])
        cf, enc, _, _ = jmod.apply({'params': params}, jnp.asarray(x), None)
        with torch.no_grad():
            et = tenc(torch.from_numpy(x).unsqueeze(1)).permute(0, 2, 1)
            ct, _ = tgru(et)
        np.testing.assert_allclose(np.asarray(enc), et.numpy(), atol=TOL)
        np.testing.assert_allclose(np.asarray(cf), ct.numpy(), atol=TOL)
