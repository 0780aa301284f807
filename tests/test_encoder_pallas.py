"""Fused polyphase encoder kernel (`ops/encoder_pallas.py`) — interpret
mode, CPU.

The comparison target mirrors the TPU XLA path's rounding: conv operands
are rounded to bf16 on BOTH sides of every dot, forward and backward
(XLA's default matmul precision on TPU lowers f32 convs to single-pass
bf16, including the dgrad/wgrad dots). NB: interpret-mode Pallas runs
under XLA CPU with `--xla_allow_excess_precision` (default on), which
elides value-level f32->bf16->f32 roundtrips, so the structural math is
checked at f32 precision while bf16 effects are exercised through the
kernel's bf16 SCRATCH storage (real arrays, really rounded). dconv_w/dx
carry a looser tolerance: values that land near a bf16 rounding boundary
can round differently after fp-reordering upstream, which is rounding
chatter, not structure. The on-chip whole-step A/B (losses matching to
~1e-3 after 20 optimizer steps) is recorded in docs/performance.md.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from cpc2_tpu.ops.encoder_pallas import CONV_STACK, fused_encoder  # noqa: E402

EPS = 1e-5


def _dot_bf16_pair():
    """dot with bf16-rounded operands in fwd AND bwd (mirrors both the
    kernel and the TPU XLA path)."""
    import functools

    @functools.partial(jax.custom_vjp)
    def dot_bf16(a, b):
        return lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def fwd(a, b):
        return dot_bf16(a, b), (a, b)

    def bwd(res, g):
        a, b = res
        gb = g.astype(jnp.bfloat16)
        da = lax.dot_general(
            gb, b.astype(jnp.bfloat16), (((g.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(a.dtype)
        a2 = a.reshape(-1, a.shape[-1]).astype(jnp.bfloat16)
        g2 = gb.reshape(-1, g.shape[-1])
        db = lax.dot_general(
            a2, g2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(b.dtype)
        return da, db

    dot_bf16.defvjp(fwd, bwd)
    return dot_bf16


_DOT = _dot_bf16_pair()


def ref_encoder(x, conv_w, conv_b, norm_w, norm_b):
    """Straight-line reference: patches + bf16-rounded dots + ChannelNorm
    (unbiased var) + ReLU, per models/encoder.py."""
    h = x[..., None]
    for l, (k, s, p) in enumerate(CONV_STACK):
        c = conv_w[l].shape[0]
        cin = h.shape[-1]
        hp = jnp.pad(h, ((0, 0), (p, p), (0, 0)))
        tout = (hp.shape[1] - k) // s + 1
        idx = np.arange(tout)[:, None] * s + np.arange(k)[None, :]
        patches = hp[:, idx, :].reshape(h.shape[0], tout, k * cin)
        wmat = jnp.transpose(conv_w[l], (2, 1, 0)).reshape(k * cin, c)
        y = _DOT(patches, wmat) + conv_b[l]
        m = jnp.mean(y, -1, keepdims=True)
        var = jnp.sum((y - m) ** 2, -1, keepdims=True) / (c - 1)
        xh = (y - m) * lax.rsqrt(var + EPS)
        h = jnp.maximum(xh * norm_w[l] + norm_b[l], 0.0)
    return h


def make_params(key, c):
    ks = jax.random.split(key, 20)
    conv_w, conv_b, norm_w, norm_b = [], [], [], []
    cin = 1
    for l, (k, s, p) in enumerate(CONV_STACK):
        conv_w.append(jax.random.normal(ks[4 * l], (c, cin, k)) * 0.2)
        conv_b.append(jax.random.normal(ks[4 * l + 1], (c,)) * 0.1)
        norm_w.append(1.0 + 0.2 * jax.random.normal(ks[4 * l + 2], (c,)))
        norm_b.append(0.1 * jax.random.normal(ks[4 * l + 3], (c,)))
        cin = c
    return tuple(conv_w), tuple(conv_b), tuple(norm_w), tuple(norm_b)


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))


@pytest.mark.parametrize("n,f,c", [(2, 3, 256), (1, 2, 128)])
def test_forward_and_grads_match_reference(n, f, c):
    key = jax.random.PRNGKey(f * 7 + c)
    cw, cb, nw, nb = make_params(key, c)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 160 * f))

    ref = ref_encoder(x, cw, cb, nw, nb)
    got = fused_encoder(x, cw, cb, nw, nb, True)
    assert got.shape == (n, f, c)
    assert _rel(ref, got) < 2e-5

    cot = jax.random.normal(jax.random.PRNGKey(2), ref.shape)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * cot)

    gr = jax.grad(loss(ref_encoder), argnums=(0, 1, 2, 3, 4))(
        x, cw, cb, nw, nb)
    gg = jax.grad(loss(lambda *a: fused_encoder(*a, True)),
                  argnums=(0, 1, 2, 3, 4))(x, cw, cb, nw, nb)
    tols = {'dx': 2e-3, 'dconv_w': 2e-3, 'dconv_b': 1e-5,
            'dnorm_w': 1e-5, 'dnorm_b': 1e-5}
    for name, a, b in zip(tols, gr, gg):
        fa = jnp.concatenate([jnp.ravel(t)
                              for t in jax.tree_util.tree_leaves(a)])
        fb = jnp.concatenate([jnp.ravel(t)
                              for t in jax.tree_util.tree_leaves(b)])
        err = float(jnp.max(jnp.abs(fa - fb))
                    / (jnp.max(jnp.abs(fa)) + 1e-9))
        assert err < tols[name], (name, err)


def test_module_wiring_identical_tree_and_output():
    """CPCEncoder routes through the kernel under the interpret env var
    with an UNCHANGED param tree; outputs match the plain module."""
    from cpc2_tpu.models.encoder import CPCEncoder
    enc = CPCEncoder(size_hidden=256)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 160 * 2))
    v = enc.init(jax.random.PRNGKey(1), x)
    y_plain = enc.apply(v, x)
    old = os.environ.get('CPC2_FUSED_ENCODER_INTERPRET')
    os.environ['CPC2_FUSED_ENCODER_INTERPRET'] = '1'
    try:
        y_fused = enc.apply(v, x)
        v2 = enc.init(jax.random.PRNGKey(1), x)
    finally:
        if old is None:
            del os.environ['CPC2_FUSED_ENCODER_INTERPRET']
        else:
            os.environ['CPC2_FUSED_ENCODER_INTERPRET'] = old
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: jnp.array_equal(a, b), v, v2))
    assert _rel(y_plain, y_fused) < 2e-2  # bf16-level agreement


def test_gate_defaults_off():
    from cpc2_tpu.ops.encoder_pallas import use_fused_encoder
    old = os.environ.pop('CPC2_FUSED_ENCODER', None)
    old_i = os.environ.pop('CPC2_FUSED_ENCODER_INTERPRET', None)
    try:
        assert not use_fused_encoder(8, 20480, 256)
    finally:
        if old is not None:
            os.environ['CPC2_FUSED_ENCODER'] = old
        if old_i is not None:
            os.environ['CPC2_FUSED_ENCODER_INTERPRET'] = old_i
