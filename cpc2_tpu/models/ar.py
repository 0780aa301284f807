"""Autoregressive context networks (reference `cpc/model.py:158-271`).

TPU-first design notes
----------------------
* The recurrence is a `lax.scan` over encoded frames with an explicit carry.
  The input-to-hidden projection for **all** timesteps is hoisted out of the
  scan into one large MXU matmul `(B*T, D) @ (D, G*H)`; only the
  hidden-to-hidden matmul remains sequential. This is the standard way to keep
  an RNN from starving the MXU.
* `keepHidden` (reference `cpc/model.py:196-201`, used for `sequential`
  sampling and whole-file streaming inference) becomes an explicit carry: the
  module always *returns* its final hidden state and accepts an optional
  initial one; the training/inference loop threads it. No module mutation, so
  the whole step stays jit-compatible.

Behaviour parity notes
----------------------
* Cell math matches torch exactly, including gate ordering
  (GRU: r,z,n — LSTM: i,f,g,o) and GRU's bias placement
  `n = tanh(i_n + r * (W_hn h + b_hn))`, so converted reference checkpoints
  produce bit-matched features (up to fp tolerance).
* Parameters are stored in torch's layout/names (`weight_ih_l0: (G*H, D)`,
  ...), making checkpoint conversion a pure rename.
* `reverse` mode flips time before and after the net (`cpc/model.py:190-206`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _torch_rnn_init(hidden: int):
    bound = 1.0 / math.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _gru_scan(gi: Array, h0: Array, w_hh: Array, b_hh: Array) -> Tuple[Array, Array]:
    """gi: (B, T, 3H) precomputed input gates; h0: (B, H).
    Returns (ys: (B, T, H), h_last)."""
    hdim = h0.shape[-1]

    def step(h, gi_t):
        gh = jnp.dot(h, w_hh.T, preferred_element_type=jnp.float32) + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, jnp.swapaxes(gi, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last


def _lstm_scan(gi: Array, h0: Array, c0: Array, w_hh: Array,
               b_hh: Array) -> Tuple[Array, Array, Array]:
    def step(carry, gi_t):
        h, c = carry
        gh = jnp.dot(h, w_hh.T, preferred_element_type=jnp.float32) + b_hh
        gates = gi_t + gh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(gi, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last, c_last


def _rnn_scan(gi: Array, h0: Array, w_hh: Array, b_hh: Array) -> Tuple[Array, Array]:
    def step(h, gi_t):
        gh = jnp.dot(h, w_hh.T, preferred_element_type=jnp.float32) + b_hh
        h_new = jnp.tanh(gi_t + gh)
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, jnp.swapaxes(gi, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last


_N_GATES = {"GRU": 3, "LSTM": 4, "RNN": 1}


class _StackedRNN(nn.Module):
    """Multi-layer uni-directional torch-compatible RNN stack."""
    dim_input: int
    dim_hidden: int
    num_layers: int = 1
    mode: str = "GRU"
    param_prefix: str = ""  # e.g. '' -> weight_ih_l0; 'reverse' handled by caller
    suffix: str = ""        # '_reverse' for torch bidirectional layers

    @nn.compact
    def __call__(self, x: Array, hidden=None):
        gates = _N_GATES[self.mode]
        h = self.dim_hidden
        init = _torch_rnn_init(h)
        batch = x.shape[0]

        if hidden is None:
            h0s = jnp.zeros((self.num_layers, batch, h), jnp.float32)
            c0s = jnp.zeros((self.num_layers, batch, h), jnp.float32)
        elif self.mode == "LSTM":
            h0s, c0s = hidden
        else:
            h0s, c0s = hidden, None

        out = x
        h_lasts, c_lasts = [], []
        for layer in range(self.num_layers):
            d_in = self.dim_input if layer == 0 else h
            w_ih = self.param(f'weight_ih_l{layer}{self.suffix}', init,
                              (gates * h, d_in))
            w_hh = self.param(f'weight_hh_l{layer}{self.suffix}', init,
                              (gates * h, h))
            b_ih = self.param(f'bias_ih_l{layer}{self.suffix}', init,
                              (gates * h,))
            b_hh = self.param(f'bias_hh_l{layer}{self.suffix}', init,
                              (gates * h,))
            # One big MXU matmul for every timestep's input projection.
            gi = jnp.einsum('btd,gd->btg', out, w_ih,
                            preferred_element_type=jnp.float32) + b_ih
            if self.mode == "GRU":
                out, h_last = _gru_scan(gi, h0s[layer], w_hh, b_hh)
            elif self.mode == "LSTM":
                from ..ops.lstm_pallas import (fused_lstm, use_fused_lstm,
                                               _interpret)
                if (gi.dtype == jnp.float32 and w_hh.dtype == jnp.float32
                        and use_fused_lstm(batch, gi.shape[1], h)):
                    # Fused Pallas recurrence (default on TPU;
                    # CPC2_FUSED_LSTM=0 opts out): h/c carried in VMEM
                    # scratch across time chunks, W_hh resident, no
                    # (T, B, ·) swapaxes copies. Identical math to the
                    # scan (`ops/lstm_pallas.py`).
                    out, h_last, c_last = fused_lstm(
                        gi, h0s[layer], c0s[layer], w_hh, b_hh,
                        _interpret())
                else:
                    out, h_last, c_last = _lstm_scan(
                        gi, h0s[layer], c0s[layer], w_hh, b_hh)
                c_lasts.append(c_last)
            else:
                out, h_last = _rnn_scan(gi, h0s[layer], w_hh, b_hh)
            h_lasts.append(h_last)

        new_hidden = jnp.stack(h_lasts)
        if self.mode == "LSTM":
            new_hidden = (new_hidden, jnp.stack(c_lasts))
        return out, new_hidden


class CPCAR(nn.Module):
    """GRU/LSTM/RNN context network (reference `cpc/model.py:158-207`).

    `__call__(x, hidden)` returns `(context, new_hidden)`; the caller decides
    whether to thread `new_hidden` into the next batch (the reference's
    `keepHidden=True` behaviour, with the detach implicit since the carry
    crosses a jit boundary).
    """
    dim_encoded: int
    dim_output: int
    keep_hidden: bool = False
    n_levels: int = 1
    mode: str = "GRU"
    reverse: bool = False

    @property
    def dim_out(self) -> int:
        return self.dim_output

    @nn.compact
    def __call__(self, x: Array, hidden=None, train: bool = True):
        if self.reverse:
            x = jnp.flip(x, axis=1)
        net = _StackedRNN(self.dim_encoded, self.dim_output,
                          self.n_levels, self.mode, name='baseNet')
        y, new_hidden = net(x, hidden)
        if self.reverse:
            y = jnp.flip(y, axis=1)
        return y, new_hidden


class NoAr(nn.Module):
    """Identity AR (reference `cpc/model.py:210-216`)."""
    dim_encoded: int = 0
    dim_output: int = 0

    @nn.compact
    def __call__(self, x: Array, hidden=None, train: bool = True):
        return x, None


class BiDIRARTangled(nn.Module):
    """Single bidirectional GRU for BERT-style training (reference
    `cpc/model.py:219-242`). Output dim = dim_output (dim_output//2 per
    direction), torch param names with `_reverse` suffix for the backward
    direction."""
    dim_encoded: int
    dim_output: int
    n_levels: int = 1

    @nn.compact
    def __call__(self, x: Array, hidden=None, train: bool = True):
        half = self.dim_output // 2
        fwd = _StackedRNN(self.dim_encoded, half, self.n_levels, "GRU",
                          name='ARNet')
        bwd = _StackedRNN(self.dim_encoded, half, self.n_levels, "GRU",
                          suffix='_reverse', name='ARNet_bwd')
        yf, _ = fwd(x, None)
        yb, _ = bwd(jnp.flip(x, axis=1), None)
        return jnp.concatenate([yf, jnp.flip(yb, axis=1)], axis=2), None


class BiDIRAR(nn.Module):
    """Two separate GRUs, concatenated (reference `cpc/model.py:245-271`)."""
    dim_encoded: int
    dim_output: int
    n_levels: int = 1

    @nn.compact
    def __call__(self, x: Array, hidden=None, train: bool = True):
        half = self.dim_output // 2
        fwd = _StackedRNN(self.dim_encoded, half, self.n_levels, "GRU",
                          name='netForward')
        bwd = _StackedRNN(self.dim_encoded, half, self.n_levels, "GRU",
                          name='netBackward')
        yf, _ = fwd(x, None)
        yb, _ = bwd(jnp.flip(x, axis=1), None)
        return jnp.concatenate([yf, jnp.flip(yb, axis=1)], axis=2), None
