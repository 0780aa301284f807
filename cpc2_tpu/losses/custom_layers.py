"""Equalized-learning-rate layers (reference `cpc/criterion/custom_layers.py`).

Weights are drawn from N(0, 1) and rescaled at *runtime* by He's constant
`sqrt(2 / fan_in) * lrMul`; biases start at zero. On TPU the runtime scale is
a free scalar fused into the matmul epilogue.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class NormalizationLayer(nn.Module):
    """x / rms(x) over axis 1 (reference `custom_layers.py:13-19`)."""

    @nn.compact
    def __call__(self, x: Array, epsilon: float = 1e-8) -> Array:
        return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1,
                                          keepdims=True) + epsilon)


def upscale2d(x: Array, factor: int = 2) -> Array:
    """Nearest-neighbor 2-D upscale of (B, C, H, W) by an integer factor
    (reference `custom_layers.py:22-30`). One XLA broadcast-reshape —
    no gather."""
    if not (isinstance(factor, int) and factor >= 1):
        raise AssertionError("factor must be a positive int")
    if factor == 1:
        return x
    return jnp.repeat(jnp.repeat(x, factor, axis=2), factor, axis=3)


# Reference-spelled alias (torch-style naming parity, like collapseLabelChain)
Upscale2d = upscale2d

class EqualizedLinear(nn.Module):
    """Linear with runtime He scaling (`custom_layers.py:134-151`).
    Torch layout: module.weight (out, in), module.bias (out,)."""
    features: int
    use_bias: bool = True
    equalized: bool = True
    lr_mul: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        init = (nn.initializers.normal(1.0) if self.equalized
                else nn.initializers.lecun_normal())
        weight = self.param('weight', init, (self.features, fan_in))
        y = jnp.einsum('...d,fd->...f', x, weight,
                       preferred_element_type=jnp.float32)
        if self.equalized:
            y = y * (math.sqrt(2.0 / fan_in) * self.lr_mul)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class EqualizedConv1d(nn.Module):
    """Conv1d with runtime He scaling (`custom_layers.py:81-105`).
    NWC input; torch layout weight (out, in, k)."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: Any = 0  # int (symmetric) or (left, right)
    use_bias: bool = True
    equalized: bool = True
    lr_mul: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size
        init = (nn.initializers.normal(1.0) if self.equalized
                else nn.initializers.lecun_normal())
        weight = self.param('weight', init,
                            (self.features, in_features, self.kernel_size))
        kernel = jnp.transpose(weight, (2, 1, 0))
        pad = (self.padding if isinstance(self.padding, tuple)
               else (self.padding, self.padding))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride,), padding=[pad],
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.float32)
        if self.equalized:
            y = y * (math.sqrt(2.0 / fan_in) * self.lr_mul)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,))
            y = y + bias
        return y
