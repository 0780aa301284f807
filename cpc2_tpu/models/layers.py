"""Shared primitive layers.

Parameters are stored in torch's layouts and default-initialized like torch so
reference checkpoints convert by pure renaming and fresh trainings start from
the same distribution family as the reference.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def torch_linear_init(fan_in: int):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """Dense layer with torch layout: weight (out, in), bias (out,)."""
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        weight = self.param('weight',
                            self.kernel_init or torch_linear_init(fan_in),
                            (self.features, fan_in))
        # Params cast to the INPUT dtype (a no-op for f32): feeding a bf16
        # activation through therefore runs the whole layer in bf16 with
        # f32 accumulation — the lever behind --precision bf16.
        y = jnp.einsum('...d,fd->...f', x, weight.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            bias = self.param('bias', torch_linear_init(fan_in),
                              (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, torch parity (biased variance, eps 1e-5),
    param names weight/bias like torch."""
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # Statistics always in f32 (bf16 means/variances are too coarse);
        # output returns to the input dtype.
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        weight = self.param('weight', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return (y * weight + bias).astype(x.dtype)


class Dropout(nn.Module):
    """Dropout keyed on the 'dropout' rng collection; inverted scaling like
    torch. A no-op when `deterministic` or rate == 0."""
    rate: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng('dropout')
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
