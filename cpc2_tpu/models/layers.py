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
        y = jnp.einsum('...d,fd->...f', x, weight,
                       preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param('bias', torch_linear_init(fan_in),
                              (self.features,))
            y = y + bias
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, torch parity (biased variance, eps 1e-5),
    param names weight/bias like torch."""
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        weight = self.param('weight', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return y * weight + bias


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
