"""Time / positional / number embeddings.

TPU-native equivalents of reference utils/module.py:20-101.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from jen1_tpu.ops.linear import Linear


def rand_bool(key: jax.Array, shape, proba: float) -> jnp.ndarray:
    """Bernoulli mask (reference: utils/module.py:36-42), as a jax op."""
    if proba == 1.0:
        return jnp.ones(shape, dtype=bool)
    if proba == 0.0:
        return jnp.zeros(shape, dtype=bool)
    return jax.random.bernoulli(key, proba, shape)


class SinusoidalEmbedding(nn.Module):
    """Reference: utils/module.py:45-55."""

    dim: int

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = x.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class LearnedPositionalEmbedding(nn.Module):
    """Continuous-time random-Fourier embedding (reference: utils/module.py:58-72).

    Output: [x, sin(2*pi*x*w), cos(2*pi*x*w)] with learned frequencies w.
    """

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.dim % 2 == 0
        half_dim = self.dim // 2
        weights = self.param("weights", nn.initializers.normal(1.0), (half_dim,))
        xf = x.astype(jnp.float32)[:, None]  # (B, 1)
        freqs = xf * weights.astype(jnp.float32)[None, :] * (2 * math.pi)
        fouriered = jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        return jnp.concatenate([xf, fouriered], axis=-1)  # (B, dim + 1)


class TimePositionalEmbedding(nn.Module):
    """LearnedPositionalEmbedding + Linear (reference: utils/module.py:75-79)."""

    dim: int
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = LearnedPositionalEmbedding(dim=self.dim, name="pos")(x)
        return Linear(self.out_features, name="linear")(h)


class FixedEmbedding(nn.Module):
    """Learned null-context table used as the CFG unconditional embedding.

    Content-independent: returns the positional embedding table broadcast over
    the batch (reference: utils/module.py:20-33).
    """

    max_length: int
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, length = x.shape[0], x.shape[1]
        assert length <= self.max_length, "input length exceeds max_length"
        table = self.param(
            "embedding", nn.initializers.normal(1.0), (self.max_length, self.features)
        )
        emb = table[:length].astype(x.dtype)
        return jnp.broadcast_to(emb[None], (b, length, self.features))


class NumberEmbedder(nn.Module):
    """Float list -> Fourier embeddings (reference: utils/module.py:82-101)."""

    features: int
    dim: int = 256

    @nn.compact
    def __call__(self, x: Any) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=jnp.float32)
        shape = x.shape
        flat = x.reshape(-1)
        emb = TimePositionalEmbedding(
            dim=self.dim, out_features=self.features, name="embedding"
        )(flat)
        return emb.reshape(*shape, self.features)
