"""Normalization layers, channels-last, fp32 statistics.

GroupNorm statistics are always computed in float32 regardless of the compute
dtype (bf16) — normalization is the numerically fragile step on TPU, and XLA
fuses the dtype casts into the surrounding elementwise ops for free.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis of (B, L, C).

    Matches torch.nn.GroupNorm semantics (reference uses it on (B, C, L):
    jen1/model/blocks.py:117-121, 509): normalize over (L, channels-in-group).
    """

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, c = x.shape
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        dtype = x.dtype
        xf = x.astype(jnp.float32).reshape(b, l, g, c // g)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
        xf = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        xf = xf.reshape(b, l, c)
        y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, fp32 statistics (torch.nn.LayerNorm)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(dtype)
