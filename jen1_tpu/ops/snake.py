"""Snake activation: x + sin^2(a*x)/a (periodic inductive bias for audio).

TPU-native equivalent of dac.nn.layers.Snake1d (reference imports it at
jen1/model/blocks.py:5; enabled by ModelConfig.use_snake). Channels-last.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def snake(x: jnp.ndarray, alpha: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    a = alpha.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    y = xf + jnp.reciprocal(a + eps) * jnp.square(jnp.sin(a * xf))
    return y.astype(x.dtype)


class Snake1d(nn.Module):
    """Per-channel learned frequency, initialized at 1 (as in DAC)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.ones, (c,))
        return snake(x, alpha)
