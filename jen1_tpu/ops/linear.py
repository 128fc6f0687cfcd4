"""Mixed-precision Linear: fp32 master params, compute in the input dtype.

The bf16 policy lives here instead of in a global flax dtype attribute: the
kernel is stored fp32 (optimizer-stable) and cast to the activation dtype at
use, with fp32 MXU accumulation via preferred_element_type.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from jen1_tpu.ops.conv import matmul_precision
from jen1_tpu.ops.initializers import dense_kernel_init, torch_bias_init


class Linear(nn.Module):
    """torch.nn.Linear semantics + init, channels-last matmul on the MXU."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", dense_kernel_init, (in_features, self.features)
        )
        y = jnp.dot(
            x,
            kernel.astype(x.dtype),
            precision=matmul_precision(x.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features), (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)
