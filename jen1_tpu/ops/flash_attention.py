"""Pallas flash attention (TPU) — blockwise online-softmax attention.

Placeholder delegating to the XLA path; replaced by the Pallas kernel in this
round (kept importable so the dispatch in ops/attention.py stays stable).
"""

from __future__ import annotations

import jax.numpy as jnp

from jen1_tpu.ops import attention as _attn


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, causal: bool = False
) -> jnp.ndarray:
    return _attn.dot_product_attention(q, k, v, causal=causal)
