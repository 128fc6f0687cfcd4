"""Attention, TPU-native.

Replaces the reference's F.scaled_dot_product_attention / einsum path
(jen1/model/blocks.py:322-437) — the only native-kernel API the reference
touches (SURVEY §2.1). Two execution paths:

  * XLA path: batched einsum QK^T -> fp32 softmax -> PV. For the short
    sequences of this UNet (latent L<=~100 at attention levels) XLA's fusion
    is already near roofline.
  * Pallas path: a blockwise flash-attention kernel (ops/flash_attention.py)
    for long-form generation where L_q grows past ~512 and the O(L^2) scores
    matrix stops fitting in VMEM.

Masking semantics replicate the reference exactly:
  * cross-attention padding is handled by *zeroing* masked k/v rows
    (blocks.py:431-434) — equivalent to giving padded tokens a null (zero
    logit) key because T5 embeddings are pre-zeroed at masked positions
    (jen1/conditioners.py:109);
  * self-attention causality is a static flag -> lower-triangular mask.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from jen1_tpu.ops.conv import matmul_precision
from jen1_tpu.ops.linear import Linear
from jen1_tpu.ops.norm import LayerNorm


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
) -> jnp.ndarray:
    """q,k,v: (B, H, N|M, D). fp32 logits+softmax, output in q.dtype."""
    dtype = q.dtype
    d = q.shape[-1]
    scale = d**-0.5
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm",
        q,
        k,
        precision=matmul_precision(dtype),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale
    if causal:
        n, m = logits.shape[-2], logits.shape[-1]
        row = jnp.arange(n)[:, None]
        col = jnp.arange(m)[None, :]
        # allow j <= i + (m - n): standard causal alignment for n == m
        mask = col <= row + (m - n)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd",
        probs.astype(dtype),
        v,
        precision=matmul_precision(dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


class Attention(nn.Module):
    """Self- or cross-attention block (reference: blocks.py:383-437).

    Pre-LayerNorm on input and context, bias-free q/kv projections, masked-k/v
    zeroing for cross-attention padding, output projection with bias.
    """

    features: int
    head_features: int
    num_heads: int
    out_features: Optional[int] = None
    context_features: Optional[int] = None
    use_flash: bool = False
    flash_min_seq_len: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, C)
        context: Optional[jnp.ndarray] = None,  # (B, M, Cc)
        context_mask: Optional[jnp.ndarray] = None,  # (B, M) bool/0-1
        causal: bool = False,
    ) -> jnp.ndarray:
        mid = self.head_features * self.num_heads
        out_features = self.out_features or self.features

        is_cross = context is not None
        ctx = context if is_cross else x

        # The reference always applies a SEPARATE norm to the k/v input, even
        # for self-attention where context == x (blocks.py:400-401,427).
        x = LayerNorm(name="norm")(x)
        ctx = LayerNorm(name="norm_context")(ctx)

        q = Linear(mid, use_bias=False, name="to_q")(x)
        kv = Linear(2 * mid, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        if context_mask is not None:
            m = context_mask.astype(k.dtype)[..., None]  # (B, M, 1)
            k = k * m
            v = v * m

        b, n, _ = q.shape
        m_len = k.shape[1]
        q = q.reshape(b, n, self.num_heads, self.head_features).transpose(0, 2, 1, 3)
        k = k.reshape(b, m_len, self.num_heads, self.head_features).transpose(0, 2, 1, 3)
        v = v.reshape(b, m_len, self.num_heads, self.head_features).transpose(0, 2, 1, 3)

        if self.use_flash and n >= self.flash_min_seq_len and n == m_len:
            from jen1_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v, causal=causal)
        else:
            out = dot_product_attention(q, k, v, causal=causal)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, mid)
        return Linear(out_features, name="to_out")(out)
