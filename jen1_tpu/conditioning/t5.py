"""T5 text encoder in JAX/flax (FLAN-T5 family), from scratch.

The reference conditions on a frozen FLAN-T5-large encoder through HF
transformers (jen1/conditioners.py:61-111). transformers >= 4.50 has no Flax
models, and this framework's compute path is JAX — so the encoder is
implemented here natively and weights are imported from the HF torch
checkpoint via `convert_hf_t5_encoder` (works offline from a local path;
architecture parity is golden-tested against torch with random weights).

Supports both the original T5 ('relu' FFN) and v1.1/FLAN ('gated-gelu').
Encoder-only, inference-mode (no dropout): the reference always runs it
frozen in eval mode (conditioners.py:100).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from jen1_tpu.ops.conv import matmul_precision


@dataclasses.dataclass
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    num_heads: int = 16
    d_ff: int = 2816
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # 'relu' for original T5

    @classmethod
    def flan_t5_large(cls) -> "T5EncoderConfig":
        return cls()

    @classmethod
    def flan_t5_base(cls) -> "T5EncoderConfig":
        return cls(d_model=768, num_heads=12, d_ff=2048, num_layers=12)

    @classmethod
    def tiny_test(cls) -> "T5EncoderConfig":
        return cls(
            vocab_size=64, d_model=32, d_kv=8, num_heads=4, d_ff=48, num_layers=2
        )

    @classmethod
    def from_name(cls, name: str) -> "T5EncoderConfig":
        table = {
            "google/flan-t5-small": cls(d_model=512, d_kv=64, num_heads=6, d_ff=1024, num_layers=8),
            "google/flan-t5-base": cls.flan_t5_base(),
            "google/flan-t5-large": cls.flan_t5_large(),
            "google/flan-t5-xl": cls(d_model=2048, num_heads=32, d_ff=5120, num_layers=24),
            "t5-small": cls(d_model=512, d_kv=64, num_heads=8, d_ff=2048, num_layers=6, feed_forward_proj="relu"),
            "t5-base": cls(d_model=768, num_heads=12, d_ff=3072, num_layers=12, feed_forward_proj="relu"),
            "t5-large": cls(d_model=1024, num_heads=16, d_ff=4096, num_layers=24, feed_forward_proj="relu"),
        }
        if name not in table:
            raise KeyError(f"unknown T5 model name: {name}")
        return table[name]


T5_MODEL_DIMS = {
    "t5-small": 512,
    "t5-base": 768,
    "t5-large": 1024,
    "google/flan-t5-small": 512,
    "google/flan-t5-base": 768,
    "google/flan-t5-large": 1024,
    "google/flan-t5-xl": 2048,
}


class RMSNorm(nn.Module):
    """T5LayerNorm: no mean subtraction, no bias; fp32 statistics."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (y * weight.astype(jnp.float32)).astype(x.dtype)


def _relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing (static numpy)."""
    ret = np.zeros_like(relative_position)
    n = num_buckets // 2
    ret += (relative_position > 0).astype(np.int64) * n
    rp = np.abs(relative_position)
    max_exact = n // 2
    is_small = rp < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, n - 1)
    ret += np.where(is_small, rp, val_if_large)
    return ret


def relative_position_bias_index(
    q_len: int, k_len: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    return _relative_position_bucket(mem - ctx, num_buckets, max_distance)


class _Dense(nn.Module):
    """Bias-free projection (T5 uses no biases anywhere)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.normal(1.0), (x.shape[-1], self.features)
        )
        return jnp.dot(
            x,
            kernel.astype(x.dtype),
            precision=matmul_precision(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)


class T5SelfAttention(nn.Module):
    cfg: T5EncoderConfig
    has_relative_bias: bool

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, L, D)
        attention_mask: jnp.ndarray,  # (B, L) bool
        position_bias: Optional[jnp.ndarray],  # (1, H, L, L) or None
    ):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        b, l, _ = x.shape
        q = _Dense(inner, name="q")(x)
        k = _Dense(inner, name="k")(x)
        v = _Dense(inner, name="v")(x)

        def split_heads(a):
            return a.reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        if position_bias is None:
            if self.has_relative_bias:
                table = self.param(
                    "relative_attention_bias",
                    nn.initializers.normal(1.0),
                    (cfg.relative_attention_num_buckets, cfg.num_heads),
                )
                idx = relative_position_bias_index(
                    l,
                    l,
                    cfg.relative_attention_num_buckets,
                    cfg.relative_attention_max_distance,
                )
                position_bias = (
                    table[jnp.asarray(idx)].transpose(2, 0, 1)[None].astype(jnp.float32)
                )
            else:
                position_bias = jnp.zeros((1, cfg.num_heads, l, l), jnp.float32)

        # T5 does NOT scale q by 1/sqrt(d_kv).
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm",
            q,
            k,
            precision=matmul_precision(x.dtype),
            preferred_element_type=jnp.float32,
        )
        mask_bias = jnp.where(
            attention_mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min
        )
        scores = scores + position_bias + mask_bias
        probs = nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd",
            probs,
            v,
            precision=matmul_precision(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return _Dense(cfg.d_model, name="o")(out), position_bias


class T5FFN(nn.Module):
    cfg: T5EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.feed_forward_proj == "gated-gelu":
            gate = nn.gelu(_Dense(cfg.d_ff, name="wi_0")(x), approximate=True)
            h = gate * _Dense(cfg.d_ff, name="wi_1")(x)
        else:
            h = nn.relu(_Dense(cfg.d_ff, name="wi")(x))
        return _Dense(cfg.d_model, name="wo")(h)


class T5Block(nn.Module):
    cfg: T5EncoderConfig
    has_relative_bias: bool

    @nn.compact
    def __call__(self, x, attention_mask, position_bias):
        h = RMSNorm(eps=self.cfg.layer_norm_epsilon, name="ln_attn")(x)
        attn_out, position_bias = T5SelfAttention(
            self.cfg, self.has_relative_bias, name="attn"
        )(h, attention_mask, position_bias)
        x = x + attn_out
        h = RMSNorm(eps=self.cfg.layer_norm_epsilon, name="ln_ffn")(x)
        x = x + T5FFN(self.cfg, name="ffn")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    cfg: T5EncoderConfig

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray
    ) -> jnp.ndarray:
        """input_ids: (B, L) int32; attention_mask: (B, L) bool -> (B, L, D)."""
        embedding = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (self.cfg.vocab_size, self.cfg.d_model),
        )
        x = embedding[input_ids]
        position_bias = None
        for i in range(self.cfg.num_layers):
            x, position_bias = T5Block(
                self.cfg, has_relative_bias=(i == 0), name=f"block{i}"
            )(x, attention_mask, position_bias)
        return RMSNorm(eps=self.cfg.layer_norm_epsilon, name="final_ln")(x)


# ------------------------------------------------------------------ convert


def convert_hf_t5_encoder(state_dict: Dict[str, Any], cfg: T5EncoderConfig):
    """Map an HF torch `T5EncoderModel.state_dict()` to T5Encoder params.

    Accepts tensors or numpy arrays; key layout follows HF:
      shared.weight / encoder.block.{i}.layer.{0,1}....
    """

    def a(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return jnp.asarray(np.asarray(t, dtype=np.float32))

    def get(*names):
        for n in names:
            if n in state_dict:
                return state_dict[n]
        raise KeyError(f"none of {names} in state dict")

    params: Dict[str, Any] = {
        "embedding": a(get("shared.weight", "encoder.embed_tokens.weight"))
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        attn = {
            "q": {"kernel": a(get(f"{pre}.0.SelfAttention.q.weight")).T},
            "k": {"kernel": a(get(f"{pre}.0.SelfAttention.k.weight")).T},
            "v": {"kernel": a(get(f"{pre}.0.SelfAttention.v.weight")).T},
            "o": {"kernel": a(get(f"{pre}.0.SelfAttention.o.weight")).T},
        }
        if i == 0:
            attn["relative_attention_bias"] = a(
                get(f"{pre}.0.SelfAttention.relative_attention_bias.weight")
            )
        if cfg.feed_forward_proj == "gated-gelu":
            ffn = {
                "wi_0": {"kernel": a(get(f"{pre}.1.DenseReluDense.wi_0.weight")).T},
                "wi_1": {"kernel": a(get(f"{pre}.1.DenseReluDense.wi_1.weight")).T},
                "wo": {"kernel": a(get(f"{pre}.1.DenseReluDense.wo.weight")).T},
            }
        else:
            ffn = {
                "wi": {"kernel": a(get(f"{pre}.1.DenseReluDense.wi.weight")).T},
                "wo": {"kernel": a(get(f"{pre}.1.DenseReluDense.wo.weight")).T},
            }
        params[f"block{i}"] = {
            "ln_attn": {"weight": a(get(f"{pre}.0.layer_norm.weight"))},
            "attn": attn,
            "ln_ffn": {"weight": a(get(f"{pre}.1.layer_norm.weight"))},
            "ffn": ffn,
        }
    params["final_ln"] = {
        "weight": a(get("encoder.final_layer_norm.weight"))
    }
    return {"params": params}
