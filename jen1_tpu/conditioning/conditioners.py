"""Conditioners: metadata -> (embedding [B, L, D], mask [B, L]).

TPU-native rebuild of jen1/conditioners.py. The reference's factory only ever
instantiates the *first* configured conditioner because it returns inside its
loop (utils/script_util.py:156-178, SURVEY §2.5 #4); `create_multi_conditioner`
here builds all of them.

Conditioner parameters are held on the object (not in the diffusion model's
optimizer state), matching the reference where the T5 projection and the
int/number embedders are never passed to the optimizer (train.py:56). They are
exposed via `.params` so a trainer may opt in to training them.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jen1_tpu.conditioning.t5 import (
    T5Encoder,
    T5EncoderConfig,
    convert_hf_t5_encoder,
)
from jen1_tpu.conditioning.tokenizer import ByteTokenizer, get_tokenizer
from jen1_tpu.ops.embeddings import NumberEmbedder
from jen1_tpu.ops.linear import Linear


class Conditioner:
    """Base: callable(list_of_values) -> (embedding, mask) as jnp arrays."""

    def __init__(self, dim: int, output_dim: int, cond_len: int):
        self.dim = dim
        self.output_dim = output_dim
        self.cond_len = cond_len

    def __call__(self, inputs: List[Any]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError


class T5Conditioner(Conditioner):
    """Frozen T5 text encoder + linear projection + mask-zeroing.

    Reference: jen1/conditioners.py:32-111 (tokenize pad-to-max_length,
    frozen eval-mode encoder, proj to output_dim, zero masked positions).

    `weights_path` points at a local HF torch checkpoint (state_dict .pt/.bin)
    for offline weight import; without it the encoder is deterministically
    random-initialized (architecture-true, hermetic — useful for tests and
    for environments without the pretrained weights).
    """

    def __init__(
        self,
        output_dim: int,
        t5_model_name: str = "t5-base",
        max_length: int = 128,
        enable_grad: bool = False,
        project_out: bool = False,
        weights_path: Optional[str] = None,
        seed: int = 0,
    ):
        if t5_model_name == "tiny-test":
            cfg = T5EncoderConfig.tiny_test()
        else:
            cfg = T5EncoderConfig.from_name(t5_model_name)
        super().__init__(cfg.d_model, output_dim, max_length)
        self.max_length = max_length
        self.enable_grad = enable_grad
        self.t5_model_name = t5_model_name
        self.tokenizer = (
            ByteTokenizer()
            if t5_model_name == "tiny-test"
            else get_tokenizer(t5_model_name)
        )
        if isinstance(self.tokenizer, ByteTokenizer):
            # Byte fallback needs a vocab at least as large as its id range.
            cfg.vocab_size = max(cfg.vocab_size, self.tokenizer.vocab_size)
        self.encoder_cfg = cfg
        self.encoder = T5Encoder(cfg)

        dummy_ids = jnp.zeros((1, max_length), jnp.int32)
        dummy_mask = jnp.ones((1, max_length), bool)
        if weights_path is not None:
            state_dict = _load_torch_state_dict(weights_path)
            enc_params = convert_hf_t5_encoder(state_dict, cfg)
        else:
            # jit(init): one compiled program (persisted in the compile
            # cache) instead of eager per-op dispatch — a T5-large eager
            # init is minutes of tiny executables through the tunnel.
            enc_params = jax.jit(self.encoder.init)(
                jax.random.PRNGKey(seed), dummy_ids, dummy_mask
            )

        self.use_proj = cfg.d_model != output_dim or project_out
        if self.use_proj:
            self.proj = Linear(output_dim)
            proj_params = jax.jit(self.proj.init)(
                jax.random.PRNGKey(seed + 1), jnp.zeros((1, cfg.d_model))
            )
        else:
            self.proj = None
            proj_params = {}
        self.params = {"encoder": enc_params, "proj": proj_params}

        def forward(params, ids, mask):
            emb = self.encoder.apply(params["encoder"], ids, mask)
            if self.use_proj:
                emb = self.proj.apply(params["proj"], emb)
            return emb * mask[..., None].astype(emb.dtype)

        self._forward = jax.jit(forward)

    def __call__(self, texts: List[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ids, mask = self.tokenizer(texts, self.max_length)
        emb = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return emb, jnp.asarray(mask)

    def embed_tokens(
        self, ids: jnp.ndarray, mask: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pure-jax path for pre-tokenized batches (usable inside jit)."""
        return self._forward(self.params, ids, mask), mask


class IntConditioner(Conditioner):
    """Learned embedding over a clamped int range (conditioners.py:114-132)."""

    def __init__(
        self, output_dim: int, min_val: int = 0, max_val: int = 512, seed: int = 0
    ):
        super().__init__(output_dim, output_dim, 1)
        self.min_val = int(min_val)
        self.max_val = int(max_val)
        n = self.max_val - self.min_val + 1
        self.params = {
            "embedding": jax.random.normal(
                jax.random.PRNGKey(seed), (n, output_dim), jnp.float32
            )
        }

    def __call__(self, ints: List[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        idx = jnp.clip(
            jnp.asarray(ints, jnp.int32), self.min_val, self.max_val
        ) - self.min_val
        emb = self.params["embedding"][idx][:, None, :]  # (B, 1, D)
        return emb, jnp.ones((emb.shape[0], 1), jnp.float32)


class NumberConditioner(Conditioner):
    """Fourier number embedder over a normalized range (conditioners.py:135-164)."""

    def __init__(
        self, output_dim: int, min_val: float = 0, max_val: float = 1, seed: int = 0
    ):
        super().__init__(output_dim, output_dim, 1)
        self.min_val = float(min_val)
        self.max_val = float(max_val)
        self.embedder = NumberEmbedder(features=output_dim)
        self.params = self.embedder.init(
            jax.random.PRNGKey(seed), jnp.zeros((1,), jnp.float32)
        )
        self._forward = jax.jit(self.embedder.apply)

    def __call__(self, floats: List[float]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.clip(
            jnp.asarray([float(v) for v in floats], jnp.float32),
            self.min_val,
            self.max_val,
        )
        x = (x - self.min_val) / (self.max_val - self.min_val)
        emb = self._forward(self.params, x)[:, None, :]
        return emb, jnp.ones((emb.shape[0], 1), jnp.float32)


class MultiConditioner:
    """Dispatch metadata dicts to conditioners by key (conditioners.py:167-208)."""

    def __init__(
        self,
        conditioners: Dict[str, Conditioner],
        default_keys: Optional[Dict[str, str]] = None,
        fill_values: Optional[Dict[str, Any]] = None,
    ):
        self.conditioners = conditioners
        self.default_keys = default_keys or {}
        # Fallback value per conditioner key when a metadata dict lacks it
        # (e.g. seconds_start=0 for prompt-only metadata). The reference
        # raises instead (conditioners.py:197) but its factory bug means only
        # 't5' is ever built, so the raise is unreachable there; here, where
        # all configured conditioners are real, missing optional keys must
        # degrade gracefully rather than crash prompt-only generate()/training.
        self.fill_values = fill_values or {}

    def __call__(
        self, batch_metadata: List[Dict[str, Any]]
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        output = {}
        for key, conditioner in self.conditioners.items():
            inputs = []
            for x in batch_metadata:
                condition_key = key
                if condition_key not in x and condition_key in self.default_keys:
                    condition_key = self.default_keys[condition_key]
                if condition_key in x:
                    value = x[condition_key]
                elif key in self.fill_values:
                    value = self.fill_values[key]
                else:
                    raise ValueError(
                        f"Conditioner key {condition_key} not found in metadata"
                        f" and no fill value configured"
                    )
                if isinstance(value, (list, tuple)) and len(value) == 1:
                    value = value[0]
                inputs.append(value)
            output[key] = conditioner(inputs)
        return output


def create_multi_conditioner(config) -> MultiConditioner:
    """Build all configured conditioners (fixes SURVEY §2.5 #4 where the
    reference returns after the first). config: jen1_tpu.config.ConditionerConfig.
    """
    conditioners: Dict[str, Conditioner] = {}
    fill_values: Dict[str, Any] = {}
    for ctype in config.conditioning_type:
        if ctype == "t5":
            c = config.t5_config
            conditioners[c.id] = T5Conditioner(
                output_dim=config.cond_dim,
                t5_model_name=c.t5_model_name,
                max_length=c.max_length,
                project_out=c.project_out,
                weights_path=c.weights_path,
            )
            # no fill for the prompt: silently conditioning on "" would mask
            # data bugs; int/number are optional extras (fill with min_val).
        elif ctype == "int":
            c = config.int_config
            conditioners[c.id] = IntConditioner(
                output_dim=config.cond_dim, min_val=c.min_val, max_val=c.max_val
            )
            fill_values[c.id] = c.min_val
        elif ctype == "number":
            c = config.number_config
            conditioners[c.id] = NumberConditioner(
                output_dim=config.cond_dim, min_val=c.min_val, max_val=c.max_val
            )
            fill_values[c.id] = c.min_val
        else:
            raise NotImplementedError(f"Invalid conditioner type: {ctype}")
    return MultiConditioner(
        conditioners, default_keys=config.default_keys, fill_values=fill_values
    )


def assemble_conditioning(
    cond: Dict[str, Any],
    *,
    cross_attn_cond_ids: Sequence[str] = ("prompt",),
    global_cond_ids: Sequence[str] = (),
    input_concat_ids: Sequence[str] = ("masked_input", "mask"),
) -> Dict[str, Any]:
    """Regroup conditioner outputs into the model's conditioning dict.

    Reference: trainer.py:249-278 / generation.py:152-192. Entries named in
    `input_concat_ids` are raw channels-last tensors (B, L, C) stored directly
    in `cond` (the reference stores masked_input/mask as raw tensors,
    trainer.py:107-108); everything else is a (emb, mask) tuple.
    """
    out = {
        "cross_attn_cond": None,
        "cross_attn_masks": None,
        "global_cond": None,
        "input_concat_cond": None,
    }
    if cross_attn_cond_ids:
        out["cross_attn_cond"] = jnp.concatenate(
            [cond[k][0] for k in cross_attn_cond_ids], axis=1
        )
        out["cross_attn_masks"] = jnp.concatenate(
            [cond[k][1] for k in cross_attn_cond_ids], axis=1
        )
    if global_cond_ids:
        g = jnp.concatenate([cond[k][0] for k in global_cond_ids], axis=-1)
        if g.ndim == 3:
            g = g.squeeze(1)
        out["global_cond"] = g
    if input_concat_ids:
        out["input_concat_cond"] = jnp.concatenate(
            [cond[k] for k in input_concat_ids], axis=-1
        )
    return out


def _load_torch_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj
