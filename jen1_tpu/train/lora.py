"""LoRA (low-rank adaptation) finetuning for the JEN-1 UNet.

Beyond-reference capability. The torch reference finetunes by loading a
full checkpoint and updating EVERY parameter (`is_finetuning` flag,
utils/config.py:89; shape-tolerant full restore, utils/script_util.py:125-148)
— 300M+ params of gradients, AdamW moments, and checkpoint per experiment.
LoRA (Hu et al. 2021, arXiv:2106.09685) instead trains rank-r factors on
the attention/FFN projections: the frozen base never receives gradients or
optimizer moments, and the trained artifact is a few-MB adapter that merges
into the base weights at ZERO inference cost (W_eff = W + (alpha/r)·A·B is
precomputed once at load).

TPU-first design decisions:
  * The adapter is a FLAT dict `{<param path>: {"a": (fan_in, r),
    "b": (r, fan_out)}}` — a plain pytree, so the existing TrainState /
    orbax checkpointing / fused AdamW / EMA machinery applies unchanged.
  * The frozen base is a jit ARGUMENT of the train step, never a closure
    capture: closure-captured weights lower into the XLA module as dense
    literal constants (0.7+ GB of StableHLO for this model — the round-4
    root cause of >12-min serve compiles, benchmarks/COMPILE_CACHE_TPU.md).
  * merge happens INSIDE the jitted step: XLA fuses the rank-r matmul +
    add into the step; at r=8-64 the delta math is noise next to one UNet
    forward, and gradients flow to (a, b) through the merged weight.
  * Conv kernels (k, c_in, c_out) factorize over (k·c_in, c_out) — the
    same flattening XLA's im2col lowering uses on the MXU.

Usage (CLI): python -m jen1_tpu.train.train --config cfg.json \
    --lora-rank 16 --lora-base-ckpt /ckpts/pretrained
Checkpoints written by the run hold ONLY the adapter; generate with
`Jen1(ckpt_path=<base>, lora_path=<run save_dir>)`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jen1_tpu.train.tasks import task_is_causal
from jen1_tpu.train.trainer import TrainState, UnifiedMultiTaskTrainer

# Attention (self + cross) projections and the transformer FFN — where LoRA
# is standard and where most finetuning capacity lives. Conv `project`
# kernels can be added via a custom pattern (they factorize too, see
# init_lora). Path components are joined with "." (orbax-safe: "/" is
# orbax's own storage separator).
DEFAULT_TARGETS = (
    r"(attention|cross_attention)\.(to_q|to_kv|to_out)\.kernel$"
    r"|feed_forward\.linear[12]\.kernel$"
)
_SEP = "."


def _path_str(path) -> str:
    return _SEP.join(
        str(getattr(k, "key", getattr(k, "name", k))) for k in path
    )


def lora_target_paths(params, pattern: str = DEFAULT_TARGETS) -> List[str]:
    """Paths (\".\"-joined) of the >=2-D kernels `pattern` selects, in
    deterministic tree-flatten order."""
    rx = re.compile(pattern)
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if np.ndim(leaf) >= 2 and rx.search(_path_str(path)):
            out.append(_path_str(path))
    return out


def init_lora(
    rng: jax.Array,
    params,
    rank: int,
    pattern: str = DEFAULT_TARGETS,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Adapter tree for `params`: per target kernel W (*lead, fan_out),
    a ~ N(0, 1/fan_in) of shape (prod(lead), r) and b = 0 of shape
    (r, fan_out) — so merge(params, adapter) == params at init (the
    standard LoRA warm start)."""
    assert rank >= 1, rank
    by_path = {
        _path_str(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    names = lora_target_paths(params, pattern)
    if not names:
        raise ValueError(
            f"LoRA pattern {pattern!r} matched no >=2-D kernels; "
            f"available kernels include "
            f"{[n for n in by_path if np.ndim(by_path[n]) >= 2][:8]}"
        )
    adapter: Dict[str, Dict[str, jnp.ndarray]] = {}
    for i, name in enumerate(names):
        shape = np.shape(by_path[name])
        fan_in = int(np.prod(shape[:-1]))
        fan_out = int(shape[-1])
        k = jax.random.fold_in(rng, i)
        adapter[name] = {
            "a": jax.random.normal(k, (fan_in, rank), jnp.float32)
            / np.sqrt(fan_in),
            "b": jnp.zeros((rank, fan_out), jnp.float32),
        }
    return adapter


def merge_lora(params, adapter: Dict[str, Dict[str, Any]], scale: float):
    """params with W + scale·reshape(a@b) on every adapted kernel. Pure jnp:
    differentiable wrt `adapter`, usable eagerly (checkpoint export) or
    inside a jitted step."""

    def fn(path, w):
        ab = adapter.get(_path_str(path))
        if ab is None:
            return w
        a = jnp.asarray(ab["a"], jnp.float32)
        b = jnp.asarray(ab["b"], jnp.float32)
        delta = (a @ b).reshape(w.shape) * scale
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    return jax.tree_util.tree_map_with_path(fn, params)


def adapter_rank(adapter: Dict[str, Dict[str, Any]]) -> int:
    first = next(iter(adapter.values()))
    return int(np.shape(first["a"])[-1])


def lora_param_count(adapter) -> int:
    return int(sum(np.prod(np.shape(x)) for x in jax.tree.leaves(adapter)))


def load_base_params(path: str, model_config, template):
    """Frozen base weights for finetuning: an orbax run directory (takes
    `params`; to adapt the EMA weights, export them as a params checkpoint
    first) or a reference .pth (ckpt/torch_import.py). Tree structure must
    match `template` (the model.init output) exactly — LoRA adapts a FIXED
    architecture; use CheckpointManager.restore_partial for shape-changing
    finetunes."""
    if str(path).endswith((".pth", ".pt", ".bin")):
        from jen1_tpu.ckpt.torch_import import load_reference_checkpoint

        loaded = load_reference_checkpoint(path, model_config)[0]["params"]
    else:
        from jen1_tpu.ckpt.checkpoint import CheckpointManager

        restored = CheckpointManager(path).restore()
        assert restored is not None, f"no checkpoint found in {path}"
        state, _ = restored
        loaded = state["params"] if "params" in state else state
    want = {
        _path_str(p): np.shape(leaf)
        for p, leaf in jax.tree_util.tree_flatten_with_path(template)[0]
    }
    got = {
        _path_str(p): np.shape(leaf)
        for p, leaf in jax.tree_util.tree_flatten_with_path(loaded)[0]
    }
    if want != got:
        missing = sorted(set(want) - set(got))[:5]
        extra = sorted(set(got) - set(want))[:5]
        mismatch = sorted(
            k for k in set(want) & set(got) if want[k] != got[k]
        )[:5]
        raise ValueError(
            f"base checkpoint {path} does not match the model: "
            f"missing={missing} extra={extra} shape-mismatch={mismatch}"
        )
    # dtype/placement follow the template leaf (mesh shardings included)
    return jax.tree.map(
        lambda t, l: jax.device_put(
            jnp.asarray(l, dtype=t.dtype), t.sharding
        ),
        template,
        loaded,
    )


class LoRATrainer(UnifiedMultiTaskTrainer):
    """UnifiedMultiTaskTrainer with LoRA-adapter training: TrainState.params
    IS the adapter (so checkpointing/EMA/resume work unchanged and save only
    megabytes), the frozen base rides as a jit argument, and every loss is
    computed through merge_lora(base, adapter). Built by
    train.build_trainer when config.lora_config.rank > 0."""

    def __init__(self, config, model, diffusion, **kw):
        super().__init__(config, model, diffusion, **kw)
        lc = config.lora_config
        assert lc.rank > 0, "LoRATrainer needs config.lora_config.rank >= 1"
        self.rank = int(lc.rank)
        self.scale = float(lc.alpha) / self.rank
        self.pattern = lc.targets or DEFAULT_TARGETS
        self.base_params = None  # set by init_state

    # ------------------------------------------------------------- state

    def init_state(self, rng: jax.Array, sample_batch) -> TrainState:
        base = self._init_full_params(rng, sample_batch)
        lc = self.config.lora_config
        if lc.base_ckpt:
            base = load_base_params(
                lc.base_ckpt, self.config.model_config, base
            )
        self.base_params = base
        adapter = init_lora(
            jax.random.fold_in(rng, 0x10AA), base, self.rank, self.pattern
        )
        if self.mesh is not None:
            from jen1_tpu.parallel.mesh import replicated

            rep = replicated(self.mesh)
            adapter = jax.tree.map(
                lambda x: jax.device_put(x, rep), adapter
            )
        return self._state_from_params(adapter)

    def merged_params(self, state: TrainState, use_ema: bool = False):
        """Full-model params with the (optionally EMA) adapter folded in —
        save these as a standard checkpoint for zero-cost inference, or use
        Jen1(ckpt_path=<base>, lora_path=<adapter ckpt>) to merge at load."""
        assert self.base_params is not None, "call init_state first"
        adapter = state.ema_params if use_ema else state.params
        assert adapter is not None
        return merge_lora(self.base_params, adapter, self.scale)

    # -------------------------------------------------------------- steps

    def _build_train_step(self, causal_flags: Tuple[bool, ...], state=None):
        def step_fn(state: TrainState, base_params, batch, rng):
            def loss_fn(adapter):
                merged = merge_lora(base_params, adapter, self.scale)
                return self._multi_task_loss(
                    merged,
                    batch["latents"],
                    batch["text_emb"],
                    batch["text_mask"],
                    rng,
                    causal_flags,
                )

            (total, per_task), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            params, opt_state, grad_norm = self._apply_optimizer(grads, state)
            ema = state.ema_params
            if ema is not None:
                d = self.ema_decay
                ema = jax.tree.map(
                    lambda e, p: e * d + p * (1 - d), ema, params
                )
            metrics = {
                "loss/train": total,
                "grad_norm": grad_norm,
                **{f"loss_{k}/train": v for k, v in per_task.items()},
            }
            return (
                TrainState(
                    params=params,
                    opt_state=opt_state,
                    step=state.step + 1,
                    ema_params=ema,
                ),
                metrics,
            )

        return jax.jit(
            step_fn, donate_argnums=(0,),
            out_shardings=self._pin_out_shardings(state),
            compiler_options=self._compiler_options,
        )

    def train_step(self, state: TrainState, batch, rng: jax.Array, host_rng):
        self._reject_tp_fsdp_sp_triple(batch)
        flags = self._causal_flags(host_rng)
        if flags not in self._step_cache:
            self._step_cache[flags] = self._build_train_step(flags, state)
        return self._step_cache[flags](state, self.base_params, batch, rng)

    def _build_eval_step(self, causal_flags: Tuple[bool, ...]):
        def eval_fn(state: TrainState, base_params, batch, rng):
            merged = merge_lora(base_params, state.params, self.scale)
            total, per_task = self._multi_task_loss(
                merged,
                batch["latents"],
                batch["text_emb"],
                batch["text_mask"],
                rng,
                causal_flags,
            )
            return {
                "loss/val": total,
                **{f"loss_{k}/val": v for k, v in per_task.items()},
            }

        return jax.jit(eval_fn, compiler_options=self._compiler_options)

    def eval_step(
        self,
        state: TrainState,
        batch,
        rng: jax.Array,
        text_guided_causal: bool = False,
    ):
        flags = tuple(
            task_is_causal(t, text_guided_causal) for t in self.tasks
        )
        if flags not in self._eval_cache:
            self._eval_cache[flags] = self._build_eval_step(flags)
        return self._eval_cache[flags](
            state, self.base_params, batch, rng
        )
