"""Attribute the train step's fixed overhead (real TPU).

The v2 batch scan shows wall = ~0.09 s fixed + ~2.7 ms/batch-elem: the fixed
part dominates at the reference's batch 3 (MFU 0.009). This script times, at
one batch size, three nested pipelines as separate jitted programs:

  fwd      — the multi-task loss only (2 causal-grouped CFG forwards)
  fwd+bwd  — value_and_grad, reduced to the grad global-norm
  full     — the shipped train step (fwd+bwd + AdamW update, donated state)

fixed-overhead attribution = (fwd) vs (fwd+bwd - fwd) vs (full - fwd+bwd).
Honest timing: every wall is a host fetch of an output-dependent scalar.

Run: python benchmarks/train_step_ablation.py   [JEN1_TRAIN_ABL_B=3]
Appends results to benchmarks/TRAIN_STEP_TPU.md.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jen1_tpu.config import Config
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.train.trainer import UnifiedMultiTaskTrainer
    from jen1_tpu.utils.compile_cache import enable_compile_cache
    from benchmarks.train_step_bench import build_state

    enable_compile_cache()
    dev = jax.devices()[0]
    B = int(os.environ.get("JEN1_TRAIN_ABL_B", "3"))
    seconds, L = 10.0, 1500
    print(f"device: {dev.device_kind} B={B}", flush=True)

    cfg = Config()
    cfg.grad_accum_every = 1
    mc = cfg.model_config
    model = unet_from_model_config(mc)
    gdm = create_gaussian_diffusion(cfg.diffusion_config.gaussian_diffusion)
    trainer = UnifiedMultiTaskTrainer(cfg, model, gdm)

    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(
            rng.normal(size=(B, L, mc.in_channels)), jnp.float32
        ),
        "text_emb": jnp.asarray(
            rng.normal(size=(B, mc.context_embedding_max_length,
                             mc.context_embedding_features)), jnp.bfloat16
        ),
        "text_mask": jnp.ones((B, mc.context_embedding_max_length), bool),
    }
    state = build_state(trainer, model, mc, batch, B, L)
    flags = (False, False, True)  # one variant: both causal groups inside

    def loss_only(params, b, r):
        total, _ = trainer._multi_task_loss(
            params, b["latents"], b["text_emb"], b["text_mask"], r, flags
        )
        return total

    def grad_norm(params, b, r):
        import optax

        (total, _), grads = jax.value_and_grad(
            lambda p: trainer._multi_task_loss(
                p, b["latents"], b["text_emb"], b["text_mask"], r, flags
            ),
            has_aux=True,
        )(params)
        return total + optax.global_norm(grads)

    fwd = jax.jit(loss_only)
    fwdbwd = jax.jit(grad_norm)
    full = trainer._build_train_step(flags)

    results = {}

    def timeit(name, fn, *args, fetch):
        t0 = time.time()
        fetch(fn(*args))
        compile_s = time.time() - t0
        walls = []
        for i in range(4):
            a = list(args)
            a[-1] = jax.random.PRNGKey(10 + i)  # vary args: tunnel replay
            t0 = time.time()
            fetch(fn(*a))
            walls.append(time.time() - t0)
        results[name] = min(walls)
        print(f"{name}: best {min(walls):.4f}s (compile {compile_s:.0f}s, "
              f"all {['%.3f' % w for w in walls]})", flush=True)

    timeit("fwd", fwd, state.params, batch, jax.random.PRNGKey(1),
           fetch=lambda o: float(o))
    timeit("fwd+bwd", fwdbwd, state.params, batch, jax.random.PRNGKey(1),
           fetch=lambda o: float(o))
    # full step donates state: rebuild per call. Time via loss fetch.
    walls = []
    s = state
    t0 = time.time()
    s, m = full(s, batch, jax.random.PRNGKey(1))
    float(m["loss/train"])
    print(f"full: compile {time.time() - t0:.0f}s", flush=True)
    for i in range(4):
        t0 = time.time()
        s, m = full(s, batch, jax.random.PRNGKey(10 + i))
        float(m["loss/train"])
        walls.append(time.time() - t0)
    results["full"] = min(walls)
    print(f"full: best {min(walls):.4f}s (all {['%.3f' % w for w in walls]})",
          flush=True)

    f, fb, fu = results["fwd"], results["fwd+bwd"], results["full"]
    lines = [
        "",
        f"## Fixed-overhead attribution (B={B}, ablation)",
        "",
        "| pipeline | wall s | increment |",
        "|---|---|---|",
        f"| forward (2 grouped CFG forwards + losses) | {f:.4f} | — |",
        f"| + backward (grad global-norm) | {fb:.4f} | {fb - f:.4f} |",
        f"| + AdamW update (shipped step) | {fu:.4f} | {fu - fb:.4f} |",
        "",
        f"Attribution: forward {f / fu:.0%}, backward {(fb - f) / fu:.0%},"
        f" optimizer {(fu - fb) / fu:.0%} of the step wall.",
    ]
    out = os.path.join(os.path.dirname(__file__), "TRAIN_STEP_TPU.md")
    with open(out, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
