"""Real-TPU benchmark of the full-size multi-task train step.

Flagship training configuration (reference defaults: batch 3 = one sub-batch
per task, 10 s latents (B, 1500, 128), bf16 compute, grad accum handled by
optax.MultiSteps): ONE jitted step = masks + conditioning assembly + 3 CFG
model forwards + grad + optimizer update, donated state.

Reports steps/s, audio-seconds-trained/s, and an MFU estimate from XLA's
cost analysis. Writes benchmarks/TRAIN_STEP_TPU.md.

Run: python benchmarks/train_step_bench.py  (optionally JEN1_TRAIN_BENCH_B=6)
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

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    cfg = Config()
    cfg.grad_accum_every = 1  # measure the real step, not accumulation no-ops
    B = int(os.environ.get("JEN1_TRAIN_BENCH_B", "3"))
    seconds = 10.0
    L = int(seconds * 150)
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

    t0 = time.time()
    # eval_shape + host normals instead of on-device init: the full-size init
    # graph is its own multi-minute compile (and eager init is thousands of
    # tunnel dispatches); step TIMING is independent of weight values, and
    # small random weights keep the loss/grads finite (zeros would NaN the
    # CFG std-rescale).
    from jen1_tpu.train.trainer import TrainState

    shapes = jax.eval_shape(
        lambda r: model.init(
            r, batch["latents"], jnp.zeros((B,), jnp.float32),
            embedding=batch["text_emb"], embedding_mask=batch["text_mask"],
            channels_list=[jnp.zeros((B, L, mc.in_channels + 1))],
            causal=False,
        ),
        jax.random.PRNGKey(0),
    )["params"]
    host = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            host.normal(0.0, 0.02, size=s.shape).astype(s.dtype)
        ),
        shapes,
    )
    state = TrainState(
        params=params,
        opt_state=trainer.optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_params=None,
    )
    jax.block_until_ready(state.params)
    n_params = sum(v.size for v in jax.tree.leaves(state.params))
    print(f"params={n_params:,} init={time.time() - t0:.1f}s", flush=True)

    host_rng = np.random.default_rng(0)
    step_rng = jax.random.PRNGKey(1)

    t0 = time.time()
    state, m = trainer.train_step(state, batch, step_rng, host_rng)
    jax.block_until_ready(m)
    print(f"compile+first step={time.time() - t0:.1f}s "
          f"loss={float(m['loss/train']):.4f}", flush=True)

    # time steps for BOTH compiled causal-flag variants via the real flow
    times = []
    for i in range(6):
        r = jax.random.fold_in(step_rng, i)
        t0 = time.time()
        state, m = trainer.train_step(state, batch, r, host_rng)
        jax.block_until_ready(m)
        times.append(time.time() - t0)
        print(f"step {i}: {times[-1]:.3f}s", flush=True)
    best = min(times[2:])  # skip possible second-variant compile
    steps_per_s = 1.0 / best
    audio_s_per_s = B * seconds / best

    peak = 197e12 if "v5" in dev.device_kind.lower() else 275e12
    mfu_note = "n/a"
    try:
        fn = trainer._step_cache[next(iter(trainer._step_cache))]
        cost = fn.lower(state, batch, step_rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        mfu_note = f"{flops:.3e} flops/step, mfu={flops / best / peak:.3f}"
    except Exception as e:  # noqa: BLE001
        mfu_note = f"unavailable ({type(e).__name__})"

    lines = [
        "# Full-size multi-task train step — real-TPU benchmark",
        "",
        f"Device: {dev.device_kind}; batch {B} (one sub-batch per task),"
        f" 10 s latents (B, {L}, {mc.in_channels}), bf16 compute, one jitted"
        " step (masks + 3 CFG forwards + grad + AdamW), donated state.",
        "",
        "| metric | value |",
        "|---|---|",
        f"| params | {n_params:,} |",
        f"| best step time | {best:.3f} s |",
        f"| steps/s | {steps_per_s:.2f} |",
        f"| audio-s trained / s / chip | {audio_s_per_s:.1f} |",
        f"| cost-analysis | {mfu_note} |",
        f"| all step times | {['%.3f' % t for t in times]} |",
    ]
    out = os.path.join(os.path.dirname(__file__), "TRAIN_STEP_TPU.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[4:]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
