"""B=1 sampler-loop breakdown on real TPU (VERDICT r2 item 2).

The fused 100-step-DDIM+decode program runs 0.158 s for a 30 s clip; the
sampler-only program is 0.149 s => 1.49 ms/step vs the 0.74 ms/step
weights-read floor. This script attributes the residual:

  1. one CFG-doubled denoiser forward: min-of-10 wall of a 25-application
     on-device chain / 25, plus XLA cost_analysis flops AND bytes accessed
     (the principled roofline: bytes/819GB/s, not just the weights term);
  2. the sampler math WITHOUT the model (fold_in+split+normal+DDIM update
     scanned 100x) under (a) threefry keys and (b) rbg keys — isolates the
     per-step RNG + update cost that rides on top of the forwards.

Run: python benchmarks/b1_breakdown.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def wall(fn, *args, n=3):
    """Honest min-of-n wall via output-dependent scalar fetch."""
    s = jax.jit(lambda o: jnp.sum(jnp.asarray(o, jnp.float32)))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(s(fn(*args)))
        best = min(best, time.time() - t0)
    return best


def main():
    from jen1_tpu.config import Config
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = Config()
    mc = cfg.model_config
    model = unet_from_model_config(mc)
    B, L, C = 1, 4500, mc.in_channels
    M, E = mc.context_embedding_max_length, mc.context_embedding_features

    x = jnp.zeros((B, L, C), jnp.bfloat16)
    t = jnp.zeros((B,), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, M, E), jnp.bfloat16)
    mask = jnp.ones((B, M), bool)
    concat = jnp.zeros((B, L, C + 1), jnp.bfloat16)

    shapes = jax.eval_shape(
        lambda r: model.init(r, x, t, embedding=emb, embedding_mask=mask,
                             channels_list=[concat], causal=False),
        jax.random.PRNGKey(0),
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    n_params = sum(v.size for v in jax.tree.leaves(params))
    print(f"params={n_params:,}", flush=True)

    def fwd(a):
        out = model.apply(
            params, a.astype(jnp.bfloat16), t, embedding=emb,
            embedding_mask=mask, channels_list=[concat], embedding_scale=0.8,
            batch_cfg=True, scale_cfg=True, causal=False,
        )
        return out.astype(jnp.float32)

    # --- 1. single CFG forward: chain timing + cost analysis ---------------
    REPS = 25

    @jax.jit
    def chain(a):
        def body(carry, _):
            return fwd(carry).astype(jnp.bfloat16) * 1e-3, 0
        out, _ = jax.lax.scan(body, a, None, length=REPS)
        return out

    lowered = jax.jit(fwd).lower(x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    print(f"fwd cost_analysis: flops={flops:.3e} bytes={bytes_acc:.3e} "
          f"(weights bf16 = {n_params * 2:.3e})", flush=True)
    t0 = time.time()
    jnp.sum(chain(x)).block_until_ready()
    print(f"chain compile+run = {time.time() - t0:.1f}s", flush=True)
    per_fwd = wall(chain, x) / REPS
    bw = 819e9
    print(f"per-forward wall = {per_fwd * 1e3:.3f} ms | "
          f"weights floor = {n_params * 2 / bw * 1e3:.3f} ms | "
          f"bytes floor = {bytes_acc / bw * 1e3:.3f} ms", flush=True)

    # --- 2. sampler math without the model ---------------------------------
    STEPS = 100

    def sampler_math(rng_loop, audio0):
        acp = jnp.linspace(0.9999, 0.01, 1000)

        def body(carry, inputs):
            audio, step = carry
            time_, time_next = inputs[0], inputs[1]
            step_rng = jax.random.fold_in(rng_loop, step)
            _rng_cfg, rng_noise = jax.random.split(step_rng)
            alpha = acp[time_]
            alpha_next = acp[jnp.maximum(time_next, 0)]
            sigma = jnp.sqrt(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.abs(1 - alpha_next - sigma**2))
            noise = jax.random.normal(rng_noise, audio.shape, jnp.float32)
            x_start = jnp.clip(audio * 0.99, -1, 1)
            pred_noise = audio * 0.5
            stepped = (x_start * jnp.sqrt(alpha_next) + c * pred_noise
                       + sigma * noise)
            audio = jnp.where(time_next < 0, x_start, stepped)
            return (audio, step + 1), 0

        times = np.linspace(-1, 999, num=STEPS + 1).astype(np.int32)[::-1]
        pairs = jnp.asarray(np.stack([times[:-1], times[1:]], axis=1))
        (audio, _), _ = jax.lax.scan(body, (audio0, 0), pairs)
        return audio

    audio0 = jnp.zeros((B, L, C), jnp.float32)
    jm = jax.jit(sampler_math)
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        t0 = time.time()
        jnp.sum(jm(key, audio0)).block_until_ready()
        print(f"[{impl}] sampler-math compile+run = {time.time() - t0:.1f}s",
              flush=True)
        w = wall(jm, key, audio0)
        print(f"[{impl}] sampler-math 100 steps = {w * 1e3:.1f} ms "
              f"({w / STEPS * 1e6:.0f} us/step)", flush=True)


if __name__ == "__main__":
    main()
