"""Slope-based timing of the DDIM sampler math (no model) on real TPU.

The axon tunnel adds a fixed ~tens-of-ms dispatch+fetch latency to every
measured wall (benchmarks/FLASH_ATTENTION_TPU.md), so single-program walls
overstate small costs. This script measures the SLOPE: wall(400 steps) -
wall(100 steps) / 300 = true per-step cost, for

  a) the current ddim_update math (in-loop schedule gathers + threefry);
  b) an optimized variant: per-step scalars (sqrt(alpha_next), c, sigma,
     last-step flag) precomputed as (S,) scan inputs, noise drawn with the
     SAME key impl but folded outside the model key split;
  c) variant (b) with rbg (hardware RNG) keys.

Also probes the fixed overhead directly with a trivial program.

Run: python benchmarks/b1_math_slope.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, L, C = 1, 4500, 128


def wall(fn, *args, n=5):
    s = jax.jit(lambda o: jnp.sum(jnp.asarray(o, jnp.float32)))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(s(fn(*args)))
        best = min(best, time.time() - t0)
    return best


def current_math(steps):
    acp = jnp.linspace(0.9999, 0.01, 1000)

    def run(rng_loop, audio0):
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

        times = np.linspace(-1, 999, num=steps + 1).astype(np.int32)[::-1]
        pairs = jnp.asarray(np.stack([times[:-1], times[1:]], axis=1))
        (audio, _), _ = jax.lax.scan(body, (audio0, 0), pairs)
        return audio

    return run


def opt_math(steps):
    # per-step scalars precomputed on host; scan consumes (S, 4) xs +
    # pre-split per-step keys, so the loop body is pure vector math
    acp_np = np.linspace(0.9999, 0.01, 1000)
    t_np = np.linspace(-1, 999, num=steps + 1).astype(np.int32)[::-1]
    al = acp_np[t_np[:-1]]
    al_next = acp_np[np.maximum(t_np[1:], 0)]
    sig = np.sqrt((1 - al / al_next) * (1 - al_next) / (1 - al))
    cc = np.sqrt(np.abs(1 - al_next - sig**2))
    last = (t_np[1:] < 0).astype(np.float32)
    xs_np = np.stack([np.sqrt(al_next), cc, sig, last], 1).astype(np.float32)

    def run(rng_loop, audio0):
        keys = jax.random.split(rng_loop, steps)

        def body(audio, inputs):
            k, row = inputs
            noise = jax.random.normal(k, audio.shape, jnp.float32)
            x_start = jnp.clip(audio * 0.99, -1, 1)
            pred_noise = audio * 0.5
            stepped = x_start * row[0] + row[1] * pred_noise + row[2] * noise
            audio = jnp.where(row[3] > 0, x_start, stepped)
            return audio, 0

        audio, _ = jax.lax.scan(body, audio0, (keys, jnp.asarray(xs_np)))
        return audio

    return run


def main():
    audio0 = jnp.zeros((B, L, C), jnp.float32)

    # fixed overhead probe
    tiny = jax.jit(lambda a: a * 2.0 + 1.0)
    small = jnp.zeros((128,), jnp.float32)
    print(f"trivial-program wall = {wall(tiny, small) * 1e3:.1f} ms "
          f"(fixed tunnel overhead)", flush=True)

    for name, maker, impl in [
        ("current/threefry", current_math, "threefry2x32"),
        ("opt/threefry", opt_math, "threefry2x32"),
        ("opt/rbg", opt_math, "rbg"),
    ]:
        key = jax.random.key(0, impl=impl)
        w100 = wall(jax.jit(maker(100)), key, audio0)
        w400 = wall(jax.jit(maker(400)), key, audio0)
        slope = (w400 - w100) / 300
        print(f"[{name}] wall100={w100 * 1e3:.1f}ms wall400={w400 * 1e3:.1f}ms"
              f" -> {slope * 1e6:.0f} us/step", flush=True)


if __name__ == "__main__":
    main()
