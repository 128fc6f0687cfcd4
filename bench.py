"""Throughput benchmark: audio-seconds generated per wall-second per chip.

Flagship configuration, matching the reference inference defaults
(generation.py:76): 30 s clip -> Encodec-48k latent (B, 4500, 128), 100-step
DDIM with classifier-free guidance batch-doubling (200 effective UNet
forwards), bf16 compute. The whole sampling loop is one jit-compiled lax.scan.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 10.0 — the north-star target is 10x realtime on one
v5e chip (BASELINE.md), so 1.0 == target met.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from jen1_tpu.config import Config
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.models.unet import unet_from_model_config

    cfg = Config()
    mc = cfg.model_config
    model = unet_from_model_config(mc)

    B = 1
    seconds = 30
    L = seconds * 150  # Encodec-48k latent frame rate
    M, E, C = (
        mc.context_embedding_max_length,
        mc.context_embedding_features,
        mc.in_channels,
    )
    steps = 100

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((B, L, C), jnp.bfloat16)
    t = jnp.zeros((B,), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, M, E), jnp.bfloat16)
    mask = jnp.ones((B, M), bool)
    concat = jnp.zeros((B, L, C + 1), jnp.bfloat16)

    t0 = time.time()
    params = jax.jit(
        lambda r: model.init(
            r, x, t, embedding=emb, embedding_mask=mask,
            channels_list=[concat], causal=False,
        )
    )(rng)
    jax.block_until_ready(params)
    n_params = sum(v.size for v in jax.tree.leaves(params))
    init_s = time.time() - t0

    gdm = create_gaussian_diffusion(
        cfg.diffusion_config.gaussian_diffusion, sampling_steps=steps
    )

    def model_fn(x, t, **kw):
        kw["embedding"] = kw["embedding"].astype(jnp.bfloat16)
        chl = kw.get("channels_list")
        if chl is not None:
            kw["channels_list"] = [c.astype(jnp.bfloat16) for c in chl]
        out = model.apply(params, x.astype(jnp.bfloat16), t, **kw)
        return out.astype(jnp.float32)

    cond = {
        "cross_attn_cond": emb,
        "cross_attn_masks": mask,
        "global_cond": None,
        "input_concat_cond": concat,
    }

    # Stepwise sampler (jitted denoiser fwd + jitted DDIM update + host loop;
    # numerically identical to the lax.scan sampler — equivalence-tested)
    # with low XLA optimization effort: measured 69s vs 1078s compile for the
    # full-size forward at +8% step time. The one-program scan sampler's HLO
    # reliably kills this host's remote compile service (connection drop
    # after ~25 min), so bench uses stepwise unconditionally; hosts with a
    # local compiler can use mode="scan".
    OPTS = {"exec_time_optimization_effort": -1.0}

    def sample(rng):
        return gdm.sample(model_fn, (B, L, C), cond, rng, causal=False,
                          mode="stepwise", compiler_options=OPTS)

    t0 = time.time()
    out = sample(jax.random.PRNGKey(2))
    out.block_until_ready()
    compile_s = time.time() - t0

    times = []
    for i in range(3):
        t0 = time.time()
        out = sample(jax.random.PRNGKey(3 + i))
        out.block_until_ready()
        times.append(time.time() - t0)
    wall = min(times)

    audio_sec_per_sec = seconds * B / wall
    result = {
        "metric": "audio_sec_generated_per_sec_per_chip_100step_ddim",
        "value": round(audio_sec_per_sec, 3),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(audio_sec_per_sec / 10.0, 3),
    }
    print(json.dumps(result))
    # diagnostics on stderr-ish second line (driver reads line 1)
    import sys

    print(
        f"# params={n_params:,} init={init_s:.1f}s compile={compile_s:.1f}s "
        f"sample_wall={wall:.2f}s runs={['%.2f' % t for t in times]} "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
