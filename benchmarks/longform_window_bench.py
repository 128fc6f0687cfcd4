"""Single-window LONG-form generation on the real TPU (VERDICT r2 #3).

Generates one continuous window of `JEN1_LONGFORM_MINUTES` (default 5) min
through the longform_config UNet with the streamed-K/V Pallas flash kernel:
at 5 min the level-1 attention runs at N=18750 and the latent is 45000
frames; the XLA attention path would materialize (B=2,H=8,N,N) fp32 scores
= 22.4 GB at that length — infeasible on a 16 GB chip, checked and reported
rather than attempted. This is the config where the flash kernel is not a
1.03x nicety (FLASH_E2E_TPU.md) but the difference between running and not
running.

A reduced step count keeps the wall tolerable (the per-step cost is what
scales; steps are linear). Writes benchmarks/LONGFORM_WINDOW_TPU.md.

Run: python benchmarks/longform_window_bench.py
     JEN1_LONGFORM_MINUTES=5 JEN1_LONGFORM_STEPS=20 ...
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
    from jen1_tpu.config import longform_config
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    minutes = float(os.environ.get("JEN1_LONGFORM_MINUTES", "5"))
    steps = int(os.environ.get("JEN1_LONGFORM_STEPS", "20"))
    L = int(minutes * 60 * 150)  # latent frames @150 fps
    cfg = longform_config()
    mc = cfg.model_config
    # level-1 attention length (downsample 4) — the flash kernel's N
    n_attn = L // 4
    scores_gb = 2 * 8 * n_attn * n_attn * 4 / 2**30
    print(f"device={dev.device_kind} window={minutes:.0f}min latent L={L} "
          f"level-1 attention N={n_attn} "
          f"(XLA path would need {scores_gb:.1f} GB of scores alone"
          f"{' — infeasible on this chip' if scores_gb > 12 else ''})",
          flush=True)

    dc = cfg.diffusion_config.gaussian_diffusion
    dc.steps = 1000
    dc.sampling_timesteps = steps
    gdm = create_gaussian_diffusion(dc)
    model = unet_from_model_config(mc)

    B, C = 1, mc.in_channels
    M, E = mc.context_embedding_max_length, mc.context_embedding_features
    x = jnp.zeros((B, L, C), jnp.bfloat16)
    emb = jnp.zeros((B, M, E), jnp.bfloat16)
    mask = jnp.ones((B, M), bool)
    concat = jnp.zeros((B, L, C + 1), jnp.bfloat16)
    # bench.py's pattern: disk-cached shape tree + ONE jitted zeros program
    # (per-leaf host RNG + per-leaf device_put of 303M params costs minutes
    # through the tunnel; sampler TIMING is value-independent — XLA
    # specializes on shapes, not values).
    from jen1_tpu.utils.shape_cache import cached_shapes, zeros_like_shapes

    shapes = cached_shapes(
        f"longform-unet-init|{mc!r}|B{B} L{L} M{M} E{E} C{C}|concat+1",
        lambda: jax.eval_shape(
            lambda r: model.init(r, x, jnp.zeros((B,), jnp.float32),
                                 embedding=emb, embedding_mask=mask,
                                 channels_list=[concat], causal=False),
            jax.random.PRNGKey(0),
        ),
    )
    params = zeros_like_shapes(shapes)

    # weights as a program ARGUMENT (value-independent timing; captured
    # weights lower as module constants — benchmarks/hlo_compare_probe.py)
    def model_fn_p(p, x, t, **kw):
        kw["embedding"] = kw["embedding"].astype(jnp.bfloat16)
        chl = kw.get("channels_list")
        if chl is not None:
            kw["channels_list"] = [c.astype(jnp.bfloat16) for c in chl]
        return model.apply(p, x.astype(jnp.bfloat16), t, **kw).astype(
            jnp.float32)

    cond = {
        "cross_attn_cond": emb,
        "cross_attn_masks": mask,
        "global_cond": None,
        "input_concat_cond": concat,
    }
    raw = lambda p, rng: gdm.sample(  # noqa: E731
        lambda x, t, **kw: model_fn_p(p, x, t, **kw),
        (B, L, C), cond, rng, causal=False, mode="scan")
    prog = jax.jit(lambda p, rng: (
        lambda o: (o, jnp.sum(o.astype(jnp.float32))))(raw(p, rng)))

    t0 = time.time()
    lat, chk = prog(params, jax.random.PRNGKey(0))
    float(chk)
    compile_s = time.time() - t0
    print(f"compile+first sample: {compile_s:.1f}s", flush=True)
    t0 = time.time()
    lat, chk = prog(params, jax.random.PRNGKey(1))
    float(chk)
    wall = time.time() - t0
    finite = bool(np.isfinite(np.asarray(lat[:, :8, :8], np.float32)).all())
    audio_s = minutes * 60
    print(f"steady-state: {wall:.1f}s for {audio_s:.0f}s audio "
          f"({steps} steps) -> {audio_s / wall:.2f} audio-s/s; "
          f"per-100-step-equivalent {audio_s / (wall * 100 / steps):.2f}; "
          f"finite={finite}", flush=True)

    out = os.path.join(os.path.dirname(__file__), "LONGFORM_WINDOW_TPU.md")
    with open(out, "w") as f:
        f.write(f"""# Single-window long-form generation — real TPU

Device: {dev.device_kind}. ONE continuous {minutes:.0f}-minute window
(latent L={L}, level-1 attention N={n_attn}) sampled with {steps} DDIM
steps through `longform_config` with the streamed-K/V Pallas flash kernel
(`ops/flash_attention.py`).

Why this config exists: the XLA attention path materializes
(B=2, H=8, N, N) fp32 scores = **{scores_gb:.1f} GB** at this window —
infeasible on a 16 GB v5e, while the flash kernel holds O(block) VMEM
state. Long windows avoid `generate_long`'s cross-window seams entirely.

| metric | value |
|---|---|
| compile + first sample | {compile_s:.1f} s |
| steady-state wall ({steps} steps) | {wall:.1f} s |
| audio-s/s at {steps} steps | {audio_s / wall:.2f} |
| audio-s/s normalized to 100 steps | {audio_s / (wall * 100 / steps):.2f} |
| output finite | {finite} |

Reproduce: `JEN1_LONGFORM_MINUTES={minutes:.0f} JEN1_LONGFORM_STEPS={steps}
python benchmarks/longform_window_bench.py`
""")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
