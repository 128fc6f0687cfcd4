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
    # ONE jitted program draws N(0, 0.02) for every leaf: zeros weights make
    # the CFG std-rescale 0/0 (scale_cfg divides by the conditional output's
    # std) so the sampled window would be all-NaN and the doc's finite check
    # meaningless; random weights keep every wall honest AND finite. Still
    # one device program (per-leaf host RNG + device_put of 300M params
    # costs minutes through the tunnel).
    def _init(key):
        leaves, treedef = jax.tree.flatten(
            shapes, is_leaf=lambda x: hasattr(x, "shape")
        )
        keys = jax.random.split(key, len(leaves))
        vals = [
            0.02 * jax.random.normal(k, s.shape, s.dtype)
            for k, s in zip(keys, leaves)
        ]
        return jax.tree.unflatten(treedef, vals)

    params = jax.jit(_init)(jax.random.PRNGKey(7))
    del zeros_like_shapes  # imported for parity with bench.py; unused now

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
    # JEN1_LONGFORM_FWD_ONLY=1: ONE denoiser forward instead of the
    # steps-scan — a crash-bisection mode (the 5-min scan reproducibly
    # crashed the TPU worker on first execution, 2026-08-19; a single
    # forward compiles in minutes and isolates whether the per-step
    # program or the scan is at fault).
    if os.environ.get("JEN1_LONGFORM_FWD_ONLY") == "1":
        emb_s = 0.8

        def fwd(p, xin):
            o = model_fn_p(p, xin, jnp.zeros((B,), jnp.float32),
                           embedding=emb, embedding_mask=mask,
                           channels_list=[concat], embedding_scale=emb_s,
                           batch_cfg=True, scale_cfg=True, causal=False)
            return o, jnp.sum(o.astype(jnp.float32))

        prog_fwd = jax.jit(fwd)
        t0 = time.time()
        _, chk = prog_fwd(params, jnp.zeros((B, L, C), jnp.bfloat16))
        float(chk)
        print(f"[fwd-only] compile+first forward: {time.time() - t0:.1f}s "
              f"OK", flush=True)
        t0 = time.time()
        _, chk = prog_fwd(params, jnp.ones((B, L, C), jnp.bfloat16) * 0.01)
        float(chk)
        print(f"[fwd-only] steady forward: {time.time() - t0:.3f}s",
              flush=True)
        return
    # Sampler mode: 'scan' (default; whole loop in one XLA program) or
    # 'stepwise' (the shipped per-step-jit sampler). History: the first 5-min
    # attempts "crashed the TPU worker" — that was the sampling_timesteps
    # config bug (the run executed the FULL 1000-step DDPM chain, an ~11 min
    # uninterrupted device execution the worker kills), not the scan or the
    # flash kernel; the real 20-step scan runs in 1.3 s.
    sampler = os.environ.get("JEN1_LONGFORM_SAMPLER", "scan")
    if sampler == "stepwise":
        def run(seed):
            return gdm.sample(
                model_fn_p, (B, L, C), cond, jax.random.PRNGKey(seed),
                causal=False, mode="stepwise", model_params=params)

        t0 = time.time()
        lat = run(0)
        np.asarray(lat[:, :8, :8])
        compile_s = time.time() - t0
        print(f"compile+first sample (stepwise): {compile_s:.1f}s",
              flush=True)
        t0 = time.time()
        lat = run(1)
        np.asarray(lat[:, :8, :8])
        wall = time.time() - t0
    else:
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
steps (sampler mode: {sampler}) through `longform_config` with the
streamed-K/V Pallas flash kernel (`ops/flash_attention.py`), weights
passed as program arguments.

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
JEN1_LONGFORM_SAMPLER={sampler} python benchmarks/longform_window_bench.py`

History note: the first 5-min attempts appeared to crash the TPU worker.
Root cause was the GDMConfig.sampling_timesteps silent no-op (fixed in
round 4): those runs executed the FULL 1000-step DDPM chain — an ~11 min
uninterrupted device execution the worker kills — not a scan or flash
kernel fault (a single forward ran fine: 0.668 s steady,
JEN1_LONGFORM_FWD_ONLY=1).
""")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
