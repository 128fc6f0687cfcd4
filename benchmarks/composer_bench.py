"""Composer (multi-track) full-size benchmark on the real TPU — VERDICT r2
next-#5: give the flagship beyond-reference feature a performance identity.

Measures, per track count n in JEN1_COMPOSER_TRACKS (default 2,4):
  * train step wall + audio-s/s at the composer batch (B = 4, 10 s clips,
    the composer_config default) — the multi-task step incl. track_gen;
  * generation wall for a 30 s 4-track clip at 100-step DDIM (per-track
    audio-s/s), sampler-only (codec decode is per-track independent and
    covered by DECODE_TPU.md);
  * peak HBM when exposed (axon may not expose memory_stats).

Writes benchmarks/COMPOSER_TPU.md.

Run: python benchmarks/composer_bench.py
     JEN1_COMPOSER_TRACKS=2,4 JEN1_COMPOSER_STEPS=100
     JEN1_COMPOSER_SKIP_TRAIN=1  # gen-only: skips the ~11-min train-step
                                 # compile (the only way to finish on hosts
                                 # whose session cap is below that wall)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_tracks(n_tracks: int, steps: int):
    from benchmarks.train_step_bench import build_state, mem_stats
    from jen1_tpu.config import composer_config
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.train.trainer import UnifiedMultiTaskTrainer

    dev = jax.devices()[0]
    cfg = composer_config(n_tracks=n_tracks)
    cfg.grad_accum_every = 1
    mc = cfg.model_config
    model = unet_from_model_config(mc)
    gdm = create_gaussian_diffusion(cfg.diffusion_config.gaussian_diffusion)
    trainer = UnifiedMultiTaskTrainer(cfg, model, gdm)

    row = {"n_tracks": n_tracks}

    # ---- train step at the composer batch (B=4 tasks x 10 s).
    # JEN1_COMPOSER_SKIP_TRAIN=1 skips this phase for low-budget hosts: the
    # fwd+bwd+fused-AdamW graph at 305M params compiled in 666 s once the
    # r3 dense-literal weight captures were fixed (the earlier ">25 min,
    # killed" was that defect, not program size); the gen-only sampler
    # program is the ~2-3 min class.
    if os.environ.get("JEN1_COMPOSER_SKIP_TRAIN") == "1":
        row["train_skipped"] = "compile-gated (>25 min train-step compile)"
    else:
        B, L = 4, 1500
        rng = np.random.default_rng(0)
        batch = {
            "latents": jnp.asarray(
                rng.normal(size=(B, L, mc.in_channels)), jnp.float32),
            "text_emb": jnp.asarray(
                rng.normal(size=(B, mc.context_embedding_max_length,
                                 mc.context_embedding_features)),
                jnp.bfloat16),
            "text_mask": jnp.ones(
                (B, mc.context_embedding_max_length), bool),
        }
        state = build_state(trainer, model, mc, batch, B, L)
        row["params"] = sum(v.size for v in jax.tree.leaves(state.params))

        class Coin:  # one causal variant -> one compile
            def integers(self, a, b):
                return 0

        host_rng = Coin()
        t0 = time.time()
        try:
            state, m = trainer.train_step(
                state, batch, jax.random.PRNGKey(1), host_rng)
            float(m["loss/train"])
        except Exception as e:  # noqa: BLE001 — OOM at high tracks is data
            row["train"] = {"oom": type(e).__name__}
            return row
        row["train_compile_s"] = round(time.time() - t0, 1)
        times = []
        for i in range(4):
            t0 = time.time()
            state, m = trainer.train_step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i),
                host_rng)
            float(m["loss/train"])
            times.append(time.time() - t0)
        step_s = min(times)
        row["train_step_s"] = round(step_s, 3)
        row["train_audio_s_per_s"] = round(B * 10 / step_s, 1)
        row["train_track_audio_s_per_s"] = round(
            B * 10 * n_tracks / step_s, 1)
        row["mem_after_train"] = mem_stats(dev)
        del state, batch

    # ---- 30 s 4-track generation, 100-step DDIM scan, CFG-doubled
    Lg = 4500
    dc = cfg.diffusion_config.gaussian_diffusion
    dc.steps = 1000
    dc.sampling_timesteps = steps
    gdm_g = create_gaussian_diffusion(dc)
    M, E = mc.context_embedding_max_length, mc.context_embedding_features
    emb = jnp.zeros((1, M, E), jnp.bfloat16)
    mask = jnp.ones((1, M), bool)
    concat = jnp.zeros((1, Lg, mc.in_channels + n_tracks), jnp.bfloat16)
    host = np.random.default_rng(1)
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, Lg, mc.in_channels),
                                          jnp.bfloat16),
                             jnp.zeros((1,), jnp.float32), embedding=emb,
                             embedding_mask=mask, channels_list=[concat],
                             causal=False),
        jax.random.PRNGKey(0))
    params = jax.device_put(
        jax.tree.map(lambda s: jnp.asarray(
            host.normal(0, 0.02, s.shape).astype(s.dtype)), shapes), dev)
    # Count only the 'params' collection, mirroring the train path's
    # state.params count (the full init output would silently diverge if
    # the model ever gains a non-param collection, e.g. batch_stats).
    row.setdefault("params", sum(
        int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"])))

    # weights as a program ARGUMENT: these are host-random DENSE values — as
    # a closure capture they lower into the module as multi-GB literal
    # constants (benchmarks/hlo_compare_probe.py), which is what made the r3
    # composer gen/train compiles exceed the remote-compile tunnel's limit
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

    prog = jax.jit(lambda p, rng: (lambda o: (o, jnp.sum(o.astype(
        jnp.float32))))(gdm_g.sample(
            lambda x, t, **kw: model_fn_p(p, x, t, **kw),
            (1, Lg, mc.in_channels), cond, rng, causal=False, mode="scan")))
    t0 = time.time()
    _, chk = prog(params, jax.random.PRNGKey(3))
    float(chk)
    row["gen_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    _, chk = prog(params, jax.random.PRNGKey(4))
    float(chk)
    wall = time.time() - t0
    row["gen_wall_s"] = round(wall, 2)
    row["gen_track_audio_s_per_s"] = round(30 * n_tracks / wall, 1)
    row["mem_after_gen"] = mem_stats(dev)
    return row


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    steps = int(os.environ.get("JEN1_COMPOSER_STEPS", "100"))
    tracks = [int(t) for t in os.environ.get(
        "JEN1_COMPOSER_TRACKS", "2,4").split(",")]
    rows = []
    for n in tracks:
        print(f"--- n_tracks={n}", flush=True)
        r = bench_tracks(n, steps)
        print(r, flush=True)
        rows.append(r)

    lines = [
        "# Composer (multi-track) — real-TPU benchmark",
        "",
        f"Device: {dev.device_kind}. `composer_config(n)`: tracks are"
        " channel groups in ONE latent (in/out = 128*n), multi-task step"
        " incl. track_gen, B=4 x 10 s train clips; generation = 30 s"
        " 4-task-conditioned clip, 100-step DDIM scan, CFG-doubled, bf16."
        " Walls via host fetch of a checksum (block_until_ready"
        " under-reports on this runtime). The reference has no multi-track"
        " system at all (BASELINE configs[4] is the stretch target).",
        "",
        "| tracks | params | train step s | train audio-s/s |"
        " train track-audio-s/s | gen wall s (30 s) | gen track-audio-s/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if "train" in r and "oom" in r.get("train", {}):
            lines.append(f"| {r['n_tracks']} | {r.get('params', '?')} |"
                         f" OOM | — | — | — | — |")
        elif "train_skipped" in r:
            lines.append(
                f"| {r['n_tracks']} | {r['params'] / 1e6:.0f}M |"
                f" compile-gated* | — | — | {r['gen_wall_s']} |"
                f" {r['gen_track_audio_s_per_s']} |")
        else:
            lines.append(
                f"| {r['n_tracks']} | {r['params'] / 1e6:.0f}M |"
                f" {r['train_step_s']} | {r['train_audio_s_per_s']} |"
                f" {r['train_track_audio_s_per_s']} | {r['gen_wall_s']} |"
                f" {r['gen_track_audio_s_per_s']} |")
    if any("train_skipped" in r for r in rows):
        lines += [
            "",
            "\\* train-step skipped on this run (JEN1_COMPOSER_SKIP_TRAIN=1;"
            " the fwd+bwd+fused-AdamW compile measured ~11 min at 305M "
            "params). Re-run without the flag for the train column.",
        ]
    skip_prefix = ("JEN1_COMPOSER_SKIP_TRAIN=1 "
                   if any("train_skipped" in r for r in rows) else "")
    lines += [
        "",
        "Reproduce: `" + skip_prefix
        + "JEN1_COMPOSER_TRACKS=" + ",".join(map(str, tracks))
        + f" JEN1_COMPOSER_STEPS={steps}"
        " python benchmarks/composer_bench.py`",
    ]
    out = os.path.join(os.path.dirname(__file__), "COMPOSER_TPU.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
