"""Train-step benchmark where the Pallas flash-attention BACKWARD engages.

VERDICT r3 next-#8: the streamed-K/V kernel's O(N)-memory backward
(ops/flash_attention.py) was parity-tested but no shipped training config
reached it — the flagship config's attention lives at cumulative
downsample >=64, under flash_min_seq_len. This bench runs the REAL
multi-task train step (grad + fused AdamW) on `longform_config()` — level-1
attention over L/4 frames — at a sequence length where the kernel threshold
(1024) is crossed, with flash ON vs OFF (the XLA dot-product path), same
everything else.

Reports per variant: step wall (host fetch of the loss), audio-s/s/chip,
peak HBM, and the on/off loss agreement at identical rng (sanity that the
kernel's forward+backward compute the same math).

Run: python benchmarks/flash_train_bench.py
     JEN1_FLASH_TRAIN_SECONDS=30 JEN1_FLASH_TRAIN_BATCH=3

Writes benchmarks/FLASH_TRAIN_TPU.md.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_variant(use_flash: bool, B: int, seconds: float):
    from benchmarks.train_step_bench import build_state, mem_stats
    from jen1_tpu.config import longform_config
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.train.trainer import UnifiedMultiTaskTrainer

    dev = jax.devices()[0]
    cfg = longform_config()
    cfg.grad_accum_every = 1
    cfg.model_config = dataclasses.replace(
        cfg.model_config, use_flash_attention=use_flash
    )
    mc = cfg.model_config
    L = int(seconds * 150)  # level-1 attention length = L/4
    model = unet_from_model_config(mc)
    gdm = create_gaussian_diffusion(cfg.diffusion_config.gaussian_diffusion)
    trainer = UnifiedMultiTaskTrainer(cfg, model, gdm)

    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(
            rng.normal(size=(B, L, mc.in_channels)), jnp.float32),
        "text_emb": jnp.asarray(
            rng.normal(size=(B, mc.context_embedding_max_length,
                             mc.context_embedding_features)), jnp.bfloat16),
        "text_mask": jnp.ones((B, mc.context_embedding_max_length), bool),
    }
    state = build_state(trainer, model, mc, batch, B, L)

    class Coin:  # one causal variant -> one compile
        def integers(self, a, b):
            return 0

    host_rng = Coin()
    row = {"flash": use_flash, "B": B, "L": L,
           "attn_len": L // 4,
           "params": sum(v.size for v in jax.tree.leaves(state.params))}
    t0 = time.time()
    try:
        state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1),
                                      host_rng)
        row["loss0"] = float(m["loss/train"])
    except Exception as e:  # noqa: BLE001 — OOM is a result here
        row["oom"] = type(e).__name__
        print(f"ERROR flash={use_flash}: {e}", flush=True)
        return row
    row["compile_s"] = round(time.time() - t0, 1)
    times = []
    for i in range(5):
        t0 = time.time()
        state, m = trainer.train_step(
            state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i),
            host_rng)
        float(m["loss/train"])
        times.append(time.time() - t0)
    row["step_s"] = round(min(times[1:]), 3)
    row["audio_s_per_s"] = round(B * seconds / row["step_s"], 1)
    row["mem"] = mem_stats(dev)
    return row


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    B = int(os.environ.get("JEN1_FLASH_TRAIN_BATCH", "3"))
    seconds = float(os.environ.get("JEN1_FLASH_TRAIN_SECONDS", "30"))
    print(f"device: {dev.device_kind} B={B} seconds={seconds} "
          f"(attn len {int(seconds * 150) // 4} at level 1)", flush=True)

    rows = []
    for use_flash in (True, False):
        print(f"--- flash={use_flash}", flush=True)
        r = bench_variant(use_flash, B, seconds)
        print(r, flush=True)
        rows.append(r)

    lines = [
        "# Flash-attention backward under grad — real-TPU train step",
        "",
        f"Device: {dev.device_kind}. `longform_config()` (level-1 attention"
        f" over L/4 frames), B={B} x {seconds:.0f} s clips, full multi-task"
        " train step (causal-grouped CFG forwards + grad + fused AdamW,"
        " donated state). flash=True runs the streamed-K/V Pallas kernel"
        " with its Pallas recompute backward (ops/flash_attention.py);"
        " flash=False is the XLA dot-product attention, same config"
        " otherwise. Timing = host fetch of the loss scalar.",
        "",
        "| flash | attn len | step s | audio-s/s/chip | peak HBM GB |"
        " loss (same rng) | compile s |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if "oom" in r:
            lines.append(f"| {r['flash']} | {r['attn_len']} | OOM"
                         f" ({r['oom']}) | — | — | — | — |")
        else:
            mem = r["mem"]
            mem_s = f"{mem['peak_gb']:.1f}" if mem else "n/a"
            lines.append(
                f"| {r['flash']} | {r['attn_len']} | {r['step_s']} |"
                f" {r['audio_s_per_s']} | {mem_s} | {r['loss0']:.5f} |"
                f" {r['compile_s']:.0f} |")
    ok = [r for r in rows if "oom" not in r]
    if len(ok) == 2:
        dl = abs(ok[0]["loss0"] - ok[1]["loss0"])
        rel = dl / max(abs(ok[1]["loss0"]), 1e-9)
        lines += [
            "",
            f"Loss agreement at identical rng: |Δ| = {dl:.2e}"
            f" (rel {rel:.2e}) — the kernel computes the same math as the"
            " XLA path under grad (unit parity: tests/test_flash_attention).",
        ]
    lines += [
        "",
        f"Reproduce: `JEN1_FLASH_TRAIN_BATCH={B}"
        f" JEN1_FLASH_TRAIN_SECONDS={seconds:.0f}"
        " python benchmarks/flash_train_bench.py`",
    ]
    out = os.path.join(os.path.dirname(__file__), "FLASH_TRAIN_TPU.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
