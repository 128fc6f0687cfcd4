"""A/B the conv lowering at the flagship train batch (VERDICT r3 next-#5).

TRAIN_STEP_TPU.md's scaling fit puts ~2.7 ms/batch-element of compute at
B=96 — conv-dominated (the UNet is conv-heavy and memory-bound). The
JEN1_CONV_IMPL=dot rewrite (ops/conv.py: stride-1 convs as K shifted
dot_generals) exists and is parity-tested; this measures both lowerings at
the same point: full multi-task train step, B elements of 10 s latents,
remat off, fused AdamW, honest loss-fetch timing.

Run: python benchmarks/conv_ab_bench.py    [JEN1_CONV_AB_B=96]
Appends a section to benchmarks/TRAIN_STEP_TPU.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(impl: str, B: int):
    os.environ["JEN1_CONV_IMPL"] = impl
    from jen1_tpu.config import Config
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.train.trainer import UnifiedMultiTaskTrainer
    from benchmarks.train_step_bench import build_state

    cfg = Config()
    cfg.grad_accum_every = 1
    cfg.trainer_config.use_remat = False
    mc = cfg.model_config
    model = unet_from_model_config(mc)
    gdm = create_gaussian_diffusion(cfg.diffusion_config.gaussian_diffusion)
    trainer = UnifiedMultiTaskTrainer(cfg, model, gdm)
    L = 1500  # 10 s latents (the training window)
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

    class Coin:  # one causal variant -> one compiled program
        def integers(self, a, b):
            return 0

    host_rng = Coin()
    t0 = time.time()
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1),
                                  host_rng)
    float(m["loss/train"])
    compile_s = time.time() - t0
    times = []
    for i in range(5):
        t0 = time.time()
        state, m = trainer.train_step(
            state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i),
            host_rng)
        float(m["loss/train"])  # host fetch: the honest wall
        times.append(time.time() - t0)
    step_s = min(times)
    print(f"[{impl}] compile {compile_s:.0f}s step {step_s:.3f}s "
          f"-> {B * 10 / step_s:.0f} audio-s/s", flush=True)
    del state, batch, trainer
    return {"impl": impl, "compile_s": compile_s, "step_s": step_s,
            "audio_s": B * 10 / step_s}


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    B = int(os.environ.get("JEN1_CONV_AB_B", "96"))
    print(f"device: {dev.device_kind} B={B}", flush=True)
    rows = [measure(impl, B)
            for impl in os.environ.get("JEN1_CONV_AB_IMPLS",
                                       "xla,dot").split(",")]

    out = os.path.join(os.path.dirname(__file__), "TRAIN_STEP_TPU.md")
    with open(out, "a") as f:
        f.write(f"""
## v4 — conv lowering A/B at B={B} (JEN1_CONV_IMPL)

Same step (remat off, fused AdamW, honest loss-fetch walls), two conv
lowerings: XLA's own `lax.conv_general_dilated` vs K shifted dot_generals
(`ops/conv.py _conv1d_dot`; parity-tested):

| impl | compile | s/step | audio-s trained /s/chip |
|---|---|---|---|
""")
        for r in rows:
            f.write(f"| {r['impl']} | {r['compile_s']:.0f} s "
                    f"| {r['step_s']:.3f} | {r['audio_s']:.0f} |\n")
        if len(rows) == 2:
            speedup = rows[0]["step_s"] / rows[1]["step_s"]
            f.write(f"\ndot/xla step-time ratio: {1 / speedup:.3f} "
                    f"(dot is {'faster' if speedup > 1 else 'slower'}; "
                    f"{abs(speedup - 1) * 100:.1f}%)\n")
        f.write(f"\nReproduce: `JEN1_CONV_AB_B={B} python "
                f"benchmarks/conv_ab_bench.py`\n")
    print(f"appended to {out}", flush=True)


if __name__ == "__main__":
    main()
