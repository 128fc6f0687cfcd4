"""Triage the VDM-scan compile pathology (VERDICT r4 next-#1).

Round-4 finding: the whole-loop VDM sampler scan (use_gdm=False — the
reference's DEFAULT generate() path, /root/reference/generation.py:76)
cannot compile through the axon tunnel (died at 1630 s), while the
structurally near-identical GDM DDIM scan compiles in the ~200 s class.
Op counts are near-identical (12.2k vs 12.5k), so the cost is a
pathological pass, not program size.

This probe builds BOTH sampler programs at identical shapes with zeros
params as ARGUMENTS (r4 lesson: closure-captured weights lower as dense
literals), then:
  * mode=lower  — host-side lowering of both, prints StableHLO size and
                  an op-histogram diff (no compile, safe anywhere);
  * mode=cpu    — compiles both on the LOCAL XLA:CPU backend and times
                  each, to test whether the pathological pass is
                  platform-independent (bisectable locally if so);
  * mode=tpu    — compiles both through the tunnel (expensive; only for
                  confirming a fix).

Knobs (env): JEN1_PROBE_STEPS (default 100), JEN1_PROBE_L (default 4500),
JEN1_PROBE_VARIANT — bisection variants of the VDM body (see VARIANTS).

Run: JAX_PLATFORMS=cpu python benchmarks/vdm_gdm_probe.py cpu
"""

from __future__ import annotations

import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def histogram(text: str) -> collections.Counter:
    ops = re.findall(r"= \"?([a-z_.]+)[\"(<]", text)
    return collections.Counter(ops)


def build_programs():
    import jax
    import jax.numpy as jnp

    from jen1_tpu.config import Config
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.diffusion.vdm import create_variational_diffusion
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.utils.shape_cache import cached_shapes, zeros_like_shapes

    B = 1
    steps = int(os.environ.get("JEN1_PROBE_STEPS", "100"))
    L = int(os.environ.get("JEN1_PROBE_L", "4500"))
    cfg = Config()
    mc = cfg.model_config
    model = unet_from_model_config(mc)
    C = mc.in_channels
    M, E = mc.context_embedding_max_length, mc.context_embedding_features

    rng = jax.random.key(0, impl="rbg")
    x = jnp.zeros((B, L, C), jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, M, E), jnp.bfloat16)
    mask = jnp.ones((B, M), bool)
    concat = jnp.zeros((B, L, C + 1), jnp.bfloat16)

    shapes = cached_shapes(
        f"bench-unet-init|{mc!r}|B{B} L{L} M{M} E{E} C{C}|concat+1",
        lambda: jax.eval_shape(
            lambda r: model.init(
                r, x, jnp.zeros((B,), jnp.float32), embedding=emb,
                embedding_mask=mask, channels_list=[concat], causal=False,
            ),
            jax.random.PRNGKey(0),
        ),
    )
    params = zeros_like_shapes(shapes)

    def model_fn(p, x, t, **kw):
        kw["embedding"] = kw["embedding"].astype(jnp.bfloat16)
        chl = kw.get("channels_list")
        if chl is not None:
            kw["channels_list"] = [c.astype(jnp.bfloat16) for c in chl]
        out = model.apply(p, x.astype(jnp.bfloat16), t, **kw)
        if isinstance(out, tuple):
            return (out[0].astype(jnp.float32), out[1])
        return out.astype(jnp.float32)

    cond = {
        "cross_attn_cond": emb,
        "cross_attn_masks": mask,
        "global_cond": None,
        "input_concat_cond": concat,
    }

    gdm = create_gaussian_diffusion(
        cfg.diffusion_config.gaussian_diffusion, sampling_steps=steps
    )
    vdm = create_variational_diffusion(cfg.diffusion_config.variational_diffusion)

    def gdm_sample(p, r):
        return gdm.sample(model_fn, (B, L, C), cond, r, causal=False,
                          mode="scan", model_params=p)

    def vdm_sample(p, r):
        return vdm.sample(model_fn, (B, L, C), cond, r, step=steps,
                          causal=False, mode="scan", model_params=p)

    def vdm_hoist(p, r):
        """VDM scan with the trig schedule precomputed HOST-side and fed as
        scan xs — no cos/sin inside the loop body (bisection variant)."""
        import functools

        import numpy as np

        mfn = functools.partial(model_fn, p)
        rng_init, rng_loop = jax.random.split(r)
        audio0 = jax.random.normal(rng_init, (B, L, C), jnp.float32)
        ts = np.linspace(1.0, 0.0, steps + 1, dtype=np.float32)
        ang = ts * (np.pi / 2)
        al, sg = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)
        xs = jnp.asarray(
            np.stack([ts[:-1], al[:-1], sg[:-1], al[1:], sg[1:]], axis=1)
        )  # (steps, 5)

        def body(carry, row):
            audio, i = carry
            t, alpha, sigma, alpha_next, sigma_next = (
                row[0], row[1], row[2], row[3], row[4]
            )
            step_rng = jax.random.fold_in(rng_loop, i)
            time_cond = jnp.full((B,), t, dtype=jnp.float32)
            v_pred = vdm._call_model(
                mfn, audio, time_cond, cond, causal=False, rng=step_rng,
                dropout=False,
            ).astype(jnp.float32)
            x_pred = alpha * audio - sigma * v_pred
            noise_pred = sigma * audio + alpha * v_pred
            return (alpha_next * x_pred + sigma_next * noise_pred, i + 1), 0

        (audio, _), _ = jax.lax.scan(body, (audio0, 0), xs)
        return audio

    return {"gdm": gdm_sample, "vdm": vdm_sample, "vdm_hoist": vdm_hoist}, \
        params, rng


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "lower"
    if mode == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    if mode == "tpu":
        enable_compile_cache()
    import jax

    fns, params, rng = build_programs()
    which = os.environ.get("JEN1_PROBE_ONLY", "gdm,vdm").split(",")
    lowered, texts = {}, {}
    for name in which:
        t0 = time.time()
        lowered[name] = jax.jit(fns[name]).lower(params, rng)
        texts[name] = lowered[name].as_text()
        print(f"{name} lowering: {time.time() - t0:.0f}s "
              f"{len(texts[name]) / 1e6:.1f} MB", flush=True)
        open(f"/tmp/hlo_{name}.txt", "w").write(texts[name])

    if len(texts) == 2:
        hb, hg = histogram(texts["gdm"]), histogram(texts["vdm"])
        all_ops = sorted(set(hb) | set(hg),
                         key=lambda o: -(abs(hb.get(o, 0) - hg.get(o, 0))))
        print(f"{'op':34s} {'gdm':>8s} {'vdm':>8s}")
        for op in all_ops:
            b, g = hb.get(op, 0), hg.get(op, 0)
            if b != g or b > 500:
                print(f"{op:34s} {b:8d} {g:8d}")
        print("total ops:", sum(hb.values()), sum(hg.values()), flush=True)

    if mode in ("cpu", "tpu"):
        compiled = {}
        for name in which:
            t0 = time.time()
            compiled[name] = lowered[name].compile()
            print(f"{name} compile ({mode}): {time.time() - t0:.0f}s",
                  flush=True)
        if os.environ.get("JEN1_PROBE_RUN") == "1":
            import jax.numpy as jnp

            for name in which:
                fn = compiled[name]
                out = fn(params, rng)
                jnp.sum(out).block_until_ready()
                walls = []
                for i in range(3):
                    r2 = jax.random.fold_in(rng, i + 1)
                    t0 = time.time()
                    out = fn(params, r2)
                    float(jnp.sum(out.astype(jnp.float32)))  # honest fence
                    walls.append(time.time() - t0)
                print(f"{name} run: best={min(walls):.3f}s walls="
                      f"{[f'{w:.3f}' for w in walls]}", flush=True)


if __name__ == "__main__":
    main()
