"""Lower bench.py's sampler program and Jen1.generate's sampler program
side-by-side and diff the StableHLO — HOST-side only (no remote compile).

Round-4 context: bench.py's B=1 100-step GDM DDIM scan compiles in ~195 s
through the axon tunnel, while the structurally-near-identical program that
`Jen1.generate` jits (GDM, rbg, same shapes) died at >1700 s with a tunnel
broken pipe at B=4 (and VDM died at B=1). This probe lowers BOTH modules
locally and prints size + op-histogram differences so the expensive-to-
compile construct can be identified without burning a doomed 28-min compile.

Run: python benchmarks/hlo_compare_probe.py   [JEN1_HLO_BATCH=1]
Writes /tmp/hlo_bench.txt and /tmp/hlo_generate.txt.
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


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from jen1_tpu.config import Config
    from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
    from jen1_tpu.models.unet import unet_from_model_config
    from jen1_tpu.utils.shape_cache import cached_shapes, zeros_like_shapes

    B = int(os.environ.get("JEN1_HLO_BATCH", "1"))
    steps = 100
    cfg = Config()
    mc = cfg.model_config
    model = unet_from_model_config(mc)
    L, C = 4500, mc.in_channels
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

    gdm = create_gaussian_diffusion(
        cfg.diffusion_config.gaussian_diffusion, sampling_steps=steps
    )

    # ---------------- bench.py's construction (bench.py:242-343) ----------
    def bench_model_fn(x, t, **kw):
        kw["embedding"] = kw["embedding"].astype(jnp.bfloat16)
        chl = kw.get("channels_list")
        if chl is not None:
            kw["channels_list"] = [c.astype(jnp.bfloat16) for c in chl]
        out = model.apply(params, x.astype(jnp.bfloat16), t, **kw)
        if isinstance(out, tuple):
            return (out[0].astype(jnp.float32), out[1])
        return out.astype(jnp.float32)

    cond = {
        "cross_attn_cond": emb,
        "cross_attn_masks": mask,
        "global_cond": None,
        "input_concat_cond": concat,
    }

    def raw_sample(rng):
        return gdm.sample(bench_model_fn, (B, L, C), cond, rng, causal=False,
                          mode="scan")

    t0 = time.time()
    low_bench = jax.jit(raw_sample).lower(rng)
    txt_bench = low_bench.as_text()
    print(f"bench lowering: {time.time() - t0:.0f}s "
          f"{len(txt_bench) / 1e6:.1f} MB", flush=True)

    # -------------- generate()'s construction (generation.py:456-485) -----
    from jen1_tpu.api.generation import Jen1

    jen1 = Jen1(ckpt_path=None, config=Config())
    g_params = jen1._load_params(L)
    g_model_fn = jen1._make_model_fn(g_params)
    diffusion = jen1._get_diffusion(steps, True)  # GDM

    out = jen1.conditioner([{"prompt": "warm jazz with a slow beat"}] * B)
    cond_dict = dict(out)
    latent_mask = jnp.ones((B, L, 1), jen1.compute_dtype)
    cond_dict["masked_input"] = jnp.zeros((B, L, C), jen1.compute_dtype)
    cond_dict["mask"] = latent_mask
    from jen1_tpu.api.generation import assemble_conditioning

    conditioning = assemble_conditioning(
        cond_dict,
        cross_attn_cond_ids=jen1.cross_attn_cond_ids,
        global_cond_ids=jen1.global_cond_ids,
        input_concat_ids=jen1.input_concat_ids,
    )

    sample_fn = lambda r, c, i: diffusion.sample(  # noqa: E731
        g_model_fn, (B, L, C), c, r, causal=False, init_data=i,
    )
    t0 = time.time()
    low_gen = jax.jit(sample_fn).lower(
        jax.random.fold_in(rng, 2), conditioning, None
    )
    txt_gen = low_gen.as_text()
    print(f"generate lowering: {time.time() - t0:.0f}s "
          f"{len(txt_gen) / 1e6:.1f} MB", flush=True)

    open("/tmp/hlo_bench.txt", "w").write(txt_bench)
    open("/tmp/hlo_generate.txt", "w").write(txt_gen)

    hb, hg = histogram(txt_bench), histogram(txt_gen)
    all_ops = sorted(set(hb) | set(hg),
                     key=lambda o: -(abs(hb.get(o, 0) - hg.get(o, 0))))
    print(f"{'op':34s} {'bench':>8s} {'generate':>8s}")
    for op in all_ops:
        b, g = hb.get(op, 0), hg.get(op, 0)
        if b != g or b > 500:
            print(f"{op:34s} {b:8d} {g:8d}")
    print("\ntotal ops:", sum(hb.values()), sum(hg.values()))


if __name__ == "__main__":
    main()
