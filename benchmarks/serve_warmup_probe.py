"""Phase-split probe of the serving warm-up: WHICH program eats the wall?

Round-4 context: serve_bench warm-ups died twice at ~2000-2100 s with a
tunnel `remote_compile: Broken pipe` — the axon compile endpoint drops any
single compile past ~33 min. bench.py's near-identical B=1 sampler compiles
in ~195 s, so something in `Jen1.generate`'s program class is ~10x more
expensive to compile. This probe times each program separately (T5
conditioner forward, sampler scan, chunked decode) with jax_log_compiles on;
every phase that completes lands in the persistent compile cache, so later
serve_bench runs fast-forward past it.

Run: timeout 3500 python benchmarks/serve_warmup_probe.py
Env: JEN1_PROBE_RNG=threefry2x32|rbg (default threefry2x32 = generate()'s
     default, the serving path as shipped), JEN1_PROBE_GDM=1 (use the GDM
     DDIM sampler — bench.py's proven ~200 s compile class — instead of
     generate()'s default VDM, whose scan program measured >10 min to
     compile on this host with EITHER rng impl), JEN1_PROBE_BATCH,
     JEN1_PROBE_STEPS, JEN1_PROBE_SECONDS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    jax.config.update("jax_log_compiles", True)

    from jen1_tpu.api.generation import Jen1
    from jen1_tpu.config import Config

    steps = int(os.environ.get("JEN1_PROBE_STEPS", "100"))
    seconds = float(os.environ.get("JEN1_PROBE_SECONDS", "30"))
    rng_impl = os.environ.get("JEN1_PROBE_RNG", "threefry2x32")
    use_gdm = os.environ.get("JEN1_PROBE_GDM") == "1"
    batch = int(os.environ.get("JEN1_PROBE_BATCH", "1"))
    print(f"device={jax.devices()[0].device_kind} steps={steps} "
          f"seconds={seconds} rng_impl={rng_impl} use_gdm={use_gdm} "
          f"B={batch}", flush=True)

    t0 = time.time()
    jen1 = Jen1(ckpt_path=None, config=Config())
    print(f"[phase build] Jen1 built in {time.time() - t0:.0f}s", flush=True)

    # Phase 1: the T5 conditioner forward (B=1) — the program serve compiles
    # that bench.py never does (bench feeds random embeddings directly).
    t0 = time.time()
    out = jen1.conditioner([{"prompt": "warm jazz with a slow beat"}])
    jax.block_until_ready(jax.tree.leaves(dict(out)))
    print(f"[phase T5] conditioner forward B=1: {time.time() - t0:.0f}s",
          flush=True)

    # Phase 2: sampler scan only (decode=False). T5 is warm from phase 1.
    t0 = time.time()
    lat = jen1.generate(
        "warm jazz with a slow beat", steps=steps, seconds=seconds,
        seed=7, decode=False, rng_impl=rng_impl, use_gdm=use_gdm,
        batch_size=batch,
    )
    print(f"[phase sampler] {steps}-step scan B=1 (decode=False): "
          f"{time.time() - t0:.0f}s shape={lat.shape}", flush=True)

    # Phase 3: full generate (adds the chunked decode program).
    t0 = time.time()
    audio = jen1.generate(
        "warm jazz with a slow beat", steps=steps, seconds=seconds,
        seed=7, rng_impl=rng_impl, use_gdm=use_gdm, batch_size=batch,
    )
    print(f"[phase decode] full generate: {time.time() - t0:.0f}s "
          f"shape={audio.shape}", flush=True)

    # Phase 4: warm repeat — the serving steady state.
    t0 = time.time()
    jen1.generate("another prompt entirely", steps=steps, seconds=seconds,
                  seed=8, rng_impl=rng_impl, use_gdm=use_gdm,
                  batch_size=batch)
    print(f"[phase warm] warm repeat: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
