"""VDM (the reference-DEFAULT sampler, use_gdm=False) end-to-end on TPU.

Round-4 left `generate()`'s default path (VDM, /root/reference/generation.py:76)
as the one "reference beats us" cell: its whole-loop scan died compiling
through the tunnel (>1600 s) and the stepwise fallback ran 0.27x realtime.
Round-5 triage (benchmarks/vdm_gdm_probe.py): the VDM scan with weights as
PROGRAM ARGUMENTS lowers+compiles in the normal GDM class (~312 s cold,
23 s of which is the tunnel compile) — the r4 deaths were the
closure-captured-weights literal bug, probed BEFORE the weights-as-args fix
landed in generate(), not a VDM-specific XLA pathology.

This bench is the authoritative measurement: the REAL Jen1.generate
(use_gdm=False, sampler_mode='scan') cold + warm, B in {1,4}, both rng
impls, 100 steps, 30 s clips. Writes results into B1_INFERENCE_TPU.md's
companion table printed here and cited from the README.

Run: python benchmarks/vdm_e2e_bench.py   [JEN1_VDM_BENCH_BATCHES=1,4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from jen1_tpu.api.generation import Jen1
    from jen1_tpu.config import Config

    batches = [int(v) for v in
               os.environ.get("JEN1_VDM_BENCH_BATCHES", "1,4").split(",")]
    rngs = os.environ.get("JEN1_VDM_BENCH_RNGS", "rbg,threefry2x32").split(",")
    steps = int(os.environ.get("JEN1_VDM_BENCH_STEPS", "100"))
    seconds = float(os.environ.get("JEN1_VDM_BENCH_SECONDS", "30"))
    trials = int(os.environ.get("JEN1_VDM_BENCH_TRIALS", "3"))

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} steps={steps} seconds={seconds} "
          f"batches={batches} rngs={rngs}", flush=True)
    t0 = time.time()
    jen1 = Jen1(ckpt_path=None, config=Config(), weights_dtype="bfloat16")
    print(f"Jen1 built (random weights, bf16 storage) in "
          f"{time.time() - t0:.0f}s", flush=True)

    rows = []
    for B in batches:
        for rng_impl in rngs:
            t0 = time.time()
            out = jen1.generate(
                ["warm jazz with a slow beat"] * B, seed=7, steps=steps,
                batch_size=B, seconds=seconds, use_gdm=False,
                sampler_mode="scan", rng_impl=rng_impl,
                output_dtype="int16",
            )
            cold = time.time() - t0
            assert out.shape[0] == B and np.isfinite(
                out.astype(np.float32)).all()
            walls = []
            for k in range(trials):
                t0 = time.time()
                jen1.generate(
                    [f"trial {k} prompt"] * B, seed=100 + k, steps=steps,
                    batch_size=B, seconds=seconds, use_gdm=False,
                    sampler_mode="scan", rng_impl=rng_impl,
                    output_dtype="int16",
                )
                walls.append(time.time() - t0)
            best = min(walls)
            thr = B * seconds / best
            rows.append((B, rng_impl, cold, best, thr))
            print(f"B={B} rng={rng_impl}: cold(compile+first)={cold:.0f}s "
                  f"warm={best:.3f}s -> {thr:.1f} audio-s/s/chip "
                  f"({thr:.0f}x realtime)", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "VDM_E2E_TPU.md")
    with open(out_path, "w") as f:
        f.write(f"""# VDM — the reference-default sampler, measured end-to-end on TPU

Device: {dev.device_kind}. REAL `Jen1.generate(use_gdm=False,
sampler_mode='scan')` — the reference's DEFAULT generate() path
(/root/reference/generation.py:76 selects VDM when use_gdm is False) — full
UNet (bf16 weight storage, weights as program ARGUMENTS) + T5 conditioner +
{steps}-step whole-loop VDM scan + chunked codec decode + device-side int16,
random weights (timing is value-independent). Walls include the
device->host fetch round-trip.

Round-4 context: this path was recorded as "cannot compile through the
tunnel (>1600 s)" with only a 0.27x-realtime stepwise fallback. Triage
(benchmarks/vdm_gdm_probe.py) showed the r4 compile deaths were the
closure-captured-weights StableHLO-literal bug (0.7+ GB modules), probed
before the weights-as-arguments fix reached generate(); the VDM scan
itself compiles in the normal class and there is NO VDM-specific XLA
pathology (on XLA:CPU it compiles FASTER than GDM: 25 s vs 35 s).

| B | rng | cold (compile + first clip) | warm wall/batch | throughput |
|---|---|---|---|---|
""")
        for B, rng_impl, cold, best, thr in rows:
            f.write(f"| {B} | {rng_impl} | {cold:.0f} s | {best:.3f} s | "
                    f"{thr:.1f} audio-s/s/chip |\n")
        f.write(f"""
Reproduce: `JEN1_VDM_BENCH_BATCHES={','.join(str(b) for b in batches)} """
                f"""JEN1_VDM_BENCH_RNGS={','.join(rngs)} python benchmarks/vdm_e2e_bench.py`
""")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
