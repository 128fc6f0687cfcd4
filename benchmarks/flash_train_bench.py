"""Flash attention UNDER GRAD: long-window train step, Pallas vs XLA
(VERDICT r3 next-#8).

The streamed-K/V Pallas kernel and its recompute backward
(ops/flash_attention.py) are parity-tested and measured forward-only to
N=45k, but the flagship 10 s training window's level-1 attention is
N=375 — below flash_min_seq_len=1024 — so no shipped TRAIN path ever ran
the Pallas backward. This bench trains on long windows where it engages:

  * 60 s window  (L=9000,  level-1 N=2250): both lowerings fit -> honest A/B
    of the full train step (fwd + Pallas/XLA attention backward + fused
    AdamW), identical methodology to TRAIN_STEP_TPU.md (honest loss-fetch
    walls, remat off).
  * 120 s window (L=18000, level-1 N=4500): flash 2.9x on steady state —
    with both causal variants resident, XLA's materialized (B,H,N,N)
    scores degrade every step 3x; the Pallas kernel is unaffected.
    (240 s / N=9000 does not compile on this host: the axon remote
    compile helper is SIGKILLed for BOTH lowerings — host-side memory,
    same wall as the 5-min sampling scan.)

B must be a multiple of the task count (3: text_guided / inpaint /
continuation — trainer.py asserts divisibility).

Run: python benchmarks/flash_train_bench.py
     [JEN1_FLASH_TRAIN_POINTS="60:6,240:3" seconds:batch]
Appends a section to benchmarks/FLASH_E2E_TPU.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from benchmarks.train_step_bench import bench_point

    dev = jax.devices()[0]
    points = [
        (float(p.split(":")[0]), int(p.split(":")[1]))
        for p in os.environ.get(
            "JEN1_FLASH_TRAIN_POINTS", "60:6,120:3").split(",")
    ]
    print(f"device: {dev.device_kind} points={points}", flush=True)
    rows = []
    for seconds, B in points:
        for flash in ("on", "off"):
            os.environ["JEN1_TRAIN_BENCH_FLASH"] = flash
            label = f"{seconds:.0f}s B={B} flash={flash}"
            print(f"--- {label} (level-1 N={int(seconds * 150 / 4)})",
                  flush=True)
            try:
                r = bench_point(B, remat=False, seconds=seconds, fused=True)
            except Exception as e:  # noqa: BLE001 — OOM is a result here
                r = {"oom": f"{type(e).__name__}"}
            r.update(seconds=seconds, B=B, flash=flash)
            print(r, flush=True)
            rows.append(r)

    out = os.path.join(os.path.dirname(__file__), "FLASH_E2E_TPU.md")
    with open(out, "a") as f:
        f.write("""
## Training with the Pallas backward engaged (long windows)

Full multi-task train step (remat off, fused AdamW, honest loss-fetch
walls) at windows whose level-1 attention length exceeds
flash_min_seq_len=1024, so the streamed-K/V Pallas kernel AND its
recompute backward run under grad — vs the same step with
use_flash_attention=False (XLA's materialized (B,H,N,N) scores):

| window | B | level-1 N | attention | compile | s/step | audio-s trained /s/chip |
|---|---|---|---|---|---|---|
""")
        for r in rows:
            n1 = int(r["seconds"] * 150 / 4)
            att = "Pallas flash" if r["flash"] == "on" else "XLA"
            if "best_s" not in r:
                f.write(f"| {r['seconds']:.0f} s | {r['B']} | {n1} | {att} "
                        f"| — | — | {r.get('oom')} |\n")
                continue
            f.write(f"| {r['seconds']:.0f} s | {r['B']} | {n1} | {att} "
                    f"| {r['compile_s']:.0f} s | {r['best_s']:.3f} "
                    f"| {r['audio_s_per_s']:.0f} |\n")
        f.write("\nReproduce: `python benchmarks/flash_train_bench.py`\n")
    print(f"appended to {out}", flush=True)


if __name__ == "__main__":
    main()
