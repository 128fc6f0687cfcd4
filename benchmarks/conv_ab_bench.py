"""A/B the conv lowering at the flagship train batch (VERDICT r3 next-#5).

TRAIN_STEP_TPU.md's scaling fit puts ~2.7 ms/batch-element of compute at
B=96 — conv-dominated (the UNet is conv-heavy and memory-bound). The
JEN1_CONV_IMPL=dot rewrite (ops/conv.py: stride-1 convs as K shifted
dot_generals) exists and is parity-tested; this measures both lowerings at
the same point by delegating to train_step_bench.bench_point (full
multi-task train step, B elements of 10 s latents, remat off, fused AdamW,
honest loss-fetch timing — identical methodology to the v3 table).

Run: python benchmarks/conv_ab_bench.py    [JEN1_CONV_AB_B=96]
Appends a section to benchmarks/TRAIN_STEP_TPU.md.
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
    B = int(os.environ.get("JEN1_CONV_AB_B", "96"))
    print(f"device: {dev.device_kind} B={B}", flush=True)
    rows = []
    for impl in os.environ.get("JEN1_CONV_AB_IMPLS", "xla,dot").split(","):
        # read at trace time (ops/conv.py _conv_impl); a fresh trainer per
        # bench_point call means each impl gets its own traced program
        os.environ["JEN1_CONV_IMPL"] = impl
        print(f"--- impl={impl}", flush=True)
        r = bench_point(B, remat=False, fused=True)
        r["impl"] = impl
        print(r, flush=True)
        rows.append(r)

    out = os.path.join(os.path.dirname(__file__), "TRAIN_STEP_TPU.md")
    ok = [r for r in rows if "best_s" in r]
    with open(out, "a") as f:
        f.write(f"""
## v4 — conv lowering A/B at B={B} (JEN1_CONV_IMPL)

Same step as the v3 row (remat off, fused AdamW, honest loss-fetch walls),
two conv lowerings: XLA's own `lax.conv_general_dilated` vs K shifted
dot_generals (`ops/conv.py _conv1d_dot`; parity-tested):

| impl | compile | s/step | audio-s trained /s/chip | MFU |
|---|---|---|---|---|
""")
        for r in rows:
            if "best_s" not in r:
                f.write(f"| {r['impl']} | — | — | — | {r.get('oom')} |\n")
                continue
            mfu = f"{r['mfu']:.3f}" if r.get("mfu") else "—"
            f.write(f"| {r['impl']} | {r['compile_s']:.0f} s "
                    f"| {r['best_s']:.3f} | {r['audio_s_per_s']:.0f} "
                    f"| {mfu} |\n")
        if len(ok) == 2:
            ratio = ok[1]["best_s"] / ok[0]["best_s"]
            f.write(f"\ndot/xla step-time ratio: {ratio:.3f} (dot is "
                    f"{'slower' if ratio > 1 else 'faster'} by "
                    f"{abs(ratio - 1) * 100:.1f}%)\n")
        f.write(f"\nReproduce: `JEN1_CONV_AB_B={B} python "
                f"benchmarks/conv_ab_bench.py`\n")
    print(f"appended to {out}", flush=True)


if __name__ == "__main__":
    main()
