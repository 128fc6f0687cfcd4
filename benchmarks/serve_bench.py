"""Real-TPU serving benchmark: GenerationService under concurrent load.

Round-1/2 serve tests are hermetic (fake Jen1); this measures the REAL
thing end-to-end on v5e: full-size UNet + T5 text encoding + 100-step DDIM
scan + chunked codec decode behind the static-shape micro-batcher. Random
weights (timing is value-independent); every request is a distinct prompt
with the service-assigned seed so requests co-batch (explicit seeds
deliberately never co-batch — see serve.py).

Reports: warm single-request latency, then N_REQ concurrent requests ->
wall, requests/s, audio-s/s/chip, p50/p95 request latency, batch fill.

Run: python benchmarks/serve_bench.py   [JEN1_SERVE_BENCH_REQS=16]

Compile economics (measured rounds 3-4, axon tunnel): the r3 ">12 min
warm-up" was the VDM scan — generate()'s default diffusion (use_gdm=False)
— whose whole-loop program exceeds the tunnel's ~27-33 min compile limit
with EITHER rng impl (threefry AND rbg both died with `remote_compile:
Broken pipe`). The service now defaults to the GDM DDIM scan
(default_use_gdm=True), the same ~200 s compile class bench.py proves
every round. JEN1_SERVE_BENCH_GDM=0 restores the VDM default (expect the
wall); JEN1_SERVE_BENCH_SAMPLER=stepwise is the no-big-program fallback.
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from jen1_tpu.api.generation import Jen1
    from jen1_tpu.config import Config
    from jen1_tpu.serve import GenerationService

    n_req = int(os.environ.get("JEN1_SERVE_BENCH_REQS", "16"))
    steps = int(os.environ.get("JEN1_SERVE_BENCH_STEPS", "100"))
    seconds = float(os.environ.get("JEN1_SERVE_BENCH_SECONDS", "30"))
    max_batch = int(os.environ.get("JEN1_SERVE_BENCH_MAXBATCH", "4"))
    # 'stepwise' is the fallback for hosts whose remote-compile tunnel drops
    # the whole-loop scan program (measured round 4: >2000 s -> Broken pipe).
    sampler_mode = os.environ.get("JEN1_SERVE_BENCH_SAMPLER", "scan")
    use_gdm = os.environ.get("JEN1_SERVE_BENCH_GDM", "1") == "1"
    rng_impl = os.environ.get("JEN1_SERVE_BENCH_RNG", "rbg")

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} n_req={n_req} steps={steps} "
          f"seconds={seconds} max_batch={max_batch}", flush=True)

    t0 = time.time()
    jen1 = Jen1(ckpt_path=None, config=Config())
    print(f"Jen1 built (random weights) in {time.time() - t0:.0f}s", flush=True)

    svc = GenerationService(
        jen1, max_batch=max_batch, max_wait_ms=100.0,
        default_seconds=seconds, default_steps=steps,
        max_queue=max(32, 2 * n_req), sampler_mode=sampler_mode,
        default_use_gdm=use_gdm, rng_impl=rng_impl,
    )

    # Warm both the max_batch graph (a full batch) and measure a single
    # warm request afterwards.
    t0 = time.time()
    warm_threads = [
        threading.Thread(target=lambda i=i: svc.submit(
            f"warmup prompt {i}", timeout=3600)) for i in range(max_batch)
    ]
    for t in warm_threads:
        t.start()
    for t in warm_threads:
        t.join()
    print(f"warmup (compile + first batch) {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    svc.submit("a single warm request", timeout=600)
    single = time.time() - t0
    print(f"warm single-request latency: {single:.3f}s", flush=True)

    lat = [None] * n_req
    err = []

    def fire(i):
        t1 = time.time()
        try:
            out = svc.submit(f"load prompt {i}", timeout=600)
            assert out.ndim == 2 and np.isfinite(out).all()
            lat[i] = time.time() - t1
        except Exception as e:  # noqa: BLE001
            err.append(repr(e))

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(n_req)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    assert not err, err
    lats = sorted(v for v in lat if v is not None)
    p50 = lats[len(lats) // 2]
    p95 = lats[min(len(lats) - 1, int(0.95 * len(lats)))]
    fill = svc.stats["requests"] / max(
        1, svc.stats["batches"] * max_batch - svc.stats["padded_lanes"] + 1e-9
    )
    print(
        f"{n_req} concurrent requests: wall={wall:.2f}s -> "
        f"{n_req / wall:.2f} req/s, {n_req * seconds / wall:.1f} "
        f"audio-s/s/chip; latency p50={p50:.2f}s p95={p95:.2f}s; "
        f"batches={svc.stats['batches']} padded_lanes="
        f"{svc.stats['padded_lanes']}", flush=True,
    )

    # ---- overload burst: a burst beyond max_queue must shed load with
    # ServiceOverloaded (HTTP layer maps it to 503) while admitted requests
    # still complete. Uses a tiny queue to make shedding immediate.
    from jen1_tpu.serve import ServiceOverloaded

    svc2 = GenerationService(
        jen1, max_batch=max_batch, max_wait_ms=100.0,
        default_seconds=seconds, default_steps=steps, max_queue=4,
        sampler_mode=sampler_mode, default_use_gdm=use_gdm,
        rng_impl=rng_impl,
    )
    burst = 12
    shed, done = [], []

    def burst_fire(i):
        try:
            svc2.submit(f"burst {i}", timeout=600)
            done.append(i)
        except ServiceOverloaded:
            shed.append(i)

    bt = [threading.Thread(target=burst_fire, args=(i,)) for i in range(burst)]
    t0 = time.time()
    for t in bt:
        t.start()
    for t in bt:
        t.join()
    burst_wall = time.time() - t0
    print(f"overload burst {burst} reqs vs max_queue=4: "
          f"{len(shed)} shed (503), {len(done)} served, "
          f"wall={burst_wall:.1f}s", flush=True)
    svc2.close()
    svc.close()

    out = os.path.join(os.path.dirname(__file__), "SERVING_TPU.md")
    with open(out, "w") as f:
        f.write(f"""# Serving — real-TPU load benchmark

Device: {dev.device_kind}. REAL end-to-end path: full-size UNet + T5 text
encoding + {steps}-step {'GDM DDIM' if use_gdm else 'VDM'} sampler (mode:
{sampler_mode}, rng: {rng_impl}) + chunked codec decode behind the
static-shape micro-batcher (`jen1_tpu/serve.py`), random weights (timing is
value-independent). Every request is a distinct prompt with
service-assigned seeds so requests co-batch. The reference has NO serving
story at all.

| metric | value |
|---|---|
| warm single-request latency ({seconds:.0f} s clip) | {single:.2f} s |
| {n_req} concurrent requests wall | {wall:.2f} s |
| throughput | {n_req / wall:.2f} req/s = {n_req * seconds / wall:.1f} audio-s/s/chip |
| request latency p50 / p95 | {p50:.2f} s / {p95:.2f} s |
| batches / padded lanes | {svc.stats['batches']} / {svc.stats['padded_lanes']} |
| overload burst ({burst} reqs, max_queue=4) | {len(shed)} shed with ServiceOverloaded (HTTP 503), {len(done)} served, wall {burst_wall:.1f} s |

Reproduce: `JEN1_SERVE_BENCH_REQS={n_req} JEN1_SERVE_BENCH_STEPS={steps}
JEN1_SERVE_BENCH_MAXBATCH={max_batch} JEN1_SERVE_BENCH_SAMPLER={sampler_mode}
JEN1_SERVE_BENCH_GDM={1 if use_gdm else 0} JEN1_SERVE_BENCH_RNG={rng_impl}
python benchmarks/serve_bench.py`
""")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
