"""Codec decode microbenchmark: whole-clip vs chunked (real TPU).

The EnCodec-48k decoder starts with a 2-layer LSTM at the latent rate: a
30 s clip is a 4500-step sequential lax.scan chain that no amount of MXU
width can hide. `decode_latent_chunked` decodes 150-frame (1 s) chunks as
one batched decoder call + triangular overlap-add — EnCodec's own segmented
semantics (its `segment=1.0, overlap=0.01` config) — cutting the sequential
chain 30x. This script measures both paths.

Usage: python benchmarks/decode_bench.py  (writes DECODE_TPU.md rows to stdout)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jen1_tpu.codec.model import EncodecModel, encodec_48khz_config
from jen1_tpu.utils.compile_cache import enable_compile_cache


def main() -> None:
    enable_compile_cache()
    codec = EncodecModel(encodec_48khz_config())
    B = 1
    print(f"device={jax.devices()[0].device_kind}")
    rows = []
    for seconds in (10, 30):
        F = seconds * 150
        # one z per timed run: identical (executable, args) re-executions can
        # be served from a cache by tunneled runtimes, which reads as
        # impossibly fast walls
        zs = [
            jax.random.normal(jax.random.PRNGKey(i), (B, F, 128), jnp.bfloat16)
            for i in range(6)
        ]
        jax.block_until_ready(zs)

        # Honest walls require fetching a scalar that depends on all output
        # elements: block_until_ready returns in ~0.1 ms for some executables
        # on this tunneled runtime (1000x below the whole-clip decoder's FLOP
        # floor), while sum-fetch walls match the roofline.
        checksum = jax.jit(jnp.sum)

        def timed(fn, label):
            t0 = time.time()
            out = fn(zs[0])
            float(checksum(out))
            compile_s = time.time() - t0
            walls = []
            for i in range(5):
                t0 = time.time()
                float(checksum(fn(zs[1 + i])))
                walls.append(time.time() - t0)
            best = min(walls)
            print(
                f"{label:28s} {seconds:3d}s clip: best={best * 1e3:8.2f} ms "
                f"(compile+1st={compile_s:.1f}s) -> {seconds / best:7.1f} audio_s/s"
            )
            rows.append((label, seconds, best))
            return best

        timed(lambda z: codec.decode_latent(z), "whole-clip")
        timed(lambda z: codec.decode_latent_chunked(z), "chunked-150f")
    print()
    print("| path | clip | wall (ms) | audio-s/s |")
    print("|---|---|---|---|")
    for label, seconds, best in rows:
        print(f"| {label} | {seconds} s | {best * 1e3:.2f} | {seconds / best:.1f} |")


if __name__ == "__main__":
    main()
