"""Codec encode: whole-clip vs chunked — real-TPU benchmark.

The encode-direction mirror of decode_bench.py: whole-clip encode of T
samples is serialized by the encoder LSTM (T/hop sequential scan steps);
`encode_latent_chunked` encodes 150-frame (1 s) chunks as ONE batched
encoder call + triangular latent overlap-add (+ frame-local RVQ on the
stitched latent). On the inference path this is what inpainting /
continuation pay to embed `init_audio`; offline it is the `jen1-preprocess`
hot loop.

Run: python benchmarks/encode_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def wall(fn, *args, n=5):
    s = jax.jit(lambda o: jnp.sum(jnp.asarray(o, jnp.float32)))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(s(fn(*args)))
        best = min(best, time.time() - t0)
    return best


def main():
    from jen1_tpu.codec.model import EncodecModel, encodec_48khz_config
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    codec = EncodecModel(encodec_48khz_config())
    sr = codec.config.sample_rate
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    rows = []
    rng = np.random.default_rng(0)
    for seconds in (10, 30):
        audio = jnp.asarray(
            rng.standard_normal((1, seconds * sr, 2)) * 0.1, jnp.float32
        )
        t0 = time.time()
        w_whole = wall(codec.encode_latent, audio)
        print(f"whole {seconds}s: compile+5 runs {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        w_chunk = wall(codec.encode_latent_chunked, audio)
        print(f"chunked {seconds}s: compile+5 runs {time.time() - t0:.1f}s",
              flush=True)
        rows.append((seconds, w_whole, w_chunk))
        print(
            f"| {seconds} s | whole {w_whole * 1e3:.2f} ms "
            f"({seconds / w_whole:.1f} audio-s/s) | chunked "
            f"{w_chunk * 1e3:.2f} ms ({seconds / w_chunk:.1f} audio-s/s) | "
            f"{w_whole / w_chunk:.2f}x |", flush=True,
        )


if __name__ == "__main__":
    main()
