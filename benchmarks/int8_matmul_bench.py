"""Real-TPU microbenchmark: int8-weight Pallas matmul vs XLA bf16 matmul.

Shapes are the JEN-1 UNet's deep-level `project` convs after im2col
(B=2 CFG-doubled, k=3), where ~90% of the weights live:

  level          L     Cin   Cout   ->  M=2L    K=3Cin   N=Cout
  downsample7    141   1024  1024       282     3072     1024
  down8/bottl.   70    2048  1024/2048  140     6144     1024
  upsample0/1    141   2048  2048       282     6144     2048

At these shapes the matmul is weight-read bound (M is tiny), so halving the
weight bytes should approach 2x. Timing: min-of-10 walls of a 30-apply
on-device chain / 30 (single-op walls are swamped by the ~34 ms tunnel
round-trip — benchmarks/b1_math_slope.py).

Run: python benchmarks/int8_matmul_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

def _chain(f, reps):
    @jax.jit
    def chain(x):
        def body(carry, _):
            y = f(carry)
            # fold a scalar of the output back so reps serialize
            dep = (jnp.sum(y.astype(jnp.float32)) * 1e-9).astype(carry.dtype)
            return carry + dep, 0

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    return chain


def chain_wall(f, x0, n=10, r_lo=30, r_hi=330):
    """True per-application cost via the SLOPE between a short and a long
    on-device chain — the ~27-34 ms fixed tunnel round-trip cancels."""
    lo, hi = _chain(f, r_lo), _chain(f, r_hi)
    float(lo(x0)), float(hi(x0))  # compile + warm
    best_lo = best_hi = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(lo(x0))
        best_lo = min(best_lo, time.time() - t0)
        t0 = time.time()
        float(hi(x0))
        best_hi = min(best_hi, time.time() - t0)
    return (best_hi - best_lo) / (r_hi - r_lo)


def main():
    from jen1_tpu.ops.int8_matmul import matmul_int8w, quantize_weight

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    rng = np.random.default_rng(0)
    rows = []
    for (m, k, n) in [(282, 3072, 1024), (140, 6144, 1024),
                      (282, 6144, 2048), (512, 6144, 2048)]:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
        w8, s = quantize_weight(w)
        wb = w.astype(jnp.bfloat16)

        t_xla = chain_wall(lambda a: jnp.dot(
            a, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16), x)
        t_pl = chain_wall(lambda a: matmul_int8w(
            a, w8, s, out_dtype=jnp.bfloat16), x)
        weight_floor_bf16 = k * n * 2 / 819e9
        weight_floor_int8 = k * n * 1 / 819e9
        rows.append((m, k, n, t_xla, t_pl))
        print(
            f"M={m} K={k} N={n}: XLA bf16 {t_xla * 1e6:.0f}us "
            f"(floor {weight_floor_bf16 * 1e6:.0f}us) | Pallas int8 "
            f"{t_pl * 1e6:.0f}us (floor {weight_floor_int8 * 1e6:.0f}us) | "
            f"speedup {t_xla / t_pl:.2f}x", flush=True,
        )


if __name__ == "__main__":
    main()
