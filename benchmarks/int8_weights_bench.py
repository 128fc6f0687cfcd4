"""Int8 weight-only inference experiment (real TPU).

The B=1 sampler is weights-read bound (~600 MB bf16 per CFG forward vs
33 GFLOP). Weight-only int8 halves the bytes IF XLA reads the int8 tensors
and fuses dequant (convert+scale) into each consumer instead of
materializing a bf16 copy. Inside a lax.scan the dequant of a closure
constant is loop-invariant and WILL be hoisted (one materialization — no
gain, no loss); jax.lax.optimization_barrier inside the body blocks the
hoist so every step re-reads int8.

This script measures, flagship shape (B=1, L=4500, CFG-doubled):
  1. single forward, bf16 weights           (baseline)
  2. single forward, int8+dequant weights   (fusion probe)
  3. 20-step scan, bf16 weights             (loop baseline)
  4. 20-step scan, int8+barrier dequant     (the real question)
plus max|rel| output drift of (2) vs (1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jen1_tpu.config import Config
from jen1_tpu.models.unet import unet_from_model_config
from jen1_tpu.utils.compile_cache import enable_compile_cache

STEPS = 20


def quantize(params):
    """Per-leaf symmetric int8 over the last axis (output features) for
    matmul/conv kernels; small tensors (biases, norms) stay bf16."""

    def q(leaf):
        if leaf.ndim >= 2 and leaf.size > 4096:
            axes = tuple(range(leaf.ndim - 1))
            scale = jnp.max(jnp.abs(leaf), axis=axes, keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-12)
            qv = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
            return {"q": qv, "scale": scale.astype(jnp.bfloat16)}
        return leaf.astype(jnp.bfloat16)

    return jax.tree.map(q, params)


def dequantize(qparams, barrier=False):
    def dq(leaf):
        if isinstance(leaf, dict) and "q" in leaf:
            qv, scale = leaf["q"], leaf["scale"]
            if barrier:
                qv = jax.lax.optimization_barrier(qv)
            return qv.astype(jnp.bfloat16) * scale
        return leaf

    return jax.tree.map(dq, qparams, is_leaf=lambda x: isinstance(x, dict) and "q" in x)


def main():
    enable_compile_cache()
    cfg = Config()
    mc = cfg.model_config
    model = unet_from_model_config(mc)
    B, L = 1, 4500
    M, E, C = (mc.context_embedding_max_length, mc.context_embedding_features,
               mc.in_channels)
    x = jnp.zeros((B, L, C), jnp.bfloat16)
    t = jnp.zeros((B,), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, M, E), jnp.bfloat16)
    mask = jnp.ones((B, M), bool)
    concat = jnp.zeros((B, L, C + 1), jnp.bfloat16)

    shapes = jax.eval_shape(
        lambda r: model.init(r, x, t, embedding=emb, embedding_mask=mask,
                             channels_list=[concat], causal=False),
        jax.random.PRNGKey(0),
    )
    params = jax.tree.map(
        lambda s: jax.random.normal(jax.random.PRNGKey(hash(s.shape) % 2**31),
                                    s.shape, jnp.float32) * 0.02, shapes)
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    qparams = quantize(params)
    jax.block_until_ready((params_bf16, qparams))
    n_bytes_bf16 = sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(params_bf16))
    n_bytes_q = sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(qparams))
    print(f"weights: bf16={n_bytes_bf16 / 1e6:.0f} MB  int8-pack={n_bytes_q / 1e6:.0f} MB")

    def fwd(p, xx, rng_x):
        return model.apply(
            p, xx + rng_x, t, embedding=emb, embedding_mask=mask,
            channels_list=[concat], embedding_scale=0.8, batch_cfg=True,
            scale_cfg=True, causal=False,
        )

    checksum = jax.jit(jnp.sum)

    def timed(label, fn, *args):
        t0 = time.time()
        out = fn(*args)
        float(checksum(out))
        compile_s = time.time() - t0
        walls = []
        for i in range(5):
            t0 = time.time()
            float(checksum(fn(*args, seed=i)))
            walls.append(time.time() - t0)
        best = min(walls)
        print(f"{label:34s} best={best * 1e3:8.2f} ms (compile={compile_s:.0f}s)")
        return best, out

    # single forwards -----------------------------------------------------
    f_bf16 = jax.jit(lambda p, seed=0: fwd(
        p, x, jax.random.normal(jax.random.PRNGKey(seed), x.shape, x.dtype)))
    f_int8 = jax.jit(lambda qp, seed=0: fwd(
        dequantize(qp), x,
        jax.random.normal(jax.random.PRNGKey(seed), x.shape, x.dtype)))
    b1, out_b = timed("forward bf16", f_bf16, params_bf16)
    b2, out_q = timed("forward int8-dequant", f_int8, qparams)
    drift = float(jnp.max(jnp.abs(out_b.astype(jnp.float32) -
                                  out_q.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(out_b.astype(jnp.float32))))
    print(f"int8 output drift: max|err|={drift:.4f} vs max|out|={ref:.4f}")

    # scans ---------------------------------------------------------------
    def scan_fwd(p, barrier, seed=0):
        def body(carry, i):
            pp = dequantize(p, barrier=barrier) if barrier is not None else p
            out = model.apply(
                pp, carry, t + i.astype(jnp.float32), embedding=emb,
                embedding_mask=mask, channels_list=[concat],
                embedding_scale=0.8, batch_cfg=True, scale_cfg=True,
                causal=False,
            )
            return out.astype(carry.dtype), 0

        x0 = jax.random.normal(jax.random.PRNGKey(seed), x.shape, x.dtype)
        y, _ = jax.lax.scan(body, x0, jnp.arange(STEPS))
        return y

    s_bf16 = jax.jit(lambda p, seed=0: scan_fwd(p, None, seed))
    s_int8 = jax.jit(lambda qp, seed=0: scan_fwd(qp, True, seed))
    t1, _ = timed(f"scan x{STEPS} bf16", s_bf16, params_bf16)
    t2, _ = timed(f"scan x{STEPS} int8-barrier", s_int8, qparams)
    print(f"per-step: bf16={t1 / STEPS * 1e3:.2f} ms  int8={t2 / STEPS * 1e3:.2f} ms "
          f"speedup={t1 / t2:.2f}x")


if __name__ == "__main__":
    main()
