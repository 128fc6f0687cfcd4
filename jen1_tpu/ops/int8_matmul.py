"""Pallas TPU matmul with int8 weights dequantized in VMEM.

Why this exists: the JEN-1 denoiser is weight-read bound at inference
(~33 GFLOP but ~600 MB of bf16 weights per CFG forward; README perf notes),
and XLA cannot help — an int8 weight-only path expressed in XLA materializes
the dequantized bf16 tensor in HBM before the conv, so HBM traffic is
unchanged (measured 1.00x, benchmarks/INT8_WEIGHTS_TPU.md). The only way to
halve the weight traffic is a kernel that reads int8 from HBM and dequantizes
tile-by-tile in VMEM on the way into the MXU — this kernel.

Scope: weight-only symmetric per-output-channel quantization
(w ~ w8 * scale[n], scale = max|w[:, n]| / 127). Activations stay bf16; the
MXU contraction runs bf16 x bf16 -> fp32; the scale is folded in AFTER the
accumulation (mathematically identical to dequantize-then-matmul). Intended
for the deep UNet levels where ~90% of the weights live (param census in
benchmarks/B1_INFERENCE_TPU.md); used via ops/conv.py's qweights path.

Kernel layout (pallas_guide.md matmul pattern): grid (M/bm, N/bn, K/bk),
k innermost; fp32 accumulator in VMEM scratch, zeroed at k==0, scaled and
written out at k==nk-1. Inputs are padded to block multiples by the caller
wrapper (zero rows/cols contribute zeros to the accumulator).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w: (..., N) float -> (int8 same shape, fp32 scale (N,)).

    Symmetric per-output-channel: scale[n] = max|w[..., n]| / 127.
    """
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale.astype(jnp.float32)


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int, bk: int):
    # x_ref: (bm, K) — the FULL K extent, resident in VMEM across the whole
    # (n, k) sweep (its block index is constant in j/kk, so Mosaic skips the
    # recopy); only the int8 weights stream from HBM. Every extra pass over
    # the weights is the thing this kernel exists to avoid.
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[:, pl.ds(kk * bk, bk)]  # (bm, bk) bf16
    wb = w_ref[...].astype(jnp.bfloat16)  # int8 -> bf16 dequant in VMEM
    acc_ref[...] += jax.lax.dot(
        xb, wb, preferred_element_type=jnp.float32
    )

    @pl.when(kk == nk - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _pick(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0  # caller pads


def _pad_to(a: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = a.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return a
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(a, pads)


def matmul_int8w(
    x: jnp.ndarray,
    w8: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """x: (M, K) bf16/f32; w8: (K, N) int8; scale: (N,) f32 -> (M, N).

    Computes (x @ w8) * scale — identical to x @ (w8 * scale) by
    distributivity, with the scale applied to the fp32 accumulator.
    """
    m, k = x.shape
    k2, n = w8.shape
    assert k == k2 and scale.shape == (n,), (x.shape, w8.shape, scale.shape)

    # bm: ONE m-block whenever M (padded to the 128 sublane multiple) fits
    # VMEM — every extra m-block re-reads the ENTIRE weight matrix, which
    # defeats the point at the deep-UNet shapes (M = 140-560, weights
    # dominant). 512x512 bf16 x-tile = 512 KB; fine.
    m_pad = -(-m // 128) * 128
    bm = m_pad if m_pad <= 512 else (_pick(m_pad, (512, 256, 128)) or 256)
    bk = _pick(k, (512, 256, 128)) or 128
    bn = _pick(n, (512, 256, 128)) or 128

    xp = _pad_to(_pad_to(x.astype(jnp.bfloat16), 0, bm), 1, bk)
    wp = _pad_to(_pad_to(w8, 0, bk), 1, bn)
    sp = _pad_to(scale.reshape(1, n), 1, bn)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // bk

    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, bk=bk),
        grid=(mp // bm, np_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        # Mosaic compiles on TPU; everywhere else (CPU tests) interpret.
        interpret=jax.default_backend() != "tpu",
    )(xp, wp, sp)
    return out[:m, :n]


def quantize_conv_params(
    variables,
    *,
    min_weight_bytes: int = 4 << 20,
    min_weight_bytes_k1: int = 1 << 20,
):
    """Build the 'qweights' collection for int8-weight inference.

    variables: the model variables dict ({'params': tree}) or the params
    tree itself. Returns a tree mirroring the params structure where every
    ELIGIBLE conv kernel scope gets {'kernel8': int8, 'scale': f32}; pass it
    as model.apply({'params': params, 'qweights': q}, ...). Modules that
    don't read their entry (stride>1 convs, transpose convs) simply ignore
    it — jax prunes unread inputs from the compiled program.

    Eligibility is traffic-aware: k>1 convs pay an im2col that re-reads the
    activations k times, so they only win when the weight tensor dominates
    (>= min_weight_bytes bf16 — the deep-level 1024/2048-channel projects);
    k==1 convs have no im2col cost and use the lower threshold. Census:
    these thresholds cover ~75% of the UNet's 303 M params
    (benchmarks/B1_INFERENCE_TPU.md).
    """
    params = variables.get("params", variables) if isinstance(variables, dict) else variables

    def walk(node):
        out = {}
        for name, child in node.items():
            if isinstance(child, dict):
                sub = walk(child)
                if sub:
                    out[name] = sub
        kern = node.get("kernel")
        if kern is not None and getattr(kern, "ndim", 0) == 3:
            k = kern.shape[0]
            nbytes = kern.size * 2  # bf16 read cost in the fp path
            thresh = min_weight_bytes_k1 if k == 1 else min_weight_bytes
            if nbytes >= thresh:
                w8, scale = quantize_weight(
                    jnp.asarray(kern).reshape(-1, kern.shape[-1])
                )
                out["kernel8"] = w8.reshape(kern.shape)
                out["scale"] = scale
        return out

    return walk(params)


def conv1d_int8w(
    x: jnp.ndarray,
    w8: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    dilation: int = 1,
    causal: bool = False,
) -> jnp.ndarray:
    """Stride-1 conv1d with int8 weights, as im2col + matmul_int8w.

    x: (B, L, Cin); w8: (k, Cin, Cout) int8; scale: (Cout,) f32.
    Same padding semantics as ops/conv.py conv1d. The im2col concat reads
    the (small, deep-level) activations k times; the weights — the dominant
    traffic at these levels — are read once, as int8.
    """
    b, l, cin = x.shape
    k, cin2, cout = w8.shape
    assert cin == cin2
    pad = (k - 1) * dilation
    pads = (pad, 0) if causal else (pad // 2, pad // 2)
    dtype = x.dtype
    if k == 1:
        cols = x.reshape(b * l, cin)
        out_l = l
    else:
        xpad = jnp.pad(x, ((0, 0), pads, (0, 0)))
        out_l = xpad.shape[1] - (k - 1) * dilation
        cols = jnp.concatenate(
            [
                jax.lax.dynamic_slice_in_dim(xpad, t * dilation, out_l, axis=1)
                for t in range(k)
            ],
            axis=-1,
        ).reshape(b * out_l, k * cin)
    y = matmul_int8w(
        cols.astype(jnp.bfloat16),
        w8.reshape(k * cin, cout),
        scale,
        out_dtype=jnp.float32,
    )
    y = y.reshape(b, out_l, cout)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
