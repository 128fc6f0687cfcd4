"""Pallas TPU flash attention — blockwise online-softmax attention.

Replaces the reference's F.scaled_dot_product_attention flash path
(jen1/model/blocks.py:341-353,376-377) with a TPU kernel. Used for long
sequences (long-form/Composer-scale generation) where the O(N^2) scores
matrix stops fitting in VMEM; for the short UNet sequences the XLA path in
ops/attention.py is already near roofline and remains the default
(dispatch: ops/attention.py Attention.__call__).

Kernel layout (per pallas_guide.md):
  grid = (B*H, N/block_q); each program holds one q tile in VMEM plus the
  full K/V for its (batch, head) slice, and streams K/V tiles through the
  MXU with the standard online-softmax recurrence (m, l, acc in fp32).
  Causal programs stop at the diagonal block and apply an intra-block mask.

Backward is a recompute-based custom VJP in plain XLA (exact, fp32) — a
fused Pallas backward is a later optimization; training uses short
sequences where the XLA path is used anyway.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, *, block_q: int, block_k: int, causal: bool,
    sm_scale: float, valid_n: int,
):
    # q_ref: (1, block_q, D); k_ref/v_ref: (1, N, D); o_ref: (1, block_q, D)
    # valid_n: real sequence length; key columns >= valid_n are padding and
    # masked out (query rows >= valid_n produce garbage that the caller
    # slices off).
    qi = pl.program_id(1)
    n = k_ref.shape[1]
    d = q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32)  # (block_q, D)

    num_kb = n // block_k
    if causal:
        # only blocks whose start <= last query index of this tile
        last_q = (qi + 1) * block_q - 1
        num_kb_live = jnp.minimum(num_kb, (last_q // block_k) + 1)
    else:
        num_kb_live = num_kb

    mask_pad = valid_n < n

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )  # (block_q, block_k)
        if causal or mask_pad:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            ok = jnp.ones((block_q, block_k), bool)
            if causal:
                ok &= (qi * block_q + rows) >= (kb * block_k + cols)
            if mask_pad:
                ok &= (kb * block_k + cols) < valid_n
            s = jnp.where(ok, s, jnp.finfo(jnp.float32).min)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((block_q,), jnp.finfo(jnp.float32).min, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb_live, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _pick_block(n: int, candidates=(512, 256, 128)) -> int:
    """Largest block size; n is PADDED up to a multiple (r1 VERDICT #4: the
    old divisibility requirement made e.g. n=4500 unsupported)."""
    for c in candidates:
        if n >= c:
            return c
    return candidates[-1]


def _flash_forward(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool
) -> jnp.ndarray:
    b, h, n, d = q.shape
    block_q = _pick_block(n)
    block_k = min(block_q, 512)
    n_pad = -(-n // block_q) * block_q
    sm_scale = d**-0.5
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf, kf, vf = (jnp.pad(a, pad) for a in (qf, kf, vf))

    kernel = functools.partial(
        _fwd_kernel, block_q=block_q, block_k=block_k, causal=causal,
        sm_scale=sm_scale, valid_n=n,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        # Mosaic compiles on TPU; everywhere else (CPU tests) interpret.
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    return out[:, :n].reshape(b, h, n, d)


def flash_attention_supported(n: int, d: int) -> bool:
    return n >= 128 and d <= 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool = False
) -> jnp.ndarray:
    """q, k, v: (B, H, N, D); self-attention (N == M). Returns (B, H, N, D)."""
    if not flash_attention_supported(q.shape[2], q.shape[3]):
        from jen1_tpu.ops.attention import dot_product_attention

        return dot_product_attention(q, k, v, causal=causal)
    return _flash_forward(q, k, v, causal)


def _fwd(q, k, v, causal):
    return flash_attention(q, k, v, causal), (q, k, v)


def _bwd(causal, res, g):
    # Exact recompute backward in fp32 XLA (memory: O(N^2) scores — fine for
    # the training sequence lengths where this path is reachable).
    q, k, v = res
    dtype = q.dtype
    d = q.shape[-1]
    scale = d**-0.5
    qf, kf, vf = (a.astype(jnp.float32) for a in (q, k, v))
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale
    if causal:
        n, m = s.shape[-2], s.shape[-1]
        mask = jnp.arange(m)[None, :] <= jnp.arange(n)[:, None] + (m - n)
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, kf) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, qf) * scale
    return dq.astype(dtype), dk.astype(dtype), dv.astype(dtype)


flash_attention.defvjp(_fwd, _bwd)
