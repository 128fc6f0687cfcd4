"""Omnidirectional 1-D convolutions, channels-last (B, L, C).

The reference's core "omnidirectional" mechanism is a conv factory whose
modules take a runtime `causal` flag: pad (k-1)*d on the left when causal,
else (k-1)*d // 2 on both sides (reference: jen1/model/blocks.py:34-53).
Here `causal` is a *static* Python bool: under jit each value traces its own
graph, so the three training tasks compile into exactly two UNet variants —
a compile-time branch instead of a runtime one (SURVEY §7 hard-part 3).

All convs run on the MXU via lax.conv_general_dilated with NWC layout
(channels on the TPU lane dimension) and fp32 accumulation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from jen1_tpu.ops.initializers import torch_bias_init, torch_kernel_init

_DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def matmul_precision(dtype) -> lax.Precision:
    """fp32 inputs get exact fp32 contraction (XLA's DEFAULT lowers fp32
    matmul/conv to faster-but-inexact multi-pass bf16 on TPU/CPU); bf16 inputs
    use the native MXU path."""
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    causal: bool = False,
) -> jnp.ndarray:
    """x: (B, L, Cin); kernel: (K, Cin, Cout). Returns (B, L', Cout).

    Padding matches the reference Conv1d exactly: total (K-1)*dilation, all on
    the left if causal, else split `pad//2` on each side (note: for even pads
    this is symmetric; the reference ignores its constructor `padding` arg).

    JEN1_CONV_IMPL=dot routes stride-1 convs through K shifted dot_generals
    instead of lax.conv (an MFU experiment: XLA lowers TPU convs itself, but
    an explicit matmul decomposition can fuse differently). Identical math;
    parity-tested in tests/test_ops.py.
    """
    k = kernel.shape[0]
    pad = (k - 1) * dilation
    pads = (pad, 0) if causal else (pad // 2, pad // 2)
    dtype = x.dtype
    if _conv_impl() == "dot" and stride == 1:
        return _conv1d_dot(x, kernel, bias, dilation=dilation, pads=pads)
    y = lax.conv_general_dilated(
        x,
        kernel.astype(dtype),
        window_strides=(stride,),
        padding=[pads],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMENSION_NUMBERS,
        precision=matmul_precision(dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def _conv_impl() -> str:
    import os

    return os.environ.get("JEN1_CONV_IMPL", "xla")


def _conv1d_dot(x, kernel, bias, *, dilation: int, pads) -> jnp.ndarray:
    """Stride-1 conv as K shifted (B*L, Cin) @ (Cin, Cout) matmuls summed in
    fp32 — each tap is one large MXU-shaped dot_general; no im2col copy."""
    k, cin, cout = kernel.shape
    dtype = x.dtype
    b, l, _ = x.shape
    xp = jnp.pad(x, ((0, 0), pads, (0, 0)))
    kern = kernel.astype(dtype)
    prec = matmul_precision(dtype)
    y = None
    for tap in range(k):
        xs = lax.dynamic_slice_in_dim(xp, tap * dilation, l, axis=1)
        t = lax.dot_general(
            xs, kern[tap],
            (((2,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )
        y = t if y is None else y + t
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def conv_transpose1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int,
    padding: int,
    output_padding: int = 0,
) -> jnp.ndarray:
    """torch-semantics ConvTranspose1d in channels-last.

    x: (B, L, Cin); kernel: (K, Cin, Cout).
    out_len = (L-1)*stride - 2*padding + K + output_padding.

    Implemented as an input-dilated (fractionally-strided) convolution with a
    spatially flipped kernel — the standard XLA lowering, which maps onto the
    MXU the same way a forward conv does.
    """
    k = kernel.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    dtype = x.dtype
    y = lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0).astype(dtype),
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMENSION_NUMBERS,
        precision=matmul_precision(dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class OmniConv1d(nn.Module):
    """Conv1d with the omnidirectional causal/bidirectional padding rule.

    Mirrors the reference Conv1d factory (blocks.py:34-53): the constructor's
    nominal padding is ignored; padding is derived from kernel_size/dilation
    and the `causal` call-time flag.
    """

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_kernel_init(fan_in_axes=(0, 1)),
            (self.kernel_size, in_channels, self.out_channels),
        )
        bias = (
            self.param(
                "bias",
                torch_bias_init(in_channels * self.kernel_size),
                (self.out_channels,),
            )
            if self.use_bias
            else None
        )
        # int8 weight-only inference fast path: when the caller supplies a
        # 'qweights' collection (parallel/quantize.py quantize_conv_params),
        # stride-1 convs read int8 weights + per-channel scales and run the
        # dequant-in-VMEM Pallas matmul — halving the HBM weight traffic
        # that bounds the denoiser loop (benchmarks/INT8_WEIGHTS_TPU.md:
        # the XLA int8 path measures 1.00x because XLA materializes the
        # dequantized tensor). Training and default inference are unchanged.
        if self.stride == 1 and self.has_variable("qweights", "kernel8"):
            from jen1_tpu.ops.int8_matmul import conv1d_int8w

            w8 = self.get_variable("qweights", "kernel8")
            scale = self.get_variable("qweights", "scale")
            return conv1d_int8w(
                x, w8, scale, bias, dilation=self.dilation, causal=causal
            )
        return conv1d(
            x,
            kernel,
            bias,
            stride=self.stride,
            dilation=self.dilation,
            causal=causal,
        )


class Downsample1d(nn.Module):
    """Strided omnidirectional conv; kernel = factor*kernel_multiplier + 1.

    Reference: blocks.py:55-66. With odd kernels the bidirectional padding is
    symmetric and output length is exactly L/factor for divisible L.
    """

    out_channels: int
    factor: int
    kernel_multiplier: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
        assert self.kernel_multiplier % 2 == 0, "kernel multiplier must be even"
        conv = OmniConv1d(
            out_channels=self.out_channels,
            kernel_size=self.factor * self.kernel_multiplier + 1,
            stride=self.factor,
            name="conv",
        )
        return conv(x, causal=causal)


class Upsample1d(nn.Module):
    """Upsampling block. Reference: blocks.py:69-95.

    factor == 1           -> plain conv k=3 (symmetric padding, causal-ignorant,
                             as in the reference which uses bare nn.Conv1d here)
    use_nearest           -> nearest-neighbor repeat + conv k=3
    otherwise             -> transposed conv k=2*factor, stride=factor
    The reference never threads `causal` into upsampling; replicated here.
    """

    out_channels: int
    factor: int
    use_nearest: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        if self.factor == 1 or self.use_nearest:
            if self.factor > 1:
                x = jnp.repeat(x, self.factor, axis=1)
            kernel = self.param(
                "kernel",
                torch_kernel_init(fan_in_axes=(0, 1)),
                (3, in_channels, self.out_channels),
            )
            bias = self.param(
                "bias", torch_bias_init(in_channels * 3), (self.out_channels,)
            )
            return conv1d(x, kernel, bias, stride=1, causal=False)

        k = self.factor * 2
        kernel = self.param(
            "kernel",
            torch_kernel_init(fan_in_axes=(0, 1)),
            (k, in_channels, self.out_channels),
        )
        bias = self.param(
            "bias", torch_bias_init(in_channels * k), (self.out_channels,)
        )
        return conv_transpose1d(
            x,
            kernel,
            bias,
            stride=self.factor,
            padding=self.factor // 2 + self.factor % 2,
            output_padding=self.factor % 2,
        )


def center_crop_to_match(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Static center-crop along the length axis (axis=1).

    TPU-native replacement for the reference's runtime crop() reconciliation
    (utils/module.py:186-204): lengths are static under jit, so the crop
    amounts are plain Python ints computed at trace time.
    """
    cur = x.shape[1]
    if cur == target_len:
        return x
    assert cur > target_len, f"cannot crop {cur} up to {target_len}"
    diff = cur - target_len
    start = diff // 2
    return lax.slice_in_dim(x, start, start + target_len, axis=1)
