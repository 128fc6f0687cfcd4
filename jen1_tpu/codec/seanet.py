"""SEANet encoder/decoder (EnCodec's conv backbone), channels-last JAX.

Architecture per the EnCodec 48 kHz release: n_filters=32, ratios [8,5,4,2]
(encoder downsamples in reversed order 2*4*5*8 = x320 -> 150 fps), one
residual block per stage (kernels [3,1], dilation 1, compress 2, 1x1 conv
shortcut), ELU activations, `time_group_norm` (GroupNorm with one group)
after each conv, 2-layer LSTM with skip connection before the final
projection, kernel 7 at both ends.

Padding follows EnCodec's scheme: total pad = (K-1)*dilation - (stride-1),
split left = total - total//2 pad-right-first for non-causal, all-left for
causal, plus right "extra padding" so the last partial frame is still
produced; reflect pad mode. Transposed convs trim `K - stride` samples
(split across both ends when non-causal).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jen1_tpu.ops.conv import conv1d as _raw_conv1d
from jen1_tpu.ops.conv import conv_transpose1d as _raw_convt1d
from jen1_tpu.ops.initializers import torch_bias_init, torch_kernel_init


def _extra_padding(length: int, k: int, stride: int, padding_total: int) -> int:
    n_frames = (length - k + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k - padding_total)
    return max(ideal - length, 0)


def _pad1d(x: jnp.ndarray, left: int, right: int, mode: str = "reflect"):
    if left == 0 and right == 0:
        return x
    if mode == "reflect":
        l = x.shape[1]
        max_pad = max(left, right)
        extra = 0
        if l <= max_pad:
            # EnCodec zero-extends tiny inputs before reflecting, then trims
            # the extension back off the end (encodec pad1d).
            extra = max_pad - l + 1
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
        y = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
        return y[:, : y.shape[1] - extra] if extra else y
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)))


def valid_conv1d(x, kernel, bias, *, stride=1, dilation=1):
    """VALID (no padding) conv, channels-last."""
    from jax import lax

    from jen1_tpu.ops.conv import matmul_precision

    dtype = x.dtype
    y = lax.conv_general_dilated(
        x,
        kernel.astype(dtype),
        window_strides=(stride,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=matmul_precision(dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class SConv1d(nn.Module):
    """EnCodec SConv1d: explicit padding + VALID conv + optional group norm."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    causal: bool = False
    norm: str = "time_group_norm"
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k, s, d = self.kernel_size, self.stride, self.dilation
        kernel = self.param(
            "kernel", torch_kernel_init(fan_in_axes=(0, 1)), (k, cin, self.out_channels)
        )
        bias = self.param("bias", torch_bias_init(cin * k), (self.out_channels,))

        keff = (k - 1) * d + 1
        padding_total = keff - s
        extra = _extra_padding(x.shape[1], keff, s, padding_total)
        if self.causal:
            x = _pad1d(x, padding_total, extra, self.pad_mode)
        else:
            right = padding_total // 2
            x = _pad1d(x, padding_total - right, right + extra, self.pad_mode)
        y = valid_conv1d(x, kernel, bias, stride=s, dilation=d)
        if self.norm == "time_group_norm":
            from jen1_tpu.ops.norm import GroupNorm

            y = GroupNorm(num_groups=1, name="norm")(y)
        return y


class SConvTranspose1d(nn.Module):
    """EnCodec SConvTranspose1d: transposed conv then trim K - stride."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    causal: bool = False
    norm: str = "time_group_norm"
    trim_right_ratio: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k, s = self.kernel_size, self.stride
        kernel = self.param(
            "kernel", torch_kernel_init(fan_in_axes=(0, 1)), (k, cin, self.out_channels)
        )
        bias = self.param("bias", torch_bias_init(cin), (self.out_channels,))
        y = _raw_convt1d(x, kernel, bias, stride=s, padding=0, output_padding=0)
        # EnCodec normalizes BEFORE trimming (NormConvTranspose1d applies the
        # norm inside, SConvTranspose1d unpads after) — GroupNorm statistics
        # include the to-be-trimmed samples.
        if self.norm == "time_group_norm":
            from jen1_tpu.ops.norm import GroupNorm

            y = GroupNorm(num_groups=1, name="norm")(y)
        padding_total = k - s
        if self.causal:
            right = math.ceil(padding_total * self.trim_right_ratio)
            left = padding_total - right
        else:
            right = padding_total // 2
            left = padding_total - right
        if right > 0:
            y = y[:, : y.shape[1] - right]
        if left > 0:
            y = y[:, left:]
        return y


class SLSTM(nn.Module):
    """2-layer LSTM over time with skip connection (EnCodec SLSTM).

    Matches torch.nn.LSTM gate ordering (i, f, g, o) for weight import.

    TPU implementation: the 2-layer case runs both layers PIPELINED in one
    lax.scan — iteration t computes layer-1 at time t and layer-2 at time
    t-1, whose three small (B,H)x(H,4H) matmuls (l1 recurrent, l2 recurrent,
    l2 input) are batched into ONE (3,B,H)x(3,H,4H) contraction. The
    sequential critical path is one cell per time step instead of two
    back-to-back scans — the LSTM is THE latency floor of whole-clip codec
    encode/decode (a 30 s clip is a 4500-step chain).
    """

    hidden: int
    num_layers: int = 2
    skip: bool = True

    def _params_for(self, layer: int, in_dim: int):
        w_ih = self.param(
            f"l{layer}_w_ih", torch_bias_init(self.hidden),
            (in_dim, 4 * self.hidden),
        )
        w_hh = self.param(
            f"l{layer}_w_hh", torch_bias_init(self.hidden),
            (self.hidden, 4 * self.hidden),
        )
        b_ih = self.param(
            f"l{layer}_b_ih", torch_bias_init(self.hidden), (4 * self.hidden,)
        )
        b_hh = self.param(
            f"l{layer}_b_hh", torch_bias_init(self.hidden), (4 * self.hidden,)
        )
        return w_ih, w_hh, b_ih, b_hh

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from jen1_tpu.ops.conv import matmul_precision

        b, l, c = x.shape
        prec = matmul_precision(jnp.float32)

        def lstm_gates(gates, cst):
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
            cst = f * cst + i * jnp.tanh(g)
            return o * jnp.tanh(cst), cst

        if self.num_layers == 2 and c == self.hidden:
            w_ih0, w_hh0, b_ih0, b_hh0 = self._params_for(0, c)
            w_ih1, w_hh1, b_ih1, b_hh1 = self._params_for(1, self.hidden)
            # big MXU matmul for the whole layer-1 input projection
            xi = (
                jnp.einsum("blc,ch->blh", x.astype(jnp.float32), w_ih0,
                           precision=prec)
                + b_ih0 + b_hh0
            ).transpose(1, 0, 2)  # (L, B, 4H)
            xi = jnp.concatenate(
                [xi, jnp.zeros((1, b, 4 * self.hidden), jnp.float32)], axis=0
            )
            ws = jnp.stack([w_hh0, w_hh1, w_ih1])  # (3, H, 4H)
            bias2 = b_ih1 + b_hh1
            h0 = jnp.zeros((b, self.hidden), jnp.float32)

            def cell(carry, inputs):
                h1, c1, h2, c2, out1_prev = carry
                xt, t = inputs
                stacked = jnp.stack([h1, h2, out1_prev])  # (3, B, H)
                mm = jnp.einsum("lbh,lhk->lbk", stacked, ws, precision=prec)
                h1n, c1n = lstm_gates(xt + mm[0], c1)
                h2n, c2n = lstm_gates(mm[1] + mm[2] + bias2, c2)
                # layer-2 must not update before its first real input (t==0)
                live = t > 0
                h2n = jnp.where(live, h2n, h2)
                c2n = jnp.where(live, c2n, c2)
                return (h1n, c1n, h2n, c2n, h1n), h2n

            ts = jnp.arange(l + 1)
            _, hs = jax.lax.scan(
                cell, (h0, h0, h0, h0, h0), (xi, ts), unroll=4
            )
            y = hs[1:].transpose(1, 0, 2).astype(x.dtype)  # drop warmup row
        else:
            y = x
            for layer in range(self.num_layers):
                in_dim = c if layer == 0 else self.hidden
                w_ih, w_hh, b_ih, b_hh = self._params_for(layer, in_dim)
                xi = (
                    jnp.einsum("blc,ch->blh", y.astype(jnp.float32), w_ih,
                               precision=prec)
                    + b_ih + b_hh
                )

                def cell(carry, xt, _w=w_hh):
                    h, cst = carry
                    gates = xt + jnp.dot(h, _w, precision=prec)
                    h, cst = lstm_gates(gates, cst)
                    return (h, cst), h

                h0 = jnp.zeros((b, self.hidden), jnp.float32)
                (_, _), hs = jax.lax.scan(
                    cell, (h0, h0), xi.transpose(1, 0, 2), unroll=4
                )
                y = hs.transpose(1, 0, 2).astype(x.dtype)
        return (y + x) if self.skip else y


class SEANetResnetBlock(nn.Module):
    """ELU-conv(k3,dil)-ELU-conv(k1) with 1x1 shortcut (true_skip=False)."""

    dim: int
    dilation: int = 1
    compress: int = 2
    causal: bool = False
    norm: str = "time_group_norm"
    pad_mode: str = "reflect"
    true_skip: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.dim // self.compress
        h = nn.elu(x)
        h = SConv1d(
            hidden, 3, dilation=self.dilation, causal=self.causal,
            norm=self.norm, pad_mode=self.pad_mode, name="conv1",
        )(h)
        h = nn.elu(h)
        h = SConv1d(
            self.dim, 1, causal=self.causal, norm=self.norm,
            pad_mode=self.pad_mode, name="conv2",
        )(h)
        if self.true_skip:
            short = x
        else:
            short = SConv1d(
                self.dim, 1, causal=self.causal, norm=self.norm,
                pad_mode=self.pad_mode, name="shortcut",
            )(x)
        return short + h


class SEANetEncoder(nn.Module):
    """audio (B, T, channels) -> latent (B, T/320, dimension)."""

    channels: int = 2
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Sequence[int] = (8, 5, 4, 2)
    dilation_base: int = 2
    causal: bool = False
    norm: str = "time_group_norm"
    pad_mode: str = "reflect"
    lstm: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mult = 1
        nf = self.n_filters
        x = SConv1d(
            mult * nf, 7, causal=self.causal, norm=self.norm,
            pad_mode=self.pad_mode, name="conv_in",
        )(x)
        for si, ratio in enumerate(reversed(list(self.ratios))):
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * nf,
                    dilation=self.dilation_base**j,
                    causal=self.causal,
                    norm=self.norm,
                    pad_mode=self.pad_mode,
                    name=f"stage{si}_res{j}",
                )(x)
            x = nn.elu(x)
            x = SConv1d(
                mult * nf * 2, ratio * 2, stride=ratio, causal=self.causal,
                norm=self.norm, pad_mode=self.pad_mode,
                name=f"stage{si}_down",
            )(x)
            mult *= 2
        if self.lstm:
            x = SLSTM(mult * nf, num_layers=self.lstm, name="lstm")(x)
        x = nn.elu(x)
        x = SConv1d(
            self.dimension, 7, causal=self.causal, norm=self.norm,
            pad_mode=self.pad_mode, name="conv_out",
        )(x)
        return x


class SEANetDecoder(nn.Module):
    """latent (B, F, dimension) -> audio (B, F*320, channels)."""

    channels: int = 2
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Sequence[int] = (8, 5, 4, 2)
    dilation_base: int = 2
    causal: bool = False
    norm: str = "time_group_norm"
    pad_mode: str = "reflect"
    lstm: int = 2
    trim_right_ratio: float = 1.0

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        nf = self.n_filters
        mult = int(2 ** len(self.ratios))
        x = SConv1d(
            mult * nf, 7, causal=self.causal, norm=self.norm,
            pad_mode=self.pad_mode, name="conv_in",
        )(z)
        if self.lstm:
            x = SLSTM(mult * nf, num_layers=self.lstm, name="lstm")(x)
        for si, ratio in enumerate(self.ratios):
            x = nn.elu(x)
            x = SConvTranspose1d(
                mult * nf // 2, ratio * 2, stride=ratio, causal=self.causal,
                norm=self.norm, trim_right_ratio=self.trim_right_ratio,
                name=f"stage{si}_up",
            )(x)
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * nf // 2,
                    dilation=self.dilation_base**j,
                    causal=self.causal,
                    norm=self.norm,
                    pad_mode=self.pad_mode,
                    name=f"stage{si}_res{j}",
                )(x)
            mult //= 2
        x = nn.elu(x)
        x = SConv1d(
            self.channels, 7, causal=self.causal, norm=self.norm,
            pad_mode=self.pad_mode, name="conv_out",
        )(x)
        return x
