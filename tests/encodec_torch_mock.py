"""Faithful torch mock of the facebookresearch/encodec model tree.

State-dict key-compatible with the real EnCodec release
(`encoder.model.{i}.conv.conv.weight[_g/_v]`, `decoder.model.{i}.convtr...`,
`quantizer.vq.layers.{i}._codebook.embed`, `...lstm.weight_ih_l{k}`) and
forward-equivalent on the paths the reference exercises
(/root/reference/dataset/dataloader.py:106-115, generation.py:145-150), so
`convert_torch_encodec`'s index arithmetic and weight transforms are locked by
output-parity tests without the `encodec` pip package (absent in this image).

Scaled by constructor args — tests use tiny dims with the real topology.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


def _apply_param_norm(module: nn.Module, norm: str) -> nn.Module:
    if norm == "weight_norm":
        return torch.nn.utils.weight_norm(module)
    return module


def _norm_module(norm: str, channels: int) -> nn.Module:
    if norm == "time_group_norm":
        return nn.GroupNorm(1, channels)
    return nn.Identity()


class NormConv1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, norm="none"):
        super().__init__()
        self.conv = _apply_param_norm(
            nn.Conv1d(cin, cout, k, stride=stride, dilation=dilation), norm
        )
        self.norm = _norm_module(norm, cout)

    def forward(self, x):
        return self.norm(self.conv(x))


class NormConvTranspose1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, norm="none"):
        super().__init__()
        self.convtr = _apply_param_norm(
            nn.ConvTranspose1d(cin, cout, k, stride=stride), norm
        )
        self.norm = _norm_module(norm, cout)

    def forward(self, x):
        return self.norm(self.convtr(x))


def _get_extra_padding(x, k, stride, padding_total) -> int:
    length = x.shape[-1]
    n_frames = (length - k + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k - padding_total)
    return max(ideal - length, 0)


def _pad1d(x, paddings: Tuple[int, int], mode="reflect"):
    left, right = paddings
    if mode == "reflect":
        length = x.shape[-1]
        max_pad = max(left, right)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = F.pad(x, (0, extra))
        padded = F.pad(x, (left, right), mode)
        end = padded.shape[-1] - extra
        return padded[..., :end]
    return F.pad(x, paddings, mode)


class SConv1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, causal=False,
                 norm="none", pad_mode="reflect"):
        super().__init__()
        self.conv = NormConv1d(cin, cout, k, stride, dilation, norm)
        self.causal, self.pad_mode = causal, pad_mode
        self.k, self.stride, self.dilation = k, stride, dilation

    def forward(self, x):
        keff = (self.k - 1) * self.dilation + 1
        padding_total = keff - self.stride
        extra = _get_extra_padding(x, keff, self.stride, padding_total)
        if self.causal:
            x = _pad1d(x, (padding_total, extra), self.pad_mode)
        else:
            right = padding_total // 2
            x = _pad1d(x, (padding_total - right, right + extra), self.pad_mode)
        return self.conv(x)


class SConvTranspose1d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, causal=False, norm="none",
                 trim_right_ratio=1.0):
        super().__init__()
        self.convtr = NormConvTranspose1d(cin, cout, k, stride, norm)
        self.causal, self.trim_right_ratio = causal, trim_right_ratio
        self.k, self.stride = k, stride

    def forward(self, x):
        y = self.convtr(x)  # norm applied inside, BEFORE unpadding
        padding_total = self.k - self.stride
        if self.causal:
            right = math.ceil(padding_total * self.trim_right_ratio)
            left = padding_total - right
        else:
            right = padding_total // 2
            left = padding_total - right
        end = y.shape[-1] - right
        return y[..., left:end]


class SLSTM(nn.Module):
    def __init__(self, dim, num_layers=2, skip=True):
        super().__init__()
        self.skip = skip
        self.lstm = nn.LSTM(dim, dim, num_layers)

    def forward(self, x):  # (B, C, T)
        x = x.permute(2, 0, 1)
        y, _ = self.lstm(x)
        if self.skip:
            y = y + x
        return y.permute(1, 2, 0)


class SEANetResnetBlock(nn.Module):
    def __init__(self, dim, causal=False, norm="none", pad_mode="reflect",
                 compress=2, dilation=1, true_skip=False):
        super().__init__()
        hidden = dim // compress
        self.block = nn.Sequential(
            nn.ELU(),
            SConv1d(dim, hidden, 3, dilation=dilation, causal=causal,
                    norm=norm, pad_mode=pad_mode),
            nn.ELU(),
            SConv1d(hidden, dim, 1, causal=causal, norm=norm,
                    pad_mode=pad_mode),
        )
        self.shortcut = (
            nn.Identity()
            if true_skip
            else SConv1d(dim, dim, 1, causal=causal, norm=norm,
                         pad_mode=pad_mode)
        )

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class SEANetEncoder(nn.Module):
    def __init__(self, channels=2, dimension=128, n_filters=32,
                 n_residual_layers=1, ratios=(8, 5, 4, 2), causal=False,
                 norm="time_group_norm", pad_mode="reflect", lstm=2,
                 dilation_base=2):
        super().__init__()
        mult = 1
        model: List[nn.Module] = [
            SConv1d(channels, mult * n_filters, 7, causal=causal, norm=norm,
                    pad_mode=pad_mode)
        ]
        for ratio in reversed(list(ratios)):
            for j in range(n_residual_layers):
                model += [
                    SEANetResnetBlock(
                        mult * n_filters, causal=causal, norm=norm,
                        pad_mode=pad_mode, dilation=dilation_base**j,
                    )
                ]
            model += [
                nn.ELU(),
                SConv1d(mult * n_filters, mult * n_filters * 2, ratio * 2,
                        stride=ratio, causal=causal, norm=norm,
                        pad_mode=pad_mode),
            ]
            mult *= 2
        if lstm:
            model += [SLSTM(mult * n_filters, num_layers=lstm)]
        model += [
            nn.ELU(),
            SConv1d(mult * n_filters, dimension, 7, causal=causal, norm=norm,
                    pad_mode=pad_mode),
        ]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


class SEANetDecoder(nn.Module):
    def __init__(self, channels=2, dimension=128, n_filters=32,
                 n_residual_layers=1, ratios=(8, 5, 4, 2), causal=False,
                 norm="time_group_norm", pad_mode="reflect", lstm=2,
                 dilation_base=2, trim_right_ratio=1.0):
        super().__init__()
        mult = int(2 ** len(ratios))
        model: List[nn.Module] = [
            SConv1d(dimension, mult * n_filters, 7, causal=causal, norm=norm,
                    pad_mode=pad_mode)
        ]
        if lstm:
            model += [SLSTM(mult * n_filters, num_layers=lstm)]
        for ratio in ratios:
            model += [
                nn.ELU(),
                SConvTranspose1d(mult * n_filters, mult * n_filters // 2,
                                 ratio * 2, stride=ratio, causal=causal,
                                 norm=norm, trim_right_ratio=trim_right_ratio),
            ]
            for j in range(n_residual_layers):
                model += [
                    SEANetResnetBlock(
                        mult * n_filters // 2, causal=causal, norm=norm,
                        pad_mode=pad_mode, dilation=dilation_base**j,
                    )
                ]
            mult //= 2
        model += [
            nn.ELU(),
            SConv1d(n_filters, channels, 7, causal=causal, norm=norm,
                    pad_mode=pad_mode),
        ]
        self.model = nn.Sequential(*model)

    def forward(self, z):
        return self.model(z)


class _Codebook(nn.Module):
    def __init__(self, bins, dim):
        super().__init__()
        # the real EuclideanCodebook registers four buffers
        # (encodec/quantization/core_vq.py); only `embed` matters at
        # inference, but a faithful state_dict must carry all of them so the
        # converter's key-coverage accounting is exercised honestly
        self.register_buffer("inited", torch.tensor([True]))
        self.register_buffer("cluster_size", torch.zeros(bins))
        self.register_buffer("embed", torch.randn(bins, dim))
        self.register_buffer("embed_avg", torch.randn(bins, dim))


class _VQLayer(nn.Module):
    def __init__(self, bins, dim):
        super().__init__()
        self._codebook = _Codebook(bins, dim)

    def encode(self, x):  # (B, D, T) -> (B, T) indices
        e = self._codebook.embed  # (bins, dim)
        flat = x.permute(0, 2, 1).reshape(-1, x.shape[1])
        dist = -(
            flat.pow(2).sum(1, keepdim=True)
            - 2 * flat @ e.t()
            + e.pow(2).sum(1)[None]
        )
        idx = dist.max(dim=-1).indices
        return idx.view(x.shape[0], x.shape[2])

    def decode(self, idx):  # (B, T) -> (B, D, T)
        return F.embedding(idx, self._codebook.embed).permute(0, 2, 1)


class _VQ(nn.Module):
    def __init__(self, n_q, bins, dim):
        super().__init__()
        self.layers = nn.ModuleList(_VQLayer(bins, dim) for _ in range(n_q))


class MockQuantizer(nn.Module):
    """encodec.quantization.ResidualVectorQuantizer inference semantics."""

    def __init__(self, n_q, bins, dim):
        super().__init__()
        self.vq = _VQ(n_q, bins, dim)
        self.n_q = n_q

    def encode(self, x) -> torch.Tensor:  # (B, D, T) -> (B, n_q, T)
        residual = x
        out = []
        for layer in self.vq.layers:
            idx = layer.encode(residual)
            residual = residual - layer.decode(idx)
            out.append(idx)
        return torch.stack(out).transpose(0, 1)

    def decode(self, codes) -> torch.Tensor:  # (n_q, B, T) -> (B, D, T)
        q = 0.0
        for i, layer in enumerate(self.vq.layers):
            q = q + layer.decode(codes[i])
        return q


class MockEncodec(nn.Module):
    """EncodecModel surface the reference uses: encode / quantizer / decoder."""

    def __init__(self, sample_rate=48_000, channels=2, dimension=128,
                 n_filters=32, ratios=(8, 5, 4, 2), n_q=16, bins=1024,
                 norm="time_group_norm", causal=False, normalize=True,
                 segment: Optional[float] = 1.0, overlap=0.01):
        super().__init__()
        self.encoder = SEANetEncoder(
            channels=channels, dimension=dimension, n_filters=n_filters,
            ratios=ratios, causal=causal, norm=norm,
        )
        self.decoder = SEANetDecoder(
            channels=channels, dimension=dimension, n_filters=n_filters,
            ratios=ratios, causal=causal, norm=norm,
        )
        self.quantizer = MockQuantizer(n_q, bins, dimension)
        self.sample_rate = sample_rate
        self.normalize = normalize
        self.segment = segment
        self.overlap = overlap

    @torch.no_grad()
    def encode(self, x) -> List[Tuple[torch.Tensor, Optional[torch.Tensor]]]:
        if self.segment is None:
            return [self._encode_frame(x)]
        seg_len = int(self.segment * self.sample_rate)
        stride = max(1, int((1.0 - self.overlap) * seg_len))
        return [
            self._encode_frame(x[..., off : off + seg_len])
            for off in range(0, x.shape[-1], stride)
        ]

    def _encode_frame(self, x):
        scale = None
        if self.normalize:
            mono = x.mean(dim=1, keepdim=True)
            volume = mono.pow(2).mean(dim=2, keepdim=True).sqrt()
            scale = 1e-8 + volume
            x = x / scale
        emb = self.encoder(x)
        return self.quantizer.encode(emb), scale

    @torch.no_grad()
    def get_emb(self, x) -> torch.Tensor:
        """The reference pipeline: dataset/dataloader.py:108-115."""
        frames = self.encode(x)
        codes = torch.cat([f[0] for f in frames], dim=-1)
        return self.quantizer.decode(codes.transpose(0, 1))
