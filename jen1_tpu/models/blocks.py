"""UNet building blocks, channels-last (B, L, C).

TPU-native re-implementations of the reference block zoo
(jen1/model/blocks.py): conv blocks with FiLM conditioning, resnets,
pixel-(un)shuffle patchers, transformer blocks with self/cross attention, and
the down/up/bottleneck composites. Every spatial op threads the static
`causal` flag (the omnidirectional mechanism); upsampling convs are
causal-ignorant exactly like the reference (blocks.py:736-764 never threads
causal into Upsample1d).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from jen1_tpu.ops.attention import Attention
from jen1_tpu.ops.conv import Downsample1d, OmniConv1d, Upsample1d
from jen1_tpu.ops.linear import Linear
from jen1_tpu.ops.norm import GroupNorm
from jen1_tpu.ops.snake import Snake1d


class ConvBlock1d(nn.Module):
    """GroupNorm -> (FiLM) -> SiLU/Snake -> OmniConv1d (reference: blocks.py:98-145)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    num_groups: int = 8
    use_norm: bool = True
    use_snake: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        if self.use_norm:
            x = GroupNorm(num_groups=self.num_groups, name="groupnorm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        if self.use_snake:
            x = Snake1d(name="snake")(x)
        else:
            x = nn.silu(x)
        return OmniConv1d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            name="project",
        )(x, causal=causal)


class MappingToScaleShift(nn.Module):
    """FiLM head: SiLU -> Linear -> (scale, shift), each (B, 1, C).

    Reference: blocks.py:148-165.
    """

    channels: int

    @nn.compact
    def __call__(self, mapping: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.silu(mapping)
        h = Linear(self.channels * 2, name="to_scale_shift")(h)
        scale, shift = jnp.split(h, 2, axis=-1)
        return scale[:, None, :], shift[:, None, :]


class ResnetBlock1d(nn.Module):
    """Two conv blocks with FiLM between them + (1x1) residual projection.

    Reference: blocks.py:168-231.
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_norm: bool = True
    use_snake: bool = False
    num_groups: int = 8
    use_mapping: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mapping: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        assert not (self.use_mapping ^ (mapping is not None)), (
            "context mapping required iff use_mapping"
        )
        in_channels = x.shape[-1]

        h = ConvBlock1d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            use_norm=self.use_norm,
            num_groups=self.num_groups,
            use_snake=self.use_snake,
            name="block1",
        )(x, causal=causal)

        scale_shift = None
        if self.use_mapping:
            scale_shift = MappingToScaleShift(
                channels=self.out_channels, name="to_scale_shift"
            )(mapping)

        h = ConvBlock1d(
            out_channels=self.out_channels,
            use_norm=self.use_norm,
            num_groups=self.num_groups,
            use_snake=self.use_snake,
            name="block2",
        )(h, scale_shift=scale_shift, causal=causal)

        if in_channels != self.out_channels:
            res = OmniConv1d(
                out_channels=self.out_channels, kernel_size=1, name="to_out"
            )(x, causal=causal)
        else:
            res = x
        return h + res


class Patcher(nn.Module):
    """Resnet + pixel-unshuffle-1d: (B, L*p, C) -> (B, L, C*p).

    Reference: blocks.py:234-259 ("b c (l p) -> b (c p) l").
    """

    out_channels: int
    patch_size: int
    use_mapping: bool = False
    use_snake: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mapping: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        assert self.out_channels % self.patch_size == 0
        x = ResnetBlock1d(
            out_channels=self.out_channels // self.patch_size,
            num_groups=1,
            use_mapping=self.use_mapping,
            use_snake=self.use_snake,
            name="block",
        )(x, mapping=mapping)
        p = self.patch_size
        if p > 1:
            b, lp, c = x.shape
            # 'b (l p) c -> b l (c p)' with channel index c*p + p_i
            x = x.reshape(b, lp // p, p, c).transpose(0, 1, 3, 2).reshape(b, lp // p, c * p)
        return x


class Unpatcher(nn.Module):
    """Pixel-shuffle-1d + resnet: (B, L, C*p) -> (B, L*p, C_out).

    Reference: blocks.py:262-287 ("b (c p) l -> b c (l p)").
    """

    out_channels: int
    patch_size: int
    use_mapping: bool = False
    use_snake: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mapping: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        p = self.patch_size
        if p > 1:
            b, l, cp = x.shape
            x = x.reshape(b, l, cp // p, p).transpose(0, 1, 3, 2).reshape(b, l * p, cp // p)
        return ResnetBlock1d(
            out_channels=self.out_channels,
            num_groups=1,
            use_mapping=self.use_mapping,
            use_snake=self.use_snake,
            name="block",
        )(x, mapping=mapping)


class FeedForward(nn.Module):
    """Dense -> GELU -> Dense (reference: blocks.py:295-301)."""

    features: int
    multiplier: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.features * self.multiplier
        h = Linear(mid, name="linear1")(x)
        h = nn.gelu(h, approximate=False)
        return Linear(self.features, name="linear2")(h)


class TransformerBlock(nn.Module):
    """Self-attn (+cross-attn) + FFN, residual (reference: blocks.py:454-489).

    Cross-attention never sees the causal flag — only self-attention does,
    matching the reference (blocks.py:485-487).
    """

    features: int
    num_heads: int
    head_features: int
    multiplier: int
    context_features: Optional[int] = None
    use_flash: bool = False
    flash_min_seq_len: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        use_cross = self.context_features is not None and self.context_features > 0
        x = (
            Attention(
                features=self.features,
                num_heads=self.num_heads,
                head_features=self.head_features,
                use_flash=self.use_flash,
                flash_min_seq_len=self.flash_min_seq_len,
                name="attention",
            )(x, causal=causal)
            + x
        )
        if use_cross:
            x = (
                Attention(
                    features=self.features,
                    num_heads=self.num_heads,
                    head_features=self.head_features,
                    context_features=self.context_features,
                    name="cross_attention",
                )(x, context=context, context_mask=context_mask)
                + x
            )
        x = FeedForward(
            features=self.features, multiplier=self.multiplier, name="feed_forward"
        )(x) + x
        return x


class Transformer1d(nn.Module):
    """GroupNorm -> 1x1 conv -> transformer blocks -> 1x1 conv.

    Reference: blocks.py:497-537. The reference reuses the *same* conv before
    and after the blocks (tied weights, SURVEY §2.5 #6); `tie_projections`
    replicates that for checkpoint parity, default is untied.
    """

    num_layers: int
    channels: int
    num_heads: int
    head_features: int
    multiplier: int
    context_features: Optional[int] = None
    tie_projections: bool = False
    use_flash: bool = False
    flash_min_seq_len: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        # Reference hardcodes 32 groups (blocks.py:509); clamp for tiny test
        # configs — identical at full size where channels >= 256.
        x = GroupNorm(
            num_groups=min(32, self.channels), eps=1e-6, name="group_norm"
        )(x)
        conv_in = OmniConv1d(out_channels=self.channels, kernel_size=1, name="conv_in")
        x = conv_in(x, causal=causal)
        for i in range(self.num_layers):
            x = TransformerBlock(
                features=self.channels,
                num_heads=self.num_heads,
                head_features=self.head_features,
                multiplier=self.multiplier,
                context_features=self.context_features,
                use_flash=self.use_flash,
                flash_min_seq_len=self.flash_min_seq_len,
                name=f"block{i}",
            )(x, context=context, context_mask=context_mask, causal=causal)
        if self.tie_projections:
            x = conv_in(x, causal=causal)
        else:
            x = OmniConv1d(
                out_channels=self.channels, kernel_size=1, name="conv_out"
            )(x, causal=causal)
        return x


def _crop_to_common_length(x: jnp.ndarray, skip: jnp.ndarray):
    """Center-crop the longer of (x, skip) along axis 1 (reference crop(),
    utils/module.py:186-204). Lengths are static under jit, so this is a
    compile-time slice."""
    lx, ls = x.shape[1], skip.shape[1]
    if lx == ls:
        return x, skip
    if lx > ls:
        start = (lx - ls) // 2
        return x[:, start : start + ls], skip
    start = (ls - lx) // 2
    return x, skip[:, start : start + lx]


class DownsampleBlock1d(nn.Module):
    """Pre-downsample conv + resnet stack (+ transformer), collecting skips.

    Reference: blocks.py:540-650.
    """

    in_channels: int
    out_channels: int
    factor: int
    num_groups: int
    num_layers: int
    kernel_multiplier: int = 2
    use_pre_downsample: bool = True
    use_skip: bool = False
    use_snake: bool = False
    context_channels: int = 0
    num_transformer_blocks: int = 0
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    use_mapping: bool = False
    context_embedding_features: Optional[int] = None
    tie_transformer_projections: bool = False
    use_flash: bool = False
    flash_min_seq_len: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mapping: Optional[jnp.ndarray] = None,
        channels: Optional[jnp.ndarray] = None,
        embedding: Optional[jnp.ndarray] = None,
        embedding_mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ):
        ch = self.out_channels if self.use_pre_downsample else self.in_channels

        if self.use_pre_downsample:
            x = Downsample1d(
                out_channels=self.out_channels,
                factor=self.factor,
                kernel_multiplier=self.kernel_multiplier,
                name="downsample",
            )(x, causal=causal)

        if self.context_channels > 0 and channels is not None:
            x = jnp.concatenate([x, channels.astype(x.dtype)], axis=-1)

        skips: List[jnp.ndarray] = []
        for i in range(self.num_layers):
            x = ResnetBlock1d(
                out_channels=ch,
                num_groups=self.num_groups,
                use_mapping=self.use_mapping,
                use_snake=self.use_snake,
                name=f"block{i}",
            )(x, mapping=mapping, causal=causal)
            if self.use_skip:
                skips.append(x)

        if self.num_transformer_blocks > 0:
            head_features = self.attention_features or (ch // self.attention_heads)
            x = Transformer1d(
                num_layers=self.num_transformer_blocks,
                channels=ch,
                num_heads=self.attention_heads,
                head_features=head_features,
                multiplier=self.attention_multiplier,
                context_features=self.context_embedding_features,
                tie_projections=self.tie_transformer_projections,
                use_flash=self.use_flash,
                flash_min_seq_len=self.flash_min_seq_len,
                name="transformer",
            )(x, context=embedding, context_mask=embedding_mask, causal=causal)
            if self.use_skip:
                skips.append(x)

        if not self.use_pre_downsample:
            x = Downsample1d(
                out_channels=self.out_channels,
                factor=self.factor,
                kernel_multiplier=self.kernel_multiplier,
                name="downsample",
            )(x, causal=causal)

        return (x, skips) if self.use_skip else x


class UpsampleBlock1d(nn.Module):
    """Skip-concat resnet stack (+ transformer) + upsample.

    Reference: blocks.py:653-764. Skips are consumed LIFO; each resnet eats
    one skip, concatenated on the channel axis after skip-scale.
    """

    in_channels: int
    out_channels: int
    factor: int
    num_layers: int
    num_groups: int
    use_nearest: bool = False
    use_pre_upsample: bool = False
    use_skip: bool = False
    use_snake: bool = False
    skip_channels: int = 0
    use_skip_scale: bool = False
    num_transformer_blocks: int = 0
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    use_mapping: bool = False
    context_embedding_features: Optional[int] = None
    tie_transformer_projections: bool = False
    use_flash: bool = False
    flash_min_seq_len: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Optional[List[jnp.ndarray]] = None,
        mapping: Optional[jnp.ndarray] = None,
        embedding: Optional[jnp.ndarray] = None,
        embedding_mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        ch = self.out_channels if self.use_pre_upsample else self.in_channels
        skip_scale = 2**-0.5 if self.use_skip_scale else 1.0

        if self.use_pre_upsample:
            x = Upsample1d(
                out_channels=self.out_channels,
                factor=self.factor,
                use_nearest=self.use_nearest,
                name="upsample",
            )(x)

        skips = list(skips) if skips is not None else None
        for i in range(self.num_layers):
            if skips is not None:
                skip = skips.pop()
                x, skip = _crop_to_common_length(x, skip)
                x = jnp.concatenate([x, skip * skip_scale], axis=-1)
            x = ResnetBlock1d(
                out_channels=ch,
                num_groups=self.num_groups,
                use_mapping=self.use_mapping,
                use_snake=self.use_snake,
                name=f"block{i}",
            )(x, mapping=mapping, causal=causal)

        if self.num_transformer_blocks > 0:
            head_features = self.attention_features or (ch // self.attention_heads)
            x = Transformer1d(
                num_layers=self.num_transformer_blocks,
                channels=ch,
                num_heads=self.attention_heads,
                head_features=head_features,
                multiplier=self.attention_multiplier,
                context_features=self.context_embedding_features,
                tie_projections=self.tie_transformer_projections,
                use_flash=self.use_flash,
                flash_min_seq_len=self.flash_min_seq_len,
                name="transformer",
            )(x, context=embedding, context_mask=embedding_mask, causal=causal)

        if not self.use_pre_upsample:
            x = Upsample1d(
                out_channels=self.out_channels,
                factor=self.factor,
                use_nearest=self.use_nearest,
                name="upsample",
            )(x)

        return x


class BottleneckBlock1d(nn.Module):
    """Resnet -> transformer -> resnet (reference: blocks.py:767-830)."""

    channels: int
    num_groups: int
    num_transformer_blocks: int = 0
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    use_mapping: bool = False
    context_embedding_features: Optional[int] = None
    use_snake: bool = False
    tie_transformer_projections: bool = False
    use_flash: bool = False
    flash_min_seq_len: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mapping: Optional[jnp.ndarray] = None,
        embedding: Optional[jnp.ndarray] = None,
        embedding_mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        x = ResnetBlock1d(
            out_channels=self.channels,
            num_groups=self.num_groups,
            use_mapping=self.use_mapping,
            use_snake=self.use_snake,
            name="pre_block",
        )(x, mapping=mapping, causal=causal)
        if self.num_transformer_blocks > 0:
            head_features = self.attention_features or (
                self.channels // self.attention_heads
            )
            x = Transformer1d(
                num_layers=self.num_transformer_blocks,
                channels=self.channels,
                num_heads=self.attention_heads,
                head_features=head_features,
                multiplier=self.attention_multiplier,
                context_features=self.context_embedding_features,
                tie_projections=self.tie_transformer_projections,
                use_flash=self.use_flash,
                flash_min_seq_len=self.flash_min_seq_len,
                name="transformer",
            )(x, context=embedding, context_mask=embedding_mask, causal=causal)
        x = ResnetBlock1d(
            out_channels=self.channels,
            num_groups=self.num_groups,
            use_mapping=self.use_mapping,
            use_snake=self.use_snake,
            name="post_block",
        )(x, mapping=mapping, causal=causal)
        return x
