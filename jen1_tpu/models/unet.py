"""1-D UNet denoiser with classifier-free guidance, channels-last.

TPU-native rebuild of the reference UNet1d/UNetCFG1d (jen1/model/model.py).
Public call convention: activations are (B, L, C) — channels ride the TPU
lane dimension. The diffusion processes and the Jen1 API convert from the
reference's (B, C, L) at the boundary.

CFG is implemented at the model level exactly like the reference
(model.py:299-376): optional cross-attention time token, learned fixed (null)
embedding, batched CFG double-forward (concat [x;x] / [emb;null] into one
UNet pass), guidance mix, and optional std-matching rescale (scale_cfg /
scale_phi).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jen1_tpu.models.blocks import (
    BottleneckBlock1d,
    DownsampleBlock1d,
    Patcher,
    Unpatcher,
    UpsampleBlock1d,
    _crop_to_common_length,
)
from jen1_tpu.ops.embeddings import FixedEmbedding, TimePositionalEmbedding, rand_bool
from jen1_tpu.ops.linear import Linear


class UNet1d(nn.Module):
    """Symmetric encoder/decoder 1-D UNet (reference: model.py:13-265).

    Structure per level i (of num_layers = len(multipliers)-1):
      down:   Downsample1d(factor_i) -> num_blocks_i resnets -> [Transformer1d]
      up:     (num_blocks_i + has_attn_i) x (skip-concat + resnet) -> [Transformer1d]
              -> Upsample1d(factor_i)
    plus a Patcher/Unpatcher at the top and a resnet-transformer-resnet
    bottleneck. Time (and optional global features) map to a FiLM vector.
    """

    in_channels: int
    channels: int
    multipliers: Sequence[int]
    factors: Sequence[int]
    num_blocks: Sequence[int]
    attentions: Sequence[int]
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    use_snake: bool = False
    out_channels: Optional[int] = None
    context_features: Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: Sequence[int] = ()
    context_embedding_features: Optional[int] = None
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    tie_transformer_projections: bool = False
    use_flash_attention: bool = False
    flash_min_seq_len: int = 512
    remat: bool = False
    # STFT-domain mode (reference model.py:100-108, 237-263 — note the
    # reference's own decode call is a typo, `stft.decoded1d`, so its path
    # crashes; this implements the intent): waveform in/out is transformed to
    # stacked magnitude+phase channels before the UNet and inverted after.
    use_stft: bool = False
    use_stft_context: bool = False
    stft_num_fft: int = 1023
    stft_hop_length: int = 256

    @property
    def num_layers(self) -> int:
        return len(self.multipliers) - 1

    @property
    def _stft_channels(self) -> int:
        return (self.stft_num_fft // 2 + 1) * 2

    @property
    def _context_channels_padded(self) -> List[int]:
        cc = list(self.context_channels)
        if cc and self.use_stft and self.use_stft_context:
            # context at layer 0 is STFT-encoded too (model.py:106, 200-201)
            cc[0] = cc[0] * self._stft_channels
        return cc + [0] * (self.num_layers + 1 - len(cc))

    @property
    def _mapping_features(self) -> Optional[int]:
        if self.use_context_time or self.context_features is not None:
            return self.channels * self.context_features_multiplier
        return None

    def _get_channels(
        self, channels_list: Optional[Sequence[jnp.ndarray]], layer: int
    ) -> Optional[jnp.ndarray]:
        """Select the context-channels tensor for `layer` (model.py:183-202)."""
        cc = self._context_channels_padded
        if cc[layer] == 0:
            return None
        assert channels_list is not None, f"missing context channels for layer {layer}"
        has_context = [c > 0 for c in cc]
        channels_id = sum(has_context[:layer])
        channels = channels_list[channels_id]
        assert channels is not None, f"missing context for layer {layer}"
        assert channels.shape[-1] == cc[layer], (
            f"expected {cc[layer]} context channels at layer {layer}, "
            f"got {channels.shape[-1]}"
        )
        return channels

    def _get_mapping(
        self, time: Optional[jnp.ndarray], features: Optional[jnp.ndarray]
    ) -> Optional[jnp.ndarray]:
        """Combine time/features into the FiLM mapping (model.py:204-223)."""
        mf = self._mapping_features
        if mf is None:
            return None
        items = []
        if self.use_context_time:
            assert time is not None, "use_context_time=True but no time provided"
            h = TimePositionalEmbedding(
                dim=self.channels, out_features=mf, name="to_time"
            )(time)
            items.append(nn.gelu(h, approximate=False))
        if self.context_features is not None:
            assert features is not None, "context_features set but none provided"
            h = Linear(mf, name="to_features")(features)
            items.append(nn.gelu(h, approximate=False))
        mapping = sum(items)
        mapping = Linear(mf, name="to_mapping_1")(mapping)
        mapping = nn.gelu(mapping, approximate=False)
        mapping = Linear(mf, name="to_mapping_2")(mapping)
        mapping = nn.gelu(mapping, approximate=False)
        return mapping

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, L, in_channels)
        time: Optional[jnp.ndarray] = None,  # (B,)
        *,
        features: Optional[jnp.ndarray] = None,
        channels_list: Optional[Sequence[jnp.ndarray]] = None,
        embedding: Optional[jnp.ndarray] = None,  # (B, M, E)
        embedding_mask: Optional[jnp.ndarray] = None,  # (B, M)
        causal: bool = False,
        encoder_cache=None,
        return_encoder_cache: bool = False,
    ) -> jnp.ndarray:
        """encoder_cache / return_encoder_cache implement encoder
        propagation ("Faster Diffusion", arXiv:2312.09608): deep encoder
        features change slowly across adjacent denoising steps, so a sampler
        may reuse the (pre-bottleneck feature, per-level skips) cache from
        the previous step and run only patcher + bottleneck + decoder. The
        patcher IS re-run on the current x_t — its output is the outermost
        residual (skip0), keeping the current latent in the data path; the
        per-step time FiLM mapping modulates every decoder block as usual.
        Both branches return an identically-shaped cache, so a sampler can
        switch per step with lax.cond."""
        n = self.num_layers
        assert len(self.factors) == n and len(self.num_blocks) == n
        assert len(self.attentions) >= n
        cc = self._context_channels_padded
        use_mapping = self._mapping_features is not None

        stft = None
        wave_len = x.shape[1]
        if self.use_stft:
            from jen1_tpu.ops.stft import STFT

            stft = STFT(
                num_fft=self.stft_num_fft, hop_length=self.stft_hop_length
            )

            def enc1d(wave):  # (B, T, C) -> (B, L_frames, C*F*2)
                out = stft.encode1d(wave.transpose(0, 2, 1))
                return out.transpose(0, 2, 1).astype(wave.dtype)

            if self.use_stft_context and channels_list is not None:
                channels_list = [enc1d(c) for c in channels_list]
            x_dtype = x.dtype
            x = enc1d(x)

        channels = self._get_channels(channels_list, layer=0)
        if channels is not None:
            x = jnp.concatenate([x, channels.astype(x.dtype)], axis=-1)

        mapping = self._get_mapping(time, features)
        if mapping is not None:
            # FiLM mapping follows the activation compute dtype — otherwise an
            # fp32 time embedding would promote every bf16 block back to fp32.
            mapping = mapping.astype(x.dtype)
        if embedding is not None:
            embedding = embedding.astype(x.dtype)

        x = Patcher(
            out_channels=self.channels * self.multipliers[0],
            patch_size=self.patch_size,
            use_mapping=use_mapping,
            use_snake=self.use_snake,
            name="to_in",
        )(x, mapping=mapping)

        skips_list: List[List[jnp.ndarray]] = [[x]]

        if encoder_cache is not None:
            # decoder-only step: levels 1..n skips + the pre-bottleneck
            # feature come from the cache; skip0 (patcher) is current.
            x, cached_skips = encoder_cache
            skips_list = skips_list + [list(s) for s in cached_skips]
            cache = encoder_cache
            down_range = []
        else:
            down_range = list(range(n))

        for i in down_range:
            channels = self._get_channels(channels_list, layer=i + 1)
            block = DownsampleBlock1d(
                in_channels=self.channels * self.multipliers[i],
                out_channels=self.channels * self.multipliers[i + 1],
                factor=self.factors[i],
                kernel_multiplier=self.kernel_multiplier_downsample,
                num_groups=self.resnet_groups,
                num_layers=self.num_blocks[i],
                use_pre_downsample=True,
                use_skip=True,
                use_snake=self.use_snake,
                context_channels=cc[i + 1],
                num_transformer_blocks=self.attentions[i],
                attention_heads=self.attention_heads,
                attention_features=self.attention_features,
                attention_multiplier=self.attention_multiplier,
                use_mapping=use_mapping,
                context_embedding_features=self.context_embedding_features,
                tie_transformer_projections=self.tie_transformer_projections,
                use_flash=self.use_flash_attention,
                flash_min_seq_len=self.flash_min_seq_len,
                name=f"downsample{i}",
            )
            if self.remat:
                # jax.checkpoint per block: activations inside the block are
                # recomputed in the backward pass instead of stored (HBM for
                # FLOPs). `causal` stays a static Python flag via the closure.
                def down_call(mdl, x, mapping, channels, embedding,
                              embedding_mask, _c=causal):
                    return mdl(x, mapping=mapping, channels=channels,
                               embedding=embedding,
                               embedding_mask=embedding_mask, causal=_c)

                x, skips = nn.remat(down_call)(
                    block, x, mapping, channels, embedding, embedding_mask
                )
            else:
                x, skips = block(
                    x,
                    mapping=mapping,
                    channels=channels,
                    embedding=embedding,
                    embedding_mask=embedding_mask,
                    causal=causal,
                )
            skips_list.append(skips)

        if encoder_cache is None:
            cache = (x, tuple(tuple(s) for s in skips_list[1:]))

        bottleneck = BottleneckBlock1d(
            channels=self.channels * self.multipliers[-1],
            num_groups=self.resnet_groups,
            num_transformer_blocks=self.attentions[-1],
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            use_mapping=use_mapping,
            context_embedding_features=self.context_embedding_features,
            use_snake=self.use_snake,
            tie_transformer_projections=self.tie_transformer_projections,
            use_flash=self.use_flash_attention,
            flash_min_seq_len=self.flash_min_seq_len,
            name="bottleneck",
        )
        if self.remat:
            def bott_call(mdl, x, mapping, embedding, embedding_mask,
                          _c=causal):
                return mdl(x, mapping=mapping, embedding=embedding,
                           embedding_mask=embedding_mask, causal=_c)

            x = nn.remat(bott_call)(
                bottleneck, x, mapping, embedding, embedding_mask
            )
        else:
            x = bottleneck(
                x,
                mapping=mapping,
                embedding=embedding,
                embedding_mask=embedding_mask,
                causal=causal,
            )

        for j, i in enumerate(reversed(range(n))):
            skips = skips_list.pop()
            block = UpsampleBlock1d(
                in_channels=self.channels * self.multipliers[i + 1],
                out_channels=self.channels * self.multipliers[i],
                factor=self.factors[i],
                num_layers=self.num_blocks[i] + (1 if self.attentions[i] else 0),
                num_groups=self.resnet_groups,
                use_nearest=self.use_nearest_upsample,
                use_pre_upsample=False,
                use_skip=True,
                use_skip_scale=self.use_skip_scale,
                use_snake=self.use_snake,
                skip_channels=self.channels * self.multipliers[i + 1],
                num_transformer_blocks=self.attentions[i],
                attention_heads=self.attention_heads,
                attention_features=self.attention_features,
                attention_multiplier=self.attention_multiplier,
                use_mapping=use_mapping,
                context_embedding_features=self.context_embedding_features,
                tie_transformer_projections=self.tie_transformer_projections,
                use_flash=self.use_flash_attention,
                flash_min_seq_len=self.flash_min_seq_len,
                name=f"upsample{j}",
            )
            if self.remat:
                def up_call(mdl, x, skips, mapping, embedding,
                            embedding_mask, _c=causal):
                    return mdl(x, skips=skips, mapping=mapping,
                               embedding=embedding,
                               embedding_mask=embedding_mask, causal=_c)

                x = nn.remat(up_call)(
                    block, x, skips, mapping, embedding, embedding_mask
                )
            else:
                x = block(
                    x,
                    skips=skips,
                    mapping=mapping,
                    embedding=embedding,
                    embedding_mask=embedding_mask,
                    causal=causal,
                )

        (skip0,) = skips_list.pop()
        x, skip0 = _crop_to_common_length(x, skip0)
        x = x + skip0
        out_channels = self.out_channels or self.in_channels
        if self.use_stft:
            out_channels *= self._stft_channels  # reference model.py:105
        x = Unpatcher(
            out_channels=out_channels,
            patch_size=self.patch_size,
            use_mapping=use_mapping,
            use_snake=self.use_snake,
            name="to_out",
        )(x, mapping=mapping)
        if stft is not None:
            # invert to the waveform domain at the original length (the
            # reference decodes to closest_power_2(frames*hop) because it
            # lost the input length; here it is known statically).
            x = stft.decode1d(
                x.transpose(0, 2, 1).astype(jnp.float32), length=wave_len
            ).transpose(0, 2, 1).astype(x_dtype)
        if return_encoder_cache:
            return x, cache
        return x


class UNetCFG1d(nn.Module):
    """UNet1d + classifier-free guidance (reference: model.py:268-376).

    `embedding_scale`, `batch_cfg`, `scale_cfg`, `scale_phi` and
    `embedding_mask_proba` are static Python values — each distinct setting is
    its own compiled graph, which is exactly how they are used (fixed per
    trainer/sampler).
    """

    context_embedding_max_length: int
    context_embedding_features: int
    use_xattn_time: bool = False
    # --- UNet1d fields (threaded through) ---
    in_channels: int = 128
    channels: int = 128
    multipliers: Sequence[int] = (1,)
    factors: Sequence[int] = ()
    num_blocks: Sequence[int] = ()
    attentions: Sequence[int] = (0,)
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    use_snake: bool = False
    out_channels: Optional[int] = None
    context_features: Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: Sequence[int] = ()
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    tie_transformer_projections: bool = False
    use_flash_attention: bool = False
    flash_min_seq_len: int = 512
    remat: bool = False
    use_stft: bool = False
    use_stft_context: bool = False
    stft_num_fft: int = 1023
    stft_hop_length: int = 256

    def setup(self):
        self.unet = UNet1d(
            in_channels=self.in_channels,
            channels=self.channels,
            multipliers=self.multipliers,
            factors=self.factors,
            num_blocks=self.num_blocks,
            attentions=self.attentions,
            patch_size=self.patch_size,
            resnet_groups=self.resnet_groups,
            use_context_time=self.use_context_time,
            kernel_multiplier_downsample=self.kernel_multiplier_downsample,
            use_nearest_upsample=self.use_nearest_upsample,
            use_skip_scale=self.use_skip_scale,
            use_snake=self.use_snake,
            out_channels=self.out_channels,
            context_features=self.context_features,
            context_features_multiplier=self.context_features_multiplier,
            context_channels=self.context_channels,
            context_embedding_features=self.context_embedding_features,
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            tie_transformer_projections=self.tie_transformer_projections,
            use_flash_attention=self.use_flash_attention,
            flash_min_seq_len=self.flash_min_seq_len,
            remat=self.remat,
            use_stft=self.use_stft,
            use_stft_context=self.use_stft_context,
            stft_num_fft=self.stft_num_fft,
            stft_hop_length=self.stft_hop_length,
            name="unet",
        )
        max_length = self.context_embedding_max_length + (
            1 if self.use_xattn_time else 0
        )
        self.fixed_embedding = FixedEmbedding(
            max_length=max_length,
            features=self.context_embedding_features,
            name="fixed_embedding",
        )
        if self.use_xattn_time:
            self.to_time_embedding = TimePositionalEmbedding(
                dim=self.channels,
                out_features=self.context_embedding_features,
                name="to_time_embedding",
            )

    def __call__(
        self,
        x: jnp.ndarray,  # (B, L, C)
        time: jnp.ndarray,  # (B,)
        *,
        embedding: jnp.ndarray,  # (B, M, E)
        embedding_mask: Optional[jnp.ndarray] = None,  # (B, M)
        embedding_scale: float = 1.0,
        embedding_mask_proba: float = 0.0,
        batch_cfg: bool = False,
        scale_cfg: bool = False,
        scale_phi: float = 0.7,
        features: Optional[jnp.ndarray] = None,
        channels_list: Optional[Sequence[jnp.ndarray]] = None,
        causal: bool = False,
        rng: Optional[jax.Array] = None,
        encoder_cache=None,
        return_encoder_cache: bool = False,
    ) -> jnp.ndarray:
        b = embedding.shape[0]
        cache_kw = dict(
            encoder_cache=encoder_cache,
            return_encoder_cache=return_encoder_cache,
        )
        if (encoder_cache is not None or return_encoder_cache) and (
            embedding_scale != 1.0 and not batch_cfg
        ):
            raise ValueError(
                "encoder propagation with CFG requires batch_cfg=True "
                "(the cache lives in the CFG-doubled batch)"
            )

        if self.use_xattn_time:
            time_token = self.to_time_embedding(time.astype(jnp.float32))
            time_token = nn.gelu(time_token, approximate=False).astype(embedding.dtype)
            embedding = jnp.concatenate([embedding, time_token[:, None, :]], axis=1)
            if embedding_mask is not None:
                ones = jnp.ones((b, 1), dtype=embedding_mask.dtype)
                embedding_mask = jnp.concatenate([embedding_mask, ones], axis=1)

        fixed_embedding = self.fixed_embedding(embedding)

        if embedding_mask_proba > 0.0:
            assert rng is not None, "embedding_mask_proba > 0 requires an rng"
            batch_mask = rand_bool(rng, (b, 1, 1), embedding_mask_proba)
            embedding = jnp.where(batch_mask, fixed_embedding, embedding)

        if embedding_scale != 1.0:
            if batch_cfg:
                batch_x = jnp.concatenate([x, x], axis=0)
                batch_time = jnp.concatenate([time, time], axis=0)
                batch_embed = jnp.concatenate([embedding, fixed_embedding], axis=0)
                batch_mask = None
                if embedding_mask is not None:
                    batch_mask = jnp.concatenate(
                        [embedding_mask, embedding_mask], axis=0
                    )
                batch_features = None
                if features is not None:
                    batch_features = jnp.concatenate([features, features], axis=0)
                batch_channels = None
                if channels_list is not None:
                    batch_channels = [
                        jnp.concatenate([c, c], axis=0) for c in channels_list
                    ]
                batch_out = self.unet(
                    batch_x,
                    batch_time,
                    embedding=batch_embed,
                    embedding_mask=batch_mask,
                    features=batch_features,
                    channels_list=batch_channels,
                    causal=causal,
                    **cache_kw,
                )
                if return_encoder_cache:
                    batch_out, cache = batch_out
                out, out_masked = jnp.split(batch_out, 2, axis=0)
            else:
                out = self.unet(
                    x,
                    time,
                    embedding=embedding,
                    embedding_mask=embedding_mask,
                    features=features,
                    channels_list=channels_list,
                    causal=causal,
                )
                out_masked = self.unet(
                    x,
                    time,
                    embedding=fixed_embedding,
                    embedding_mask=embedding_mask,
                    features=features,
                    channels_list=channels_list,
                    causal=causal,
                )

            out_cfg = out_masked + (out - out_masked) * embedding_scale
            if scale_cfg:
                # std over the channel axis (torch dim=1 == channels in BCL;
                # channels are axis -1 here), matching model.py:364-369.
                # ddof=1: torch Tensor.std applies Bessel's correction.
                out_std = jnp.std(
                    out.astype(jnp.float32), axis=-1, keepdims=True, ddof=1
                )
                cfg_std = jnp.std(
                    out_cfg.astype(jnp.float32), axis=-1, keepdims=True, ddof=1
                )
                rescaled = out_cfg.astype(jnp.float32) * (out_std / cfg_std)
                mixed = scale_phi * rescaled + (1.0 - scale_phi) * out_cfg.astype(
                    jnp.float32
                )
                out_cfg = mixed.astype(out_cfg.dtype)
            if return_encoder_cache:
                return out_cfg, cache
            return out_cfg

        out = self.unet(
            x,
            time,
            embedding=embedding,
            embedding_mask=embedding_mask,
            features=features,
            channels_list=channels_list,
            causal=causal,
            **cache_kw,
        )
        return out


def unet_from_model_config(mc) -> UNetCFG1d:
    """Build UNetCFG1d from a jen1_tpu.config.ModelConfig (factory equivalent
    of reference utils/script_util.py:271-284)."""
    return UNetCFG1d(
        context_embedding_max_length=mc.context_embedding_max_length,
        context_embedding_features=mc.context_embedding_features,
        use_xattn_time=mc.use_xattn_time,
        in_channels=mc.in_channels,
        channels=mc.channels,
        multipliers=tuple(mc.multipliers),
        factors=tuple(mc.factors),
        num_blocks=tuple(mc.num_blocks),
        attentions=tuple(mc.attentions),
        patch_size=mc.patch_size,
        resnet_groups=mc.resnet_groups,
        use_context_time=mc.use_context_time,
        kernel_multiplier_downsample=mc.kernel_multiplier_downsample,
        use_nearest_upsample=mc.use_nearest_upsample,
        use_skip_scale=mc.use_skip_scale,
        use_snake=mc.use_snake,
        out_channels=mc.out_channels,
        context_features=mc.context_features,
        context_features_multiplier=mc.context_features_multiplier,
        context_channels=tuple(mc.context_channels),
        attention_heads=mc.attention_heads,
        attention_features=mc.attention_features,
        attention_multiplier=mc.attention_multiplier,
        tie_transformer_projections=mc.tie_transformer_projections,
        use_flash_attention=mc.use_flash_attention,
        flash_min_seq_len=mc.flash_min_seq_len,
        remat=mc.remat,
        use_stft=mc.use_stft,
        use_stft_context=mc.use_stft_context,
        stft_num_fft=mc.stft_num_fft,
        stft_hop_length=mc.stft_hop_length,
    )
