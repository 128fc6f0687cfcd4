"""JEN-1-Composer-style multi-track conditioning (BASELINE configs[4]).

Tracks live as channel groups in one latent: (B, L, D * n_tracks), with the
channel-concat conditioning carrying each track's masked latent plus a
per-track mask channel — so any SUBSET of tracks can condition generation of
the rest (track-wise inpainting generalizes the single-track task masks in
train/tasks.py). Pure functions, jit-safe; the UNet itself is the standard
UNetCFG1d built from `config.composer_config(n_tracks)`.

There is no Composer code in the reference repo (single-track only); this
implements the capability the BASELINE stretch config names, reusing the
reference's masked_input+mask concat mechanism (generation.py:117-126).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def track_mask(
    batch: int,
    length: int,
    n_tracks: int,
    keep_tracks: Sequence[int],
) -> jnp.ndarray:
    """(B, L, n_tracks) mask: 1 for tracks given as context, 0 to generate."""
    keep = jnp.zeros((n_tracks,), jnp.float32)
    if len(keep_tracks):
        keep = keep.at[jnp.asarray(list(keep_tracks), jnp.int32)].set(1.0)
    return jnp.broadcast_to(keep[None, None, :], (batch, length, n_tracks))


def random_track_mask(
    rng: jax.Array, batch: int, length: int, n_tracks: int
) -> jnp.ndarray:
    """Training mask: each track independently kept with p=0.5, with the
    all-kept corner re-rolled to all-hidden (there must be something to
    generate). Shared across the batch like the single-track task masks."""
    bits = jax.random.bernoulli(rng, 0.5, (n_tracks,)).astype(jnp.float32)
    all_kept = jnp.all(bits == 1.0)
    bits = jnp.where(all_kept, jnp.zeros_like(bits), bits)
    return jnp.broadcast_to(bits[None, None, :], (batch, length, n_tracks))


def expand_track_mask(mask: jnp.ndarray, track_dim: int) -> jnp.ndarray:
    """(B, L, n_tracks) -> (B, L, n_tracks * track_dim): each track's scalar
    mask repeated over its latent channel group."""
    return jnp.repeat(mask, track_dim, axis=-1)


def composer_conditioning(
    latents: jnp.ndarray,  # (B, L, n_tracks * track_dim)
    mask: jnp.ndarray,  # (B, L, n_tracks)
    track_dim: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(masked_input, mask_channels) for the channel-concat path: the masked
    multi-track latent plus one mask channel per track — matching
    composer_config's context_channels = (n_tracks * track_dim + n_tracks,)."""
    full = expand_track_mask(mask, track_dim)
    return latents * full.astype(latents.dtype), mask


def stack_tracks(tracks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """n_tracks x (B, L, D) -> (B, L, n_tracks * D) channel-group layout."""
    return jnp.concatenate(list(tracks), axis=-1)


def split_tracks(latents: jnp.ndarray, n_tracks: int) -> Tuple[jnp.ndarray, ...]:
    """(B, L, n_tracks * D) -> n_tracks x (B, L, D)."""
    return tuple(jnp.split(latents, n_tracks, axis=-1))


def generate_tracks(
    diffusion,
    model_fn,
    *,
    rng: jax.Array,
    n_tracks: int,
    track_dim: int,
    length: int,
    text_cond: dict,
    context_tracks: Optional[dict] = None,
    batch: int = 1,
    causal: bool = False,
    **sample_kw,
):
    """Track-conditional sampling: `context_tracks` maps track index ->
    (B, L, track_dim) latent given as context; the remaining tracks are
    generated. Returns (B, L, n_tracks * track_dim).

    text_cond: {'cross_attn_cond', 'cross_attn_masks', 'global_cond'} from
    the conditioner; the input_concat entry is assembled here."""
    context_tracks = context_tracks or {}
    keep = sorted(context_tracks.keys())
    base = jnp.zeros((batch, length, n_tracks * track_dim), jnp.float32)
    for ti, lat in context_tracks.items():
        base = base.at[..., ti * track_dim : (ti + 1) * track_dim].set(
            lat.astype(jnp.float32)
        )
    mask = track_mask(batch, length, n_tracks, keep)
    masked_input, mask_ch = composer_conditioning(base, mask, track_dim)
    conditioning = dict(text_cond)
    conditioning["input_concat_cond"] = jnp.concatenate(
        [masked_input, mask_ch], axis=-1
    )
    shape = (batch, length, n_tracks * track_dim)
    return diffusion.sample(
        model_fn, shape, conditioning, rng, causal=causal, **sample_kw
    )
