"""Multi-task latent masks (the omnidirectional task definitions).

TPU-native rebuild of UnifiedMultiTaskTrainer.random_mask (trainer.py:215-247):

  text_guided   -> all-zero mask (masked_input is fully hidden); causal flag
                   drawn uniformly at random per step (trainer.py:222-223)
  music_inpaint -> a contiguous region of random length in [0.2L, 0.8L] at a
                   random start is zeroed; bidirectional
  music_cont    -> the last random-length region in [0.2L, 0.8L] is zeroed;
                   causal

Masks are generated inside jit with jax.random over static lengths (one mask
shared across the sub-batch, as in the reference). The reference's
`random.randint` with float bounds (SURVEY §2.5 #7, a TypeError on py>=3.10)
is implemented with proper integer bounds.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

TASKS = ("text_guided", "music_inpaint", "music_cont")
# Composer (multi-track) adds the track-subset generation task: a random
# subset of tracks is given as context and the rest are generated
# (models/composer.py; BASELINE configs[4] — no reference counterpart).
COMPOSER_TASKS = TASKS + ("track_gen",)


def random_task_mask(
    rng: jax.Array, batch: int, length: int, task: str, n_tracks: int = 1
) -> jnp.ndarray:
    """Returns mask (batch, length, n_tracks) float32; 1 = keep, 0 = hidden.

    With n_tracks > 1 (Composer), the temporal tasks tile their mask over
    every track channel, and 'track_gen' draws a random track subset
    (random_track_mask) instead of a temporal region."""
    if task == "track_gen":
        if n_tracks <= 1:
            raise ValueError("track_gen task needs model_config.n_tracks > 1")
        from jen1_tpu.models.composer import random_track_mask

        return random_track_mask(rng, batch, length, n_tracks)

    idx = jnp.arange(length)[:, None]  # (L, 1)
    lo = max(int(0.2 * length), 1)
    hi = max(int(0.8 * length), lo + 1)

    if task == "text_guided":
        mask = jnp.zeros((length, 1), jnp.float32)
    elif task == "music_inpaint":
        rng_len, rng_start = jax.random.split(rng)
        mask_len = jax.random.randint(rng_len, (), lo, hi + 1)
        start = jax.random.randint(rng_start, (), 0, length - mask_len + 1)
        hidden = (idx >= start) & (idx < start + mask_len)
        mask = jnp.where(hidden, 0.0, 1.0)
    elif task == "music_cont":
        mask_len = jax.random.randint(rng, (), lo, hi + 1)
        hidden = idx >= (length - mask_len)
        mask = jnp.where(hidden, 0.0, 1.0)
    else:
        raise ValueError(f"unknown task: {task}")

    return jnp.broadcast_to(mask[None], (batch, length, n_tracks))


def task_is_causal(task: str, text_guided_causal: bool) -> bool:
    """Static causal flag per task (trainer.py:222-241). text_guided's flag is
    random per step; the host draws it and selects the compiled variant."""
    if task == "text_guided":
        return text_guided_causal
    if task == "music_inpaint":
        return False
    if task == "music_cont":
        return True
    if task == "track_gen":
        return False  # track context is bidirectional by construction
    raise ValueError(f"unknown task: {task}")


def apply_mask(
    latents: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(masked_input, mask) pair for the channel-concat conditioning path."""
    return latents * mask.astype(latents.dtype), mask
