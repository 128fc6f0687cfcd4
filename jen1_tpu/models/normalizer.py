"""Latent normalizer.

The reference ships an empty stub (jen1/normalizer.py:4-7 — SURVEY §2.5 #14).
This is a working implementation: per-channel affine normalization of codec
latents fitted from data, so diffusion operates on ~unit-scale inputs (the
DDIM clip at +-1, gdm.py clip_x_start, assumes roughly normalized latents).
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np


class Normalizer:
    """z = (x - mean) / std per channel; fitted by streaming moments."""

    def __init__(
        self,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        eps: float = 1e-6,
    ):
        self.mean = None if mean is None else jnp.asarray(mean, jnp.float32)
        self.std = None if std is None else jnp.asarray(std, jnp.float32)
        self.eps = eps

    @classmethod
    def fit(cls, batches: Iterable[np.ndarray], eps: float = 1e-6) -> "Normalizer":
        """batches: iterable of (B, L, C) latents; one streaming pass."""
        count = 0
        total = None
        total_sq = None
        for b in batches:
            b = np.asarray(b, np.float64)
            flat = b.reshape(-1, b.shape[-1])
            if total is None:
                total = flat.sum(0)
                total_sq = (flat**2).sum(0)
            else:
                total += flat.sum(0)
                total_sq += (flat**2).sum(0)
            count += flat.shape[0]
        assert count > 0, "Normalizer.fit needs data"
        mean = total / count
        var = np.maximum(total_sq / count - mean**2, 0.0)
        return cls(mean=mean.astype(np.float32), std=np.sqrt(var).astype(np.float32), eps=eps)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.mean is not None, "Normalizer not fitted"
        return (x - self.mean.astype(x.dtype)) / (
            self.std.astype(x.dtype) + self.eps
        )

    def inverse(self, z: jnp.ndarray) -> jnp.ndarray:
        assert self.mean is not None, "Normalizer not fitted"
        return z * (self.std.astype(z.dtype) + self.eps) + self.mean.astype(z.dtype)

    def save(self, path: str) -> None:
        np.savez(path, mean=np.asarray(self.mean), std=np.asarray(self.std))

    @classmethod
    def load(cls, path: str) -> "Normalizer":
        data = np.load(path)
        return cls(mean=data["mean"], std=data["std"])
