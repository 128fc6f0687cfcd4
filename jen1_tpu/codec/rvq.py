"""Residual vector quantization (EnCodec RVQ), pure-jax.

16 codebooks x 1024 entries x 128 dims for the 48 kHz model. Each stage
quantizes the residual of the previous stages by nearest (euclidean)
codebook entry; `decode` sums per-stage embeddings. The reference uses the
codes purely as a quantize-dequantize bottleneck to get *continuous* latents
(dataset/dataloader.py:111-113, generation.py:145-150) — `quantize_latent`
below is that exact path.

Nearest-neighbor search is expressed as one (B*T, bins) matmul per stage
(-2 x.e^T + ||e||^2 argmin) so it runs on the MXU, not as a gather loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ResidualVectorQuantizer:
    """Inference-mode RVQ over channels-last latents (B, T, D)."""

    def __init__(
        self,
        codebooks: jnp.ndarray,  # (n_q, bins, dim)
        frame_rate: float = 150.0,
        bits_per_codebook: Optional[int] = None,
    ):
        self.codebooks = jnp.asarray(codebooks, jnp.float32)
        self.n_q, self.bins, self.dim = self.codebooks.shape
        self.frame_rate = frame_rate
        self.bits_per_codebook = bits_per_codebook or int(np.log2(self.bins))

    @classmethod
    def random_init(
        cls, n_q: int = 16, bins: int = 1024, dim: int = 128, seed: int = 0
    ) -> "ResidualVectorQuantizer":
        cb = jax.random.normal(jax.random.PRNGKey(seed), (n_q, bins, dim))
        return cls(cb)

    def num_quantizers_for_bandwidth(
        self, bandwidth: Optional[float]
    ) -> int:
        """kbps -> number of codebooks (EnCodec semantics; None -> all).

        The reference never sets a target bandwidth, so all 16 stages are
        used (SURVEY L0; encodec RVQ defaults)."""
        if bandwidth is None or bandwidth <= 0:
            return self.n_q
        bw_per_q = self.frame_rate * self.bits_per_codebook / 1000.0
        return max(1, int(bandwidth // bw_per_q))

    # ------------------------------------------------------------------ ops

    def encode(
        self, x: jnp.ndarray, n_q: Optional[int] = None
    ) -> jnp.ndarray:
        """latent (B, T, D) -> codes (B, n_q, T) int32."""
        n_q = n_q or self.n_q

        from jen1_tpu.ops.conv import matmul_precision

        def stage(residual, cb):
            # cb: (bins, dim). dist = ||r||^2 - 2 r.e + ||e||^2; argmin over bins
            dots = jnp.einsum(
                "btd,kd->btk",
                residual,
                cb,
                precision=matmul_precision(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            e_sq = jnp.sum(jnp.square(cb), axis=-1)
            idx = jnp.argmin(e_sq[None, None, :] - 2.0 * dots, axis=-1)
            quantized = cb[idx]
            return residual - quantized, idx

        residual = x.astype(jnp.float32)
        codes = []
        for i in range(n_q):
            residual, idx = stage(residual, self.codebooks[i])
            codes.append(idx)
        return jnp.stack(codes, axis=1).astype(jnp.int32)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (B, n_q, T) -> continuous latent (B, T, D)."""
        n_q = codes.shape[1]
        out = 0.0
        for i in range(n_q):
            out = out + self.codebooks[i][codes[:, i]]
        return out

    def quantize_latent(
        self, x: jnp.ndarray, n_q: Optional[int] = None
    ) -> jnp.ndarray:
        """Quantize-dequantize bottleneck: the reference's codes->decode path
        (generation.py:145-150) in one fused call."""
        return self.decode(self.encode(x, n_q))
