"""Audio evaluation metrics.

Fréchet Audio Distance machinery (Fréchet distance between Gaussian fits of
embedding distributions) with a pluggable embedding function. The canonical
FAD embedder (VGGish) needs pretrained weights that can't be fetched in a
no-egress environment, so the default embedder is a deterministic log-mel
statistics map — relative comparisons (baseline vs candidate against a shared
reference set) remain meaningful, and a converted VGGish/CLAP can be dropped
in via `embed_fn`.

All heavy math is jax (batched on device).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _mel_filterbank(
    num_mels: int, num_fft_bins: int, sample_rate: int
) -> np.ndarray:
    """Slaney-style mel filterbank (static numpy, baked at trace time)."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    fmax = sample_rate / 2
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), num_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((num_fft_bins * 2 - 1) * freqs / sample_rate).astype(int)
    fb = np.zeros((num_mels, num_fft_bins), np.float32)
    for i in range(num_mels):
        lo, ctr, hi = bins[i], bins[i + 1], bins[i + 2]
        for b in range(lo, ctr):
            if ctr > lo:
                fb[i, b] = (b - lo) / (ctr - lo)
        for b in range(ctr, hi):
            if hi > ctr:
                fb[i, b] = (hi - b) / (hi - ctr)
    return fb


def log_mel_embedding(
    audio: jnp.ndarray,
    sample_rate: int = 48_000,
    num_mels: int = 64,
    frame: int = 1024,
    hop: int = 512,
) -> jnp.ndarray:
    """audio (B, T) or (B, T, ch) -> per-frame log-mel features (B*F, num_mels).

    Deterministic stand-in embedder for FAD when no pretrained audio encoder
    is available.
    """
    if audio.ndim == 3:
        audio = jnp.mean(audio, axis=-1)
    b, t = audio.shape
    n_frames = max(1, (t - frame) // hop + 1)
    idx = np.arange(frame)[None, :] + np.arange(n_frames)[:, None] * hop
    window = jnp.asarray(np.hanning(frame).astype(np.float32))
    frames = audio[:, idx] * window[None, None, :]
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # (B, F, bins)
    fb = jnp.asarray(_mel_filterbank(num_mels, spec.shape[-1], sample_rate))
    mel = jnp.einsum("bfk,mk->bfm", spec, fb)
    logmel = jnp.log(mel + 1e-8)
    return logmel.reshape(b * n_frames, num_mels)


def _sqrtm_psd(mat: jnp.ndarray) -> jnp.ndarray:
    """Matrix square root of a PSD matrix via eigendecomposition."""
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.maximum(vals, 0.0)
    return (vecs * jnp.sqrt(vals)[None, :]) @ vecs.T


def frechet_distance(
    mu1: jnp.ndarray, sigma1: jnp.ndarray, mu2: jnp.ndarray, sigma2: jnp.ndarray
) -> jnp.ndarray:
    """FID/FAD core: ||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^(1/2))."""
    diff = mu1 - mu2
    s1h = _sqrtm_psd(sigma1)
    covmean = _sqrtm_psd(s1h @ sigma2 @ s1h)
    dist = jnp.dot(diff, diff) + jnp.trace(sigma1 + sigma2 - 2.0 * covmean)
    # mathematically >= 0; eigh noise can produce tiny negatives for
    # near-identical Gaussians (standard FID implementations clamp too)
    return jnp.maximum(dist, 0.0)


def _fit_gaussian(emb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mu = jnp.mean(emb, axis=0)
    centered = emb - mu
    sigma = (centered.T @ centered) / jnp.maximum(emb.shape[0] - 1, 1)
    return mu, sigma


def frechet_audio_distance(
    reference_audio: jnp.ndarray,
    candidate_audio: jnp.ndarray,
    sample_rate: int = 48_000,
    embed_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> float:
    """FAD between two audio sets (B, T[, ch]) under `embed_fn`
    (default: log-mel statistics)."""
    if embed_fn is None:
        embed_fn = lambda a: log_mel_embedding(a, sample_rate)  # noqa: E731
    mu_r, sig_r = _fit_gaussian(embed_fn(reference_audio))
    mu_c, sig_c = _fit_gaussian(embed_fn(candidate_audio))
    return float(frechet_distance(mu_r, sig_r, mu_c, sig_c))


def signal_to_noise_ratio(
    reference: jnp.ndarray, estimate: jnp.ndarray
) -> jnp.ndarray:
    """Per-example SNR in dB over matching-shape signals."""
    axes = tuple(range(1, reference.ndim))
    num = jnp.sum(jnp.square(reference), axis=axes)
    den = jnp.sum(jnp.square(reference - estimate), axis=axes)
    return 10.0 * jnp.log10(num / jnp.maximum(den, 1e-12))


def spectral_convergence(
    reference: jnp.ndarray, estimate: jnp.ndarray, frame: int = 1024, hop: int = 256
) -> jnp.ndarray:
    """||S_ref - S_est||_F / ||S_ref||_F over magnitude spectrograms (B,)."""
    if reference.ndim == 3:
        reference = jnp.mean(reference, axis=-1)
        estimate = jnp.mean(estimate, axis=-1)
    b, t = reference.shape
    n_frames = max(1, (t - frame) // hop + 1)
    idx = np.arange(frame)[None, :] + np.arange(n_frames)[:, None] * hop
    window = jnp.asarray(np.hanning(frame).astype(np.float32))

    def mag(x):
        return jnp.abs(jnp.fft.rfft(x[:, idx] * window[None, None, :], axis=-1))

    s_ref, s_est = mag(reference), mag(estimate)
    num = jnp.sqrt(jnp.sum(jnp.square(s_ref - s_est), axis=(1, 2)))
    den = jnp.sqrt(jnp.sum(jnp.square(s_ref), axis=(1, 2)))
    return num / jnp.maximum(den, 1e-12)
