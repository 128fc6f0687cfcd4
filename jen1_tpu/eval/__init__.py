"""Evaluation metrics (the reference lists torchmetrics but never implements
any metric — SURVEY §2.3 'unused-in-code'; BASELINE's quality axis is FAD)."""

from jen1_tpu.eval.metrics import (  # noqa: F401
    frechet_audio_distance,
    frechet_distance,
    log_mel_embedding,
    signal_to_noise_ratio,
    spectral_convergence,
)
