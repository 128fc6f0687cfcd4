"""Logging & metrics (reference: utils/logger.py:9-36).

stdlib file logger + a MetricLogger that writes JSONL always and TensorBoard
scalars when torch's SummaryWriter is importable (capability parity with the
reference's `summarize`, minus the hard torch dependency).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional


def get_logger(log_dir: str, filename: str = "train.log") -> logging.Logger:
    logger = logging.getLogger("jen1_tpu")
    logger.setLevel(logging.INFO)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, filename)
        if not any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == os.path.abspath(path)
            for h in logger.handlers
        ):
            h = logging.FileHandler(path)
            h.setFormatter(
                logging.Formatter("%(asctime)s\t%(name)s\t%(levelname)s\t%(message)s")
            )
            logger.addHandler(h)
    return logger


class MetricLogger:
    """Scalars -> metrics.jsonl (+ TensorBoard when available)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=log_dir)
                except Exception:
                    self._tb = None

    def log(self, step: int, scalars: Dict[str, Any]) -> None:
        if self._jsonl is not None:
            rec = {"step": int(step), "time": time.time()}
            rec.update({k: float(v) for k, v in scalars.items()})
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def log_audio(self, step: int, tag: str, audio, sample_rate: int) -> None:
        if self._tb is not None:
            self._tb.add_audio(tag, audio, int(step), sample_rate=sample_rate)

    def log_histograms(self, step: int, tensors: Dict[str, Any]) -> None:
        """Parameter/gradient histograms (reference summarize's `histograms`
        dict, utils/logger.py:31-32). Accepts jax/numpy arrays."""
        if self._tb is not None:
            import numpy as np

            for tag, t in tensors.items():
                self._tb.add_histogram(tag, np.asarray(t), int(step))

    def log_images(self, step: int, images: Dict[str, Any]) -> None:
        """(C, H, W) image summaries (reference summarize's `images` dict,
        utils/logger.py:33-34) — e.g. latent spectrograms."""
        if self._tb is not None:
            import numpy as np

            for tag, img in images.items():
                self._tb.add_image(tag, np.asarray(img), int(step))

    def log_vectors(self, vectors: Dict[str, Any]) -> None:
        """Per-index scalar curves (reference summarize's `vectors` dict,
        utils/logger.py:28-30: each element logged at step=index) — e.g. a
        per-timestep loss profile."""
        if self._tb is not None:
            for tag, vec in vectors.items():
                for i, v in enumerate(vec):
                    self._tb.add_scalar(tag, float(v), i)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
