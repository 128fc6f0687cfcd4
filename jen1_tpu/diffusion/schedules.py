"""Noise schedules (reference: jen1/diffusion/gdm/noise_schedule.py:7-31).

Returned as numpy float64 -> float32 arrays; these are trace-time constants
baked into the compiled graphs.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def get_beta_schedule(
    schedule_name: str, num_diffusion_timesteps: int
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        beta_start = scale * 0.0001
        beta_end = scale * 0.02
        return (
            np.linspace(
                beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64
            ).astype(np.float32),
            None,
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(
    num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float32), None


def trig_angle_schedule(num_steps: int, seed: int = 0):
    """Random-angle (sin, cos) table — parity with the unused root copy
    (reference: jen1/noise_schedule.py:35-41, never imported)."""
    rng = np.random.default_rng(seed)
    angles = rng.uniform(0.0, math.pi / 2, size=(num_steps,))
    return np.sin(angles).astype(np.float32), np.cos(angles).astype(np.float32)
