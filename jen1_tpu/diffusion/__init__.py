"""Diffusion processes (L3b): discrete Gaussian (DDPM/DDIM) + continuous VDM.

Samplers are jit-compiled lax.scan loops — the entire 100-step trajectory runs
on-device with zero host round-trips (reference runs Python loops:
jen1/diffusion/gdm/gdm.py:174,202; jen1/diffusion/vdm/vdm.py:67).
"""

from jen1_tpu.diffusion.schedules import get_beta_schedule  # noqa: F401
from jen1_tpu.diffusion.gdm import GaussianDiffusion  # noqa: F401
from jen1_tpu.diffusion.vdm import VDM  # noqa: F401
