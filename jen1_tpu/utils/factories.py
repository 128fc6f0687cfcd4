"""Object factories with reference-parity names (utils/script_util.py:181-284).

Thin wrappers over the per-module factories so a reference user finds the
same construction entry points: create_model / create_diffusion /
create_model_and_diffusion / create_multi_conditioner.
"""

from __future__ import annotations

from math import ceil, floor, log2
from typing import Optional, Tuple

from jen1_tpu.config import Config


def exists(x) -> bool:
    return x is not None


def default(x, y):
    if x is not None:
        return x
    return y() if callable(y) else y


def closest_power_2(x: float) -> int:
    """Reference: utils/module.py:13-17."""
    exponent = log2(x)
    candidates = (floor(exponent), ceil(exponent))
    return 2 ** int(min(candidates, key=lambda z: abs(x - 2**z)))


def create_model(config: Config):
    from jen1_tpu.models.unet import unet_from_model_config

    return unet_from_model_config(config.model_config)


def create_diffusion(config: Config, sampling_steps: Optional[int] = None):
    if config.diffusion_type.lower() == "gdm":
        from jen1_tpu.diffusion.gdm import create_gaussian_diffusion

        return create_gaussian_diffusion(
            config.diffusion_config.gaussian_diffusion, sampling_steps
        )
    if config.diffusion_type.lower() == "vdm":
        from jen1_tpu.diffusion.vdm import create_variational_diffusion

        return create_variational_diffusion(
            config.diffusion_config.variational_diffusion
        )
    raise ValueError(f"unknown diffusion_type: {config.diffusion_type}")


def create_model_and_diffusion(
    config: Config, sampling_steps: Optional[int] = None
) -> Tuple[object, object]:
    return create_model(config), create_diffusion(config, sampling_steps)


def create_multi_conditioner(conditioner_config):
    from jen1_tpu.conditioning.conditioners import (
        create_multi_conditioner as _create,
    )

    return _create(conditioner_config)
