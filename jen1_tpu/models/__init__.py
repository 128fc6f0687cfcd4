"""Denoiser models (L3a). Channels-last flax modules."""

from jen1_tpu.models.unet import UNet1d, UNetCFG1d  # noqa: F401
