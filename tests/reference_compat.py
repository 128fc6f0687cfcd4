"""Import the reference PyTorch model for golden parity tests.

The reference's heavy deps (dac, einops_exts, encodec) are absent from this
image; light stubs are installed for the imports its model module needs.
This is test-time observation of reference *behavior* — no reference code is
copied into the framework.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_stubs():
    import torch
    import torch.nn as nn
    from einops import rearrange

    if "dac" not in sys.modules:
        dac = types.ModuleType("dac")
        dac_nn = types.ModuleType("dac.nn")
        dac_layers = types.ModuleType("dac.nn.layers")

        class Snake1d(nn.Module):  # DAC semantics: x + sin^2(a x)/a
            def __init__(self, channels):
                super().__init__()
                self.alpha = nn.Parameter(torch.ones(1, channels, 1))

            def forward(self, x):
                a = self.alpha + 1e-9
                return x + a.reciprocal() * torch.sin(a * x).pow(2)

        dac_layers.Snake1d = Snake1d
        dac_nn.layers = dac_layers
        dac.nn = dac_nn
        sys.modules["dac"] = dac
        sys.modules["dac.nn"] = dac_nn
        sys.modules["dac.nn.layers"] = dac_layers

    if "einops_exts" not in sys.modules:
        ee = types.ModuleType("einops_exts")

        def rearrange_many(tensors, pattern, **kwargs):
            return tuple(rearrange(t, pattern, **kwargs) for t in tensors)

        ee.rearrange_many = rearrange_many
        sys.modules["einops_exts"] = ee


def import_reference_unet():
    """Returns the reference jen1.model.model module (UNet1d/UNetCFG1d)."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import jen1.model.model as ref_model  # noqa: PLC0415

    return ref_model
