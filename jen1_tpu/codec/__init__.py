"""Neural audio codec (L0 equivalent): EnCodec-48k in JAX.

The reference leans on the `encodec` pip package for its latent space
(dataset/dataloader.py:27,108-114; generation.py:34,145-150): 48 kHz stereo,
SEANet encoder/decoder + 2-layer LSTM + 16-stage residual vector quantizer,
128-dim latents at 150 frames/s. This package is a from-scratch JAX
implementation of that architecture with a torch-checkpoint importer
(codec/convert.py) — pretrained weights load offline from a local file.
"""

from jen1_tpu.codec.model import EncodecModel, encodec_48khz_config  # noqa: F401
from jen1_tpu.codec.rvq import ResidualVectorQuantizer  # noqa: F401
