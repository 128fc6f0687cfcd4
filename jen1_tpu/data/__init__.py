"""Data pipeline (L1): corpus scan, windowing, wav->latent preprocessing."""

from jen1_tpu.data.dataset import (  # noqa: F401
    LatentDataset,
    MusicDataset,
    make_dataloader,
)
