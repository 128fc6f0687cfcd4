"""Low-level neural ops (L3a primitives), channels-last (B, L, C).

TPU-native replacements for the reference's torch ops (jen1/model/blocks.py,
utils/module.py): omnidirectional conv1d, group/layer norm, FiLM, attention
(Pallas flash kernel + XLA fallback), snake, STFT, embeddings.
"""

from jen1_tpu.ops.conv import (  # noqa: F401
    conv1d,
    conv_transpose1d,
    OmniConv1d,
    Downsample1d,
    Upsample1d,
)
from jen1_tpu.ops.norm import GroupNorm, LayerNorm  # noqa: F401
from jen1_tpu.ops.embeddings import (  # noqa: F401
    FixedEmbedding,
    LearnedPositionalEmbedding,
    NumberEmbedder,
    SinusoidalEmbedding,
    TimePositionalEmbedding,
    rand_bool,
)
from jen1_tpu.ops.attention import Attention, dot_product_attention  # noqa: F401
from jen1_tpu.ops.snake import Snake1d, snake  # noqa: F401
