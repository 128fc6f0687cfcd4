"""Conditioning (L2): metadata dicts -> {key: (embedding, mask)}."""

from jen1_tpu.conditioning.conditioners import (  # noqa: F401
    Conditioner,
    IntConditioner,
    MultiConditioner,
    NumberConditioner,
    T5Conditioner,
    create_multi_conditioner,
)
