"""User-facing inference API (L6)."""

from jen1_tpu.api.generation import Jen1, save_audio  # noqa: F401
