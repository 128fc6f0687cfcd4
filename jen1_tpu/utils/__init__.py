"""Shared utilities (L5)."""

from jen1_tpu.utils.logger import MetricLogger, get_logger  # noqa: F401
