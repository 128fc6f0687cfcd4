"""Persistent XLA compilation cache setup.

On this class of host (single-core CPU driving a remote TPU) a cold compile of
the train step or sampler costs minutes; the persistent cache amortizes it
across processes and rounds. Called by the CLIs (train, preprocess, bench,
graft entry); importing the library never mutates global jax config.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jen1_tpu_xla")


def _env_flag(name: str, default: bool) -> bool:
    val = os.environ.get(name)
    if val is None:
        return default
    return val.strip().lower() not in ("0", "false", "no", "")


def enable_compile_cache(directory: str | None = None) -> None:
    import jax

    if jax.default_backend() == "cpu" and _env_flag("JEN1_TPU_NO_CPU_CACHE", True):
        # On this image, XLA:CPU AOT cache entries are written with compile-
        # target pseudo-features (+prefer-no-scatter/+prefer-no-gather) that
        # fail the loader's host-feature check — entries never load back, so
        # the cache is pure serialization overhead on CPU. Hosts where CPU
        # entries DO load can opt back in with JEN1_TPU_NO_CPU_CACHE=0.
        return
    directory = directory or os.environ.get("JEN1_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
