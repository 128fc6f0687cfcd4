"""Test harness config.

* Runs on CPU with 8 virtual devices so multi-chip mesh sharding is exercised
  hermetically (SURVEY §4 implication (c)).
* In this image jax is pre-imported at interpreter startup, so JAX_PLATFORMS /
  JAX_PLATFORM_NAME env vars are read too early to matter — the platform must
  be forced via jax.config before first backend use. XLA_FLAGS is still read
  at backend init, so setting it here works.
* Enables the persistent XLA compilation cache: this host has ONE CPU core,
  so cold compiles of the jitted train/sample graphs dominate test time; the
  cache makes re-runs cheap.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jen1_tpu_test_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
