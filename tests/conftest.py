"""Test harness config.

* Runs on CPU with 8 virtual devices so multi-chip mesh sharding is exercised
  hermetically (SURVEY §4 implication (c)).
* In this image jax is pre-imported at interpreter startup, so JAX_PLATFORMS /
  JAX_PLATFORM_NAME env vars are read too early to matter — the platform must
  be forced via jax.config before first backend use. XLA_FLAGS is still read
  at backend init, so setting it here works.
* Compiles at --xla_backend_optimization_level=0: this host has ONE CPU core
  and cold XLA:CPU compiles dominate test time (tiny train step: 76 s at
  default level, 42 s at level 0; execution time is unchanged for test-size
  graphs). The persistent compilation cache is deliberately NOT enabled for
  tests: XLA:CPU AOT cache entries are written with compile-target pseudo-
  features (+prefer-no-scatter/+prefer-no-gather) that fail the loader's
  host-feature check, so entries never load back ("Loading XLA:CPU AOT
  result... machine features don't match" — verified on this image) and the
  cache only adds serialization overhead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    flags = (
        flags
        + " --xla_backend_optimization_level=0"
        + " --xla_llvm_disable_expensive_passes=true"
    )
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
