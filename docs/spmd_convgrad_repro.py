"""Standalone repro: SPMD conv kernel-grad double-count (jax 0.9.0).

One lax.conv_general_dilated, spatial dim sharded over mesh axis 'sp',
input partially replicated over the remaining axes, kernel replicated.
The kernel GRADIENT comes back multiplied by the input's replication
degree (exact integer ratios); the forward and einsum grads are exact.
Both Shardy and legacy GSPMD reproduce. See docs/SPMD_TRIPLE_REPRO.md.

Run: python docs/spmd_convgrad_repro.py  [gspmd]
"""
import os
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=0 "
    "--xla_llvm_disable_expensive_passes=true",
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if len(sys.argv) > 1 and sys.argv[1] == "gspmd":
    jax.config.update("jax_use_shardy_partitioner", False)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def loss(w, x):
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return jnp.mean(y * y)


def main():
    print(f"jax {jax.__version__}  shardy={jax.config.jax_use_shardy_partitioner}")
    r = np.random.default_rng(0)
    B, L, C, K = 4, 48, 16, 5
    x = jnp.asarray(r.normal(size=(B, L, C)).astype(np.float32))
    w = jnp.asarray(r.normal(size=(K, C, C)).astype(np.float32) / 8)
    g_ref = np.asarray(jax.jit(jax.grad(loss))(w, x))
    dev = jax.devices()
    for (d, s, t) in [(2, 2, 2), (2, 2, 1), (1, 2, 2), (4, 2, 1), (1, 4, 1)]:
        mesh = Mesh(np.asarray(dev[: d * s * t]).reshape(d, s, t),
                    ("dp", "sp", "tp"))
        for spec, name in ((P("dp", "sp"), "dp,sp"), (P(None, "sp"), "-,sp")):
            xs = jax.device_put(x, NamedSharding(mesh, spec))
            ws = jax.device_put(w, NamedSharding(mesh, P()))
            g = np.asarray(jax.jit(jax.grad(loss))(ws, xs))
            ratio = g / np.where(np.abs(g_ref) > 1e-12, g_ref, np.nan)
            print(f"mesh={d}x{s}x{t} x=({name:5s}): "
                  f"max|dgrad|={np.max(np.abs(g - g_ref)):.2e} "
                  f"grad ratio[min,med,max]=[{np.nanmin(ratio):.3f},"
                  f"{np.nanmedian(ratio):.3f},{np.nanmax(ratio):.3f}]")


if __name__ == "__main__":
    main()
