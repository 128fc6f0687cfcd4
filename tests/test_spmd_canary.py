"""Canary for the upstream SPMD conv kernel-grad double-count bug.

This test asserts the UPSTREAM BUG still exists (docs/SPMD_TRIPLE_REPRO.md):
the kernel gradient of a spatially-sharded conv whose input is partially
replicated over other mesh axes comes back exactly 2x. When jax/XLA fix it,
this test FAILS — that is the signal to re-evaluate the tp+fsdp+sp
exclusion in jen1_tpu/train/trainer.py (_reject_tp_fsdp_sp_triple) and the
phase-B fsdp=False fence in __graft_entry__.py, then delete this canary.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _loss(w, x):
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return jnp.mean(y * y)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_upstream_convgrad_double_count_still_present():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(4, 48, 16)).astype(np.float32))
    w = jnp.asarray(r.normal(size=(5, 16, 16)).astype(np.float32) / 8)
    g_ref = np.asarray(jax.jit(jax.grad(_loss))(w, x))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("dp", "sp", "tp"))
    # input sharded on sp over the conv's spatial dim, replicated over tp
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    g = np.asarray(jax.jit(jax.grad(_loss))(ws, xs))

    ratio = g / np.where(np.abs(g_ref) > 1e-12, g_ref, 1.0)
    med = float(np.median(ratio))
    assert np.allclose(med, 2.0, atol=1e-3), (
        f"median kernel-grad ratio {med}: the upstream SPMD conv-grad "
        f"double-count appears FIXED (or changed). Re-evaluate the "
        f"tp+fsdp+sp exclusion (docs/SPMD_TRIPLE_REPRO.md) and delete "
        f"this canary."
    )
