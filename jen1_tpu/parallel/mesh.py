"""Mesh construction and sharding rules.

The reference's only parallelism is DDP over NCCL (train.py:30-31,88-89 —
non-functional as written, SURVEY §2.2). Here parallelism is mesh-native:

  * 'dp' axis: batch-sharded data parallelism. Gradients are averaged by XLA
    collectives automatically because the loss is a mean over a dp-sharded
    batch — no hand-written allreduce.
  * 'tp' axis: tensor parallelism over the transformer projections (qkv/out,
    FFN in/out) via parameter shardings; XLA inserts the all-reduces at the
    row-sharded matmuls.

Collectives ride ICI within a slice; annotate-and-let-XLA-partition is the
whole design (no NCCL translation).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = -1,
    tp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence[Any]] = None,
    axis_names: Tuple[str, str, str] = ("dp", "sp", "tp"),
) -> Mesh:
    """dp: batch axis. sp: sequence axis (GSPMD spatially partitions the
    UNet's length dimension incl. conv halo exchanges — long-form latents).
    tp: Megatron tensor axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % (tp * sp) == 0, f"{n} devices not divisible by tp*sp"
        dp = n // (tp * sp)
    used = dp * sp * tp
    assert used <= n, f"dp*sp*tp({used}) > available devices({n})"
    arr = np.asarray(devices[:used]).reshape(dp, sp, tp)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """(B, L, C): batch over dp, length over sp — for latent-like tensors."""
    return NamedSharding(mesh, P("dp", "sp"))


def shard_batch(batch, mesh: Mesh):
    """device_put every leaf with its leading axis over dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


# Tensor-parallel rules: (path regex, PartitionSpec). Column-parallel for the
# input projections (shard the output features), row-parallel for the output
# projections (shard the input features) — the Megatron pattern; XLA emits a
# single all-reduce after each row-parallel matmul.
_TP_RULES = (
    (re.compile(r"(to_q|to_kv)/kernel$"), P(None, "tp")),
    (re.compile(r"attention/to_out/kernel$"), P("tp", None)),
    (re.compile(r"cross_attention/to_out/kernel$"), P("tp", None)),
    (re.compile(r"feed_forward/linear1/kernel$"), P(None, "tp")),
    (re.compile(r"feed_forward/linear1/bias$"), P("tp")),
    (re.compile(r"feed_forward/linear2/kernel$"), P("tp", None)),
)


def _spec_for_path(
    path: str, shape: Tuple[int, ...], tp_size: int, fsdp_size: int = 1
) -> P:
    if tp_size > 1:
        for pattern, spec in _TP_RULES:
            if pattern.search(path):
                # only shard if the sharded dim divides evenly
                ok = True
                for dim, name in zip(shape, spec):
                    if name == "tp" and dim % tp_size != 0:
                        ok = False
                if ok:
                    return spec
    if fsdp_size > 1:
        # FSDP/ZeRO-3 over the dp axis: shard the largest divisible dim of
        # every remaining parameter; XLA all-gathers it at use and
        # reduce-scatters its gradient (GSPMD handles the collectives).
        best = max(
            (d for d, n in enumerate(shape) if n % fsdp_size == 0 and n > 1),
            key=lambda d: shape[d],
            default=None,
        )
        if best is not None:
            return P(*(("dp" if d == best else None) for d in range(len(shape))))
    return P()


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree for a flax params dict: Megatron TP rules on the
    attention/FFN projections, plus (fsdp=True) ZeRO-3-style sharding of all
    remaining params over the dp axis."""
    tp_size = mesh.shape.get("tp", 1)
    fsdp_size = mesh.shape.get("dp", 1) if fsdp else 1
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) if not isinstance(k, str) else k
            for k in [getattr(p, "key", getattr(p, "idx", str(p))) for p in kp]
        )

    specs = {}
    for kp, leaf in flat:
        specs[jax.tree_util.keystr(kp)] = NamedSharding(
            mesh, _spec_for_path(path_str(kp), leaf.shape, tp_size, fsdp_size)
        )

    def assign(kp, leaf):
        return specs[jax.tree_util.keystr(kp)]

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """device_put params with TP (+ optional FSDP) shardings."""
    sh = param_shardings(params, mesh, fsdp=fsdp)
    return jax.tree.map(jax.device_put, params, sh)
