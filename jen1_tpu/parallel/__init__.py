"""Device-mesh parallelism (replaces the reference's DDP/NCCL, train.py:30,88)."""

from jen1_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)
