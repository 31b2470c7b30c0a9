"""Device-mesh parallelism: DP batch sharding + optional TP weight sharding."""

from nylon_amt_tpu.parallel.mesh import (
    batch_spec,
    make_mesh,
    param_partition_specs,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_spec",
    "make_mesh",
    "param_partition_specs",
    "shard_batch",
    "shard_params",
]
