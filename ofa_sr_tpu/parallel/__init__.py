from .mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from .spatial import make_spatial_infer, pad_rows

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "make_spatial_infer",
    "pad_rows",
]
