from .mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from .spatial import make_spatial_infer, pad_rows

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "make_spatial_infer",
    "pad_rows",
]
