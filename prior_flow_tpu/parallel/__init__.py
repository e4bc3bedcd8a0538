from .mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    replicated,
    shard_batch,
    spatial_batch_sharding,
)

__all__ = ["batch_sharding", "make_mesh", "make_mesh_2d", "replicated",
           "shard_batch", "spatial_batch_sharding"]
