from wmfml_tpu.parallel.mesh import (
    MeshContext,
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "MeshContext",
    "batch_sharding",
    "create_mesh",
    "replicated_sharding",
    "shard_batch",
]
