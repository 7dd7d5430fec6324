"""Device mesh + sharding helpers (data- and spatial-parallel over ICI)."""

from .mesh import (
    batch_sharding,
    get_mesh,
    get_mesh_2d,
    replicated,
    shard_batch,
)

__all__ = [
    "get_mesh",
    "get_mesh_2d",
    "batch_sharding",
    "replicated",
    "shard_batch",
]
