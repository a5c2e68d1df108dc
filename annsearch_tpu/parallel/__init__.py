"""Multi-chip sharding layer (mesh + shard_map query/build)."""

from .ivf_sharded import (
    ShardedIvfIndex,
    ShardedIvfPqIndex,
    train_centroids_sharded,
)
from .mesh import DB_AXIS, make_mesh
from .sharded import (
    BatchShardedExhaustive,
    ShardedExhaustive,
    batch_sharded_topk,
    sharded_topk,
)

__all__ = [
    "DB_AXIS",
    "make_mesh",
    "ShardedExhaustive",
    "BatchShardedExhaustive",
    "ShardedIvfIndex",
    "ShardedIvfPqIndex",
    "sharded_topk",
    "batch_sharded_topk",
    "train_centroids_sharded",
]
