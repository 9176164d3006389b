from .partition import partition_bins_equal_keys, ShardedDBPlanes, shard_db_planes
from .mesh import make_mesh, make_sharded_classify_fn

__all__ = [
    "partition_bins_equal_keys",
    "ShardedDBPlanes",
    "shard_db_planes",
    "make_mesh",
    "make_sharded_classify_fn",
]
