from ragmeup_tpu.parallel.mesh import (
    LOGICAL_RULES, make_mesh, mesh_shape_for, shard_params,
)
from ragmeup_tpu.parallel.sharded_index import ShardedDenseIndex, sharded_topk

__all__ = ["LOGICAL_RULES", "make_mesh", "mesh_shape_for", "shard_params",
           "ShardedDenseIndex", "sharded_topk"]
