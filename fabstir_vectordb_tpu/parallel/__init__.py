from .mesh import make_mesh, cpu_mesh
from .sharded import (
    sharded_flat_search,
    sharded_ivf_search,
    sharded_lloyd_step,
    sharded_kmeans_train,
    ShardedIVFState,
    shard_ivf_state,
)

__all__ = [
    "make_mesh",
    "cpu_mesh",
    "sharded_flat_search",
    "sharded_ivf_search",
    "sharded_lloyd_step",
    "sharded_kmeans_train",
    "ShardedIVFState",
    "shard_ivf_state",
]
