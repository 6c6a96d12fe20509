"""Multi-chip distribution over jax.sharding meshes.

This layer is NEW capability relative to the reference, which has no
distributed execution of any kind (SURVEY.md §2.4): the reference's entire
scaling story is single-GPU chunking + ANN tiers. Here the graph is
edge-partitioned across a device mesh; per-iteration force accumulation is
a local segment-sum + psum, and kNN reference tiles are sharded with a
global top-k merge over an all_gather — collectives ride ICI under
shard_map.
"""

from .mesh import (
    default_mesh,
    distributed_init,
    make_mesh,
    mesh_is_multiprocess,
    replicate_to_mesh,
)
from .sharded_embedder import ShardedGraphEmbedder
from .sharded_step import build_sharded_step

__all__ = [
    "default_mesh",
    "distributed_init",
    "make_mesh",
    "mesh_is_multiprocess",
    "replicate_to_mesh",
    "ShardedGraphEmbedder",
    "build_sharded_step",
]
