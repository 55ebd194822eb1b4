"""Device-mesh scale-out: data-parallel batches, edge-sharded graphs,
multi-host orchestration."""

from .distributed import host_batch_slice, initialize, is_multi_host
from .edge_shard import ShardedTannerGraph, edge_sharded_bp_fn
from .mesh import make_mesh, pad_batch, sharded_decode_fn

__all__ = [
    "make_mesh",
    "pad_batch",
    "sharded_decode_fn",
    "ShardedTannerGraph",
    "edge_sharded_bp_fn",
    "initialize",
    "is_multi_host",
    "host_batch_slice",
]
