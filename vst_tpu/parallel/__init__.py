"""Mesh/sharding helpers (SPMD scale-out over ICI)."""

from vst_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_spatial,
    shard_spatial,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_batch_spatial",
           "shard_spatial"]
