"""Mesh/sharding helpers (SPMD scale-out over ICI)."""

from vst_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_spatial,
    shard_spatial,
)
from vst_tpu.parallel.attention import (
    sharded_cosine_attention_moments,
    sharded_softmax_attention_moments,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_batch_spatial",
           "shard_spatial", "sharded_cosine_attention_moments",
           "sharded_softmax_attention_moments"]
