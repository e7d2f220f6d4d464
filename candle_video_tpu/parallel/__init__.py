from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_transformer_params,
    transformer_shardings,
)
from .sequence import ring_attention, sequence_parallel_attention

__all__ = [
    "make_mesh",
    "replicate",
    "ring_attention",
    "sequence_parallel_attention",
    "shard_batch",
    "shard_transformer_params",
    "transformer_shardings",
]
