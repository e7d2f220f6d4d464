from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_transformer_params,
    transformer_shardings,
)
from .pipeline import (
    make_pipeline_mesh,
    pipeline_transformer_forward,
    shard_transformer_params_pp,
)
from .sequence import ring_attention, sequence_parallel_attention

__all__ = [
    "make_mesh",
    "make_pipeline_mesh",
    "pipeline_transformer_forward",
    "replicate",
    "shard_transformer_params_pp",
    "ring_attention",
    "sequence_parallel_attention",
    "shard_batch",
    "shard_transformer_params",
    "transformer_shardings",
]
