from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_transformer_params,
    transformer_shardings,
)
from .pipeline import (
    denoise_loop_pp,
    interleave_layer_order,
    make_pipeline_mesh,
    pipeline_transformer_forward,
    schedule_ticks,
    shard_transformer_params_pp,
)
from .sequence import (
    denoise_loop_sp,
    ring_attention,
    sequence_parallel_attention,
)

__all__ = [
    "denoise_loop_pp",
    "denoise_loop_sp",
    "interleave_layer_order",
    "make_mesh",
    "make_pipeline_mesh",
    "pipeline_transformer_forward",
    "replicate",
    "schedule_ticks",
    "shard_transformer_params_pp",
    "ring_attention",
    "sequence_parallel_attention",
    "shard_batch",
    "shard_transformer_params",
    "transformer_shardings",
]
