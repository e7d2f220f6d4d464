from .mesh import (
    make_mesh,
    transformer_shardings,
    shard_transformer_params,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "transformer_shardings",
    "shard_transformer_params",
    "shard_batch",
]
