"""Orbax checkpoint save/load for converted parameter pytrees.

The reference's "checkpointing" is mmap'd safetensors loading
(loader.rs:319-396); here, converted pytrees (post key-remap, post
transpose, post GGUF-dequant) can additionally be persisted once with Orbax
and restored directly — including restoring 13B weights sharded onto a
``Mesh`` without materializing the full replica per host.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str, template: Optional[Any] = None, shardings: Optional[Any] = None):
    """Restore a pytree; optionally with target shardings (13B onto a mesh)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is None and shardings is None:
        return ckptr.restore(path)
    if shardings is not None and template is not None:
        target = jax.tree.map(
            lambda t, s: ocp.utils.to_shape_dtype_struct(t, sharding=s)
            if hasattr(ocp.utils, "to_shape_dtype_struct")
            else jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=s),
            template,
            shardings,
        )
        return ckptr.restore(path, target)
    target = jax.tree.map(lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype), template)
    return ckptr.restore(path, target)
