"""Sequence-parallel attention over the mesh.

The reference has no long-sequence parallelism (SURVEY.md §2.3 — sequence
length is tamed by VAE tiling instead); this is the new capability for very
long clips whose token count exceeds one chip: the query sequence shards
over a mesh axis, K/V are all-gathered over ICI inside ``shard_map``, and
each shard runs the flash kernel on its local q block against the full K/V.

Memory per chip: O(S/n · S) attention scores instead of O(S²); K/V gathered
once per layer (ring-attention streaming is a further refinement — see
docs/roadmap.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import attention


def sequence_parallel_attention(
    q,
    k,
    v,
    scale: float,
    mesh: Mesh,
    axis_name: str = "tp",
    bias=None,
    impl: str = "auto",
):
    """q/k/v [B, S, H, D] with S divisible by the mesh axis size.

    The sequence axis shards over ``axis_name``; output has the same
    sharding as q.
    """
    n = mesh.shape[axis_name]
    if q.shape[1] % n != 0:
        raise ValueError(
            f"sequence length {q.shape[1]} not divisible by mesh axis "
            f"'{axis_name}' size {n}"
        )

    in_specs = (
        P(None, axis_name, None, None),
        P(None, axis_name, None, None),
        P(None, axis_name, None, None),
    )
    if bias is not None:
        in_specs = in_specs + (P(None, None, None, None),)
    out_spec = P(None, axis_name, None, None)

    def inner(qc, kc, vc, *rest):
        kg = jax.lax.all_gather(kc, axis_name, axis=1, tiled=True)
        vg = jax.lax.all_gather(vc, axis_name, axis=1, tiled=True)
        b = rest[0] if rest else None
        return attention(qc, kg, vg, scale, bias=b, impl=impl)

    shard = jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )
    args = (q, k, v) + ((bias,) if bias is not None else ())
    return shard(*args)
