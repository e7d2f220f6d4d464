"""Sequence-parallel attention over the mesh.

The reference has no long-sequence parallelism (SURVEY.md §2.3 — sequence
length is tamed by VAE tiling instead); this is the new capability for very
long clips whose token count exceeds one chip.  Two schemes:

- ``sequence_parallel_attention`` (all-gather): the query sequence shards
  over a mesh axis, K/V are all-gathered over ICI inside ``shard_map``, and
  each shard runs the flash kernel on its local q block against the full
  K/V.  Per-chip memory: O(S/n · S) scores + O(S) gathered K/V.
- ``ring_attention`` (streaming): K/V chunks stay sharded and rotate around
  the ring via ``ppermute`` while each chip accumulates blockwise-softmax
  partial results against its local q shard.  Per-chip memory:
  O(S/n · S/n) scores + O(S/n) resident K/V — nothing ever holds the full
  sequence, so max clip length scales linearly with the ring size.  The
  ppermute of chunk j+1 is independent of the attention math on chunk j,
  so XLA's latency-hiding scheduler overlaps communication with compute.
  Non-causal and bias-free (softmax over keys is permutation-invariant, so
  no global-position bookkeeping is needed); pass bias via the all-gather
  path instead.
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


def _chunk_attention_lse(qc, kc, vc, scale: float):
    """Per-chunk attention returning unnormalized (acc, m, l) for blockwise
    combination: BF16 matmuls with f32-accumulated logits and f32 softmax
    (flash-attention numerics)."""
    qf = jnp.swapaxes(qc, 1, 2)  # [B, H, Sq, D]
    kf = jnp.swapaxes(kc, 1, 2)
    vf = jnp.swapaxes(vc, 1, 2)
    s = jnp.einsum(
        "bhsd,bhkd->bhsk", qf, kf, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    m = jnp.max(s, axis=-1)  # [B, H, Sq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum(
        "bhsk,bhkd->bhsd", p.astype(vc.dtype), vf,
        preferred_element_type=jnp.float32,
    )
    return acc, m, l


def ring_attention(
    q,
    k,
    v,
    scale: float,
    mesh: Mesh,
    axis_name: str = "tp",
    chunk_impl: str = "auto",
):
    """Streaming ring attention: q/k/v [B, S, H, D], S divisible by the
    mesh axis size.  K/V shards rotate around the ring; each chip holds only
    its S/n chunk at any moment.  Output sharding matches q.

    Exactness: the blockwise online-softmax combination is the standard
    flash-attention recurrence in log-space — results match the all-gather
    path to f32 accumulation error.

    ``chunk_impl``: "xla" materializes per-chunk scores [B,H,Sq,Sc] f32 in
    HBM; "pallas" fuses chunk attention AND the state update into one
    kernel (ops/pallas/ring_chunk.py) so scores live only as a
    [block_q, Sc] VMEM tile — per-chip memory O(Sq·block) instead of
    O(Sq·Sc).  "auto" = pallas on TPU, xla elsewhere.
    """
    n = mesh.shape[axis_name]
    if q.shape[1] % n != 0:
        raise ValueError(
            f"sequence length {q.shape[1]} not divisible by mesh axis "
            f"'{axis_name}' size {n}"
        )
    if chunk_impl == "auto":
        # The fused pallas chunk kernel requires the lane-group layout
        # (same viability condition as flash_attention_packed): head_dim
        # divides 128 and num_heads divides evenly into lane groups.
        h, d = q.shape[2], q.shape[3]
        lane_ok = d <= 128 and 128 % d == 0 and h % (128 // d) == 0
        chunk_impl = (
            "pallas"
            if lane_ok and jax.devices()[0].platform in ("tpu", "axon")
            else "xla"
        )

    spec = P(None, axis_name, None, None)

    if chunk_impl == "pallas":
        from ..ops.pallas.ring_chunk import init_ring_state, ring_chunk_update

        def inner_pallas(qc, kc, vc):
            b, sq, h, d = qc.shape
            hd = h * d
            hp = 128 // d
            seg = 128 // (2 * hp)
            q3 = qc.reshape(b, sq, hd)
            k3 = kc.reshape(b, kc.shape[1], hd)
            v3 = vc.reshape(b, vc.shape[1], hd)
            perm = [(j, (j + 1) % n) for j in range(n)]
            stat0, acc0 = init_ring_state(b, sq, hd)

            def body(carry, _):
                kcur, vcur, stat, acc = carry
                knxt = jax.lax.ppermute(kcur, axis_name, perm)
                vnxt = jax.lax.ppermute(vcur, axis_name, perm)
                stat, acc = ring_chunk_update(
                    q3, kcur, vcur, stat, acc, num_heads=h, scale=scale
                )
                return (knxt, vnxt, stat, acc), None

            (_, _, stat, acc), _ = jax.lax.scan(
                body, (k3, v3, stat0, acc0), None, length=n
            )
            st = stat.reshape(b, sq, h // hp, 128)
            l = jnp.stack(
                [st[..., (hp + i) * seg] for i in range(hp)], axis=-1
            ).reshape(b, sq, h)
            out = acc.reshape(b, sq, h, d) / l[..., None]
            return out.astype(qc.dtype)

        return jax.shard_map(
            inner_pallas, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False,
        )(q, k, v)

    def inner(qc, kc, vc):
        b, sq, h, d = qc.shape
        perm = [(j, (j + 1) % n) for j in range(n)]

        def body(carry, _):
            kcur, vcur, m_run, l_run, acc_run = carry
            # rotate the NEXT chunk while computing on the current one —
            # independent ops, overlapped by the latency-hiding scheduler
            knxt = jax.lax.ppermute(kcur, axis_name, perm)
            vnxt = jax.lax.ppermute(vcur, axis_name, perm)
            acc_i, m_i, l_i = _chunk_attention_lse(qc, kcur, vcur, scale)
            m_new = jnp.maximum(m_run, m_i)
            a = jnp.exp(m_run - m_new)
            bb = jnp.exp(m_i - m_new)
            l_new = l_run * a + l_i * bb
            acc_new = acc_run * a[..., None] + acc_i * bb[..., None]
            return (knxt, vnxt, m_new, l_new, acc_new), None

        m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, sq), jnp.float32)
        acc0 = jnp.zeros((b, h, sq, d), jnp.float32)
        (_, _, m_f, l_f, acc_f), _ = jax.lax.scan(
            body, (kc, vc, m0, l0, acc0), None, length=n
        )
        out = (acc_f / l_f[..., None]).astype(qc.dtype)
        return jnp.swapaxes(out, 1, 2)  # [B, Sq, H, D]

    shard = jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return shard(q, k, v)
