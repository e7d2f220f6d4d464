"""Ring self-attention inner loop — callable INSIDE an enclosing shard_map.

The reference has no sequence parallelism (SURVEY.md §2.3 — sequence length
is tamed by VAE tiling); ring attention is this framework's new capability
for clips whose token count exceeds one chip.  This module holds the
per-shard ring body so two callers share one implementation:

- ``parallel.sequence.ring_attention`` wraps it in its own ``shard_map``
  (the standalone module API), and
- the DiT transformer calls it directly when the WHOLE denoise scan already
  runs under a sequence-sharded ``shard_map``
  (``parallel.sequence.denoise_loop_sp`` — the ``--mesh sp=N`` path), so
  self-attention K/V chunks rotate over ICI via ``ppermute`` while
  everything else stays local.

Exactness: the blockwise online-softmax combination is the standard
flash-attention recurrence — results match a full-sequence softmax to f32
accumulation error.  Non-causal and bias-free (softmax over keys is
permutation-invariant); masked cross-attention takes the local path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def ring_self_attention(q, k, v, scale: float, axis_name: str,
                        chunk_impl: str = "auto"):
    """Streaming ring attention over local shards [B, S_local, H, D].

    MUST be called inside a ``shard_map`` whose mesh has ``axis_name``;
    K/V shards rotate around the ring via ``ppermute`` while each shard
    accumulates blockwise-softmax partials against its local q.  The
    ppermute of chunk j+1 is independent of the math on chunk j, so XLA's
    latency-hiding scheduler overlaps communication with compute.

    ``chunk_impl``: "xla" materializes per-chunk scores [B,H,Sq,Sc] f32;
    "pallas" fuses chunk attention AND the state update into one kernel
    (ops/pallas/ring_chunk.py) so scores live only as a VMEM tile;
    "auto" = pallas on TPU (when the lane-group layout fits), xla elsewhere.
    """
    n = jax.lax.axis_size(axis_name)  # static Python int inside shard_map

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

    if chunk_impl == "pallas":
        from .pallas.ring_chunk import init_ring_state, ring_chunk_update

        b, sq, h, d = q.shape
        hd = h * d
        hp = 128 // d
        seg = 128 // (2 * hp)
        q3 = q.reshape(b, sq, hd)
        k3 = k.reshape(b, k.shape[1], hd)
        v3 = v.reshape(b, v.shape[1], hd)
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
        return out.astype(q.dtype)

    b, sq, h, d = q.shape
    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(carry, _):
        kcur, vcur, m_run, l_run, acc_run = carry
        # rotate the NEXT chunk while computing on the current one —
        # independent ops, overlapped by the latency-hiding scheduler
        knxt = jax.lax.ppermute(kcur, axis_name, perm)
        vnxt = jax.lax.ppermute(vcur, axis_name, perm)
        acc_i, m_i, l_i = _chunk_attention_lse(q, kcur, vcur, scale)
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
        body, (k, v, m0, l0, acc0), None, length=n
    )
    out = (acc_f / l_f[..., None]).astype(q.dtype)
    return jnp.swapaxes(out, 1, 2)  # [B, Sq, H, D]
