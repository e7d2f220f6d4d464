"""Fused blockwise-softmax chunk update for ring attention.

The XLA ring path (parallel/sequence.py) materializes per-chunk scores
``[B, H, Sq, Sc]`` f32 in HBM each ring step.  This kernel performs one ring
step — local-chunk attention AND the online-softmax state update — entirely
in VMEM: scores live only as a ``[block_q, Sc]`` tile, so per-chip memory
drops from O(Sq·Sc) to O(block_q·Sc) while the math stays the exact
flash-attention recurrence.

State layout (natural, lane-packed like flash_attention_packed):
- ``acc`` [B, Sq, H*D] f32 — unnormalized output accumulator,
- ``stat`` [B, Sq, H*D] f32 — per 128-lane head-group, ``2*hp`` segments of
  width ``128/(2*hp)``: running max per head then running sum per head, each
  broadcast across its segment (hp = heads per group = 128//D).

Final output = acc / l, extracted by the caller (parallel/sequence.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, stat_ref, acc_ref, stat_out, acc_out, *,
            scale, kv_len, head_dim):
    q = q_ref[0]  # [bq, 128]
    k = k_ref[0]  # [Scp, 128]
    v = v_ref[0]
    stat = stat_ref[0].astype(jnp.float32)  # [bq, 128]
    acc = acc_ref[0].astype(jnp.float32)
    lanes = q.shape[-1]
    hp = lanes // head_dim
    seg = lanes // (2 * hp)

    stat_parts = []
    acc_parts = []
    for h in range(hp):
        lo = h * head_dim
        s = jax.lax.dot_general(
            q[:, lo : lo + head_dim],
            k[:, lo : lo + head_dim],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bq, Scp]
        if s.shape[1] != kv_len:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_i = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        p = jnp.exp2((s - m_i) * jnp.float32(_LOG2E))
        l_i = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v[:, lo : lo + head_dim],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, D]

        m_old = stat[:, h * seg : h * seg + 1]
        l_old = stat[:, (hp + h) * seg : (hp + h) * seg + 1]
        m_new = jnp.maximum(m_old, m_i)
        a = jnp.exp2((m_old - m_new) * jnp.float32(_LOG2E))
        bfac = jnp.exp2((m_i - m_new) * jnp.float32(_LOG2E))
        l_new = l_old * a + l_i * bfac
        acc_h = acc[:, lo : lo + head_dim] * a + pv * bfac
        stat_parts.append((m_new, l_new))
        acc_parts.append(acc_h)

    bq = q.shape[0]
    cols = [m for m, _ in stat_parts] + [l for _, l in stat_parts]
    stat_out[0] = jnp.concatenate(
        [jnp.broadcast_to(c, (bq, seg)) for c in cols], axis=-1
    )
    acc_out[0] = jnp.concatenate(acc_parts, axis=-1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_q", "interpret")
)
def ring_chunk_update(
    q,  # [B, Sq, H*D] (pre-rotated)
    k,  # [B, Sc, H*D]
    v,  # [B, Sc, H*D]
    stat,  # [B, Sq, H*D] f32
    acc,  # [B, Sq, H*D] f32
    *,
    num_heads: int,
    scale: float,
    block_q: int = 256,
    interpret: bool | None = None,
):
    """One fused ring step; returns (stat', acc')."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    b, sq, hd = q.shape
    kv_len = k.shape[1]
    head_dim = hd // num_heads
    hp = 128 // head_dim
    n_groups = num_heads // hp

    scp = _round_up(kv_len, 128)
    block_q = min(block_q, _round_up(sq, 8))

    def pad(x, mult):
        extra = (-x.shape[1]) % mult
        return jnp.pad(x, ((0, 0), (0, extra), (0, 0))) if extra else x

    qp, kp, vp = pad(q, block_q), pad(k, 128), pad(v, 128)
    statp, accp = pad(stat, block_q), pad(acc, block_q)
    nq = qp.shape[1] // block_q
    grid = (b * n_groups, nq)

    q_spec = pl.BlockSpec(
        (1, block_q, 128), lambda bg, qi, _g=n_groups: (bg // _g, qi, bg % _g)
    )
    kv_spec = pl.BlockSpec(
        (1, scp, 128), lambda bg, qi, _g=n_groups: (bg // _g, 0, bg % _g)
    )

    kernel = functools.partial(
        _kernel, scale=scale, kv_len=kv_len, head_dim=head_dim
    )
    stat_o, acc_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec],
        out_specs=[q_spec, q_spec],
        out_shape=[
            jax.ShapeDtypeStruct(statp.shape, jnp.float32),
            jax.ShapeDtypeStruct(accp.shape, jnp.float32),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, statp, accp)
    return stat_o[:, :sq], acc_o[:, :sq]


def init_ring_state(b: int, sq: int, hd: int):
    """(stat, acc) start values: running max -inf, running sum 0, acc 0."""
    stat = jnp.full((b, sq, hd), _NEG_INF, jnp.float32)
    # l segments must start at 0: zero the second half of each 128-lane group
    lane = jnp.arange(hd) % 128
    stat = jnp.where(lane[None, None, :] < 64, stat, 0.0)
    acc = jnp.zeros((b, sq, hd), jnp.float32)
    return stat, acc
