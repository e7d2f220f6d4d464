"""Pallas TPU flash-attention (FlashAttention-2 style, non-causal).

TPU-native replacement for the reference's CUDA flash-attention call site
(src/models/ltx_video/ltx_transformer.rs:699-712): BF16 q/k/v on the MXU,
f32 online-softmax accumulators in VMEM, optional additive key bias (the
-10000-style padding mask used for masked cross-attention).

The kernel operates on a fused [B*H, S, D] layout so each block's trailing
two dims are (block_q, D) — aligned with the TPU's (8, 128) tiling rules.
Sequence lengths are padded to block multiples; padded key columns are
masked with -inf inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fa_kernel(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    kv_len: int,
    block_k: int,
    num_k_blocks: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, D]
    k = k_ref[0]  # [bk, D]
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk]
    s = s * scale

    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :].astype(jnp.float32)

    # mask padded key columns
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[...][:, :1]  # [bq, 1] (lanes replicated)
    l_prev = l_scr[...][:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
    m_new = jnp.maximum(m_prev, m_curr)
    # exp2 is cheaper than exp on the VPU; exp(x) == exp2(x * log2(e))
    log2e = jnp.float32(1.4426950408889634)
    alpha = jnp.exp2((m_prev - m_new) * log2e)
    p = jnp.exp2((s - m_new) * log2e)  # [bq, bk] f32
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0]  # [bk, D]
    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, D]
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[...][:, :1]).astype(o_ref.dtype)


def _pad_seq(x, axis: int, multiple: int):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q,
    k,
    v,
    *,
    scale: float,
    bias=None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool | None = None,
):
    """q [B,S,H,D], k/v [B,K,H,D], optional bias [B,1,1,K] -> [B,S,H,D]."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    b, s_len, h, d = q.shape
    kv_len = k.shape[1]

    block_q = min(block_q, _round_up(s_len, 8))
    block_k = min(block_k, _round_up(kv_len, 128))

    # fuse batch and heads: [B, S, H, D] -> [B*H, S, D]
    def fuse(x):
        return jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)

    qp = _pad_seq(fuse(q), 1, block_q)
    kp = _pad_seq(fuse(k), 1, block_k)
    vp = _pad_seq(fuse(v), 1, block_k)
    s_pad, k_pad = qp.shape[1], kp.shape[1]
    nq, nk = s_pad // block_q, k_pad // block_k

    grid = (b * h, nq, nk)
    q_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0))
    kv_spec = pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0))
    o_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0))

    in_specs = [q_spec, kv_spec, kv_spec]
    args = [qp, kp, vp]
    kernel = functools.partial(
        _fa_kernel,
        scale=scale,
        kv_len=kv_len,
        block_k=block_k,
        num_k_blocks=nk,
    )
    if bias is not None:
        # [B, 1, K_pad] so the block's trailing dims are (1, block_k) with the
        # middle dim full-size — required by TPU tiling rules for any B
        bias3 = _pad_seq(bias.astype(jnp.float32).reshape(b, 1, kv_len), 2, block_k)
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda bh, qi, ki, _h=h: (bh // _h, 0, ki))
        )
        args.append(bias3)

        def body(q_r, k_r, v_r, b_r, o_r, m_s, l_s, a_s):
            kernel(q_r, k_r, v_r, b_r, o_r, m_s, l_s, a_s)

    else:

        def body(q_r, k_r, v_r, o_r, m_s, l_s, a_s):
            kernel(q_r, k_r, v_r, None, o_r, m_s, l_s, a_s)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    out = out[:, :s_len]  # [B*H, S, D]
    return jnp.swapaxes(out.reshape(b, h, s_len, d), 1, 2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
