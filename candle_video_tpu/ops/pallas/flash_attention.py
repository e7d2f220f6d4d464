"""Pallas TPU flash-attention (FlashAttention-2 style, non-causal).

TPU-native replacement for the reference's CUDA flash-attention call site
(src/models/ltx_video/ltx_transformer.rs:699-712): BF16 q/k/v on the MXU,
f32 softmax in VMEM, optional additive key bias (the -10000-style padding
mask used for masked cross-attention).

The kernel operates on a fused [B*H, S, D] layout so each block's trailing
two dims are (block_q, D) — aligned with the TPU's (8, 128) tiling rules.
Sequence lengths are padded to block multiples; padded key columns are
masked with -inf inside the kernel.

Block-size strategy (measured on v5e, S=4992, H=32, D=64, distinct q/k/v
buffers, scan-amortized): the whole key sequence in ONE k-block beats the
classic small-block online-softmax layout by ~1.6x (4.3 vs 6.9 ms/layer) —
K/V tiles are then fetched once per head instead of once per q-block (the
block index is constant across the q grid dimension, so Pallas elides the
re-copy), and the scores never leave VMEM.  With a single k-block the
kernel also skips the online-softmax carry state entirely (one-pass exact
softmax).  ``block_q/block_k=None`` picks this automatically under a VMEM
budget; the multi-k-block online-softmax path remains for long sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634

# scores tile (block_q x block_k f32) budget; the rest of VMEM is kept for
# q/k/v tiles, double-buffering, and the exp temporaries
_SCORES_VMEM_BUDGET = 11 * 1024 * 1024


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
    """Multi-k-block online-softmax path (classic FA2)."""
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
    log2e = jnp.float32(_LOG2E)
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


def _fa_kernel_onepass(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    o_ref,
    *,
    scale: float,
    kv_len: int,
):
    """Single-k-block path: exact one-pass softmax, no carry state."""
    q = q_ref[0]  # [bq, D]
    k = k_ref[0]  # [K_pad, D]
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, K_pad]
    s = s * scale

    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :].astype(jnp.float32)

    if s.shape[1] != kv_len:  # mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2((s - m) * jnp.float32(_LOG2E))
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, D]
    o_ref[0] = (pv / l).astype(o_ref.dtype)


def _pad_seq(x, axis: int, multiple: int):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _auto_blocks(s_len: int, kv_len: int, block_q, block_k):
    """Pick (block_q, block_k): prefer one k-block under the VMEM budget."""
    kp = _round_up(kv_len, 128)
    if block_q is None and block_k is None:
        if 512 * kp * 4 <= _SCORES_VMEM_BUDGET:
            return min(512, _round_up(s_len, 8)), kp
        return min(512, _round_up(s_len, 8)), 2048
    if block_q is None:
        block_q = max(8, min(512, _SCORES_VMEM_BUDGET // (4 * block_k) // 8 * 8))
    if block_k is None:
        block_k = kp if block_q * kp * 4 <= _SCORES_VMEM_BUDGET else 2048
    return min(block_q, _round_up(s_len, 8)), min(block_k, kp)


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
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
):
    """q [B,S,H,D], k/v [B,K,H,D], optional bias [B,1,1,K] -> [B,S,H,D]."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    b, s_len, h, d = q.shape
    kv_len = k.shape[1]

    block_q, block_k = _auto_blocks(s_len, kv_len, block_q, block_k)

    # fuse batch and heads: [B, S, H, D] -> [B*H, S, D]
    def fuse(x):
        return jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)

    qp = _pad_seq(fuse(q), 1, block_q)
    kp = _pad_seq(fuse(k), 1, block_k)
    vp = _pad_seq(fuse(v), 1, block_k)
    s_pad, k_pad = qp.shape[1], kp.shape[1]
    nq, nk = s_pad // block_q, k_pad // block_k
    onepass = nk == 1

    if onepass:
        grid = (b * h, nq)
        q_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0))
        kv_spec = pl.BlockSpec((1, block_k, d), lambda bh, qi: (bh, 0, 0))
        o_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0))
        kernel = functools.partial(
            _fa_kernel_onepass, scale=scale, kv_len=kv_len
        )
        bias_spec = pl.BlockSpec(
            (1, 1, block_k), lambda bh, qi, _h=h: (bh // _h, 0, 0)
        )
        scratch_shapes = []
        semantics = ("parallel", "parallel")
    else:
        grid = (b * h, nq, nk)
        q_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0))
        kv_spec = pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0))
        o_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0))
        kernel = functools.partial(
            _fa_kernel,
            scale=scale,
            kv_len=kv_len,
            block_k=block_k,
            num_k_blocks=nk,
        )
        bias_spec = pl.BlockSpec(
            (1, 1, block_k), lambda bh, qi, ki, _h=h: (bh // _h, 0, ki)
        )
        scratch_shapes = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
        semantics = ("parallel", "parallel", "arbitrary")

    in_specs = [q_spec, kv_spec, kv_spec]
    args = [qp, kp, vp]
    if bias is not None:
        # [B, 1, K_pad] so the block's trailing dims are (1, block_k) with the
        # middle dim full-size — required by TPU tiling rules for any B
        bias3 = _pad_seq(bias.astype(jnp.float32).reshape(b, 1, kv_len), 2, block_k)
        in_specs.append(bias_spec)
        args.append(bias3)

        def body(q_r, k_r, v_r, b_r, o_r, *scr):
            kernel(q_r, k_r, v_r, b_r, o_r, *scr)

    else:

        def body(q_r, k_r, v_r, o_r, *scr):
            kernel(q_r, k_r, v_r, None, o_r, *scr)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )(*args)

    out = out[:, :s_len]  # [B*H, S, D]
    return jnp.swapaxes(out.reshape(b, h, s_len, d), 1, 2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
