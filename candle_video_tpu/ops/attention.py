"""Attention dispatch: Pallas flash attention on TPU, f32-softmax XLA fallback.

The reference runs self-attention through flash-attention v2 CUDA kernels in
BF16 and falls back to a manual f32-softmax path with an additive -10000 mask
(src/models/ltx_video/ltx_transformer.rs:689-741).  Here:

- ``impl="pallas"``: our Pallas TPU flash-attention kernel
  (ops/pallas/flash_attention.py), BF16 inputs, f32 accumulation, optional
  additive bias.
- ``impl="xla"``: plain XLA attention with f32 softmax — numerically the
  reference's manual path; used on CPU and as the correctness oracle.
- ``impl="auto"``: pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _packed_softmax_opts():
    """Softmax options for the packed kernel.

    Default ``softmax_bound="auto"``: the kernel replaces its row-max pass
    with an in-kernel per-row Cauchy-Schwarz score bound — exact by softmax
    shift invariance (see the kernel's `m` computation), measured
    ~-15 ms/step at LTX 2B shapes.  Env overrides:
    CVT_ATTN_SOFTMAX_BOUND=rowmax — restore the exact row-max pass;
    CVT_ATTN_SOFTMAX_BOUND=<float> — static bound (A/B);
    CVT_ATTN_SCORES_BF16=1 — exp2 at bf16 (A/B, quality-gated)."""
    opts = {"scores_bf16": bool(os.environ.get("CVT_ATTN_SCORES_BF16"))}
    env = os.environ.get("CVT_ATTN_SOFTMAX_BOUND")
    if env in ("rowmax", "off"):
        opts["softmax_bound"] = None
    elif env:
        opts["softmax_bound"] = float(env)
    else:
        opts["softmax_bound"] = "auto"
    return opts


@functools.cache
def _default_backend() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return "cpu"


def attention_xla(q, k, v, scale: float, bias=None):
    """q [B,S,H,D], k/v [B,K,H,D], bias broadcastable to [B,H,S,K]; f32 math."""
    qf = jnp.swapaxes(q, 1, 2).astype(jnp.float32)  # [B,H,S,D]
    kf = jnp.swapaxes(k, 1, 2).astype(jnp.float32)
    vf = jnp.swapaxes(v, 1, 2).astype(jnp.float32)
    # true-f32 matmuls: on TPU the default f32 precision is bf16-reduced
    hi = jax.lax.Precision.HIGHEST
    att = jnp.einsum("bhsd,bhkd->bhsk", qf, kf, precision=hi) * jnp.float32(scale)
    if bias is not None:
        att = att + bias.astype(jnp.float32)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhsk,bhkd->bhsd", att, vf, precision=hi)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)  # [B,S,H,D]


def attention_xla_bf16(q, k, v, scale: float, bias=None):
    """BF16 matmuls with f32-accumulated logits and f32 softmax — the same
    numerics as flash-attention (QK^T f32 accum, f32 softmax, BF16 PV).
    Faster than the Pallas kernel for short key lengths (cross-attention,
    K=128): measured 1.02 vs 1.23 ms/layer at LTX shapes.  The einsums
    consume the natural [B,S,H,D] layout directly — explicit swapaxes cost
    ~0.08 ms/layer in materialized relayouts."""
    att = jnp.einsum(
        "bshd,bkhd->bhsk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if bias is not None:
        att = att + bias.astype(jnp.float32)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhsk,bkhd->bshd", att, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# below this key length the unfused XLA path beats the flash kernel
_SHORT_KV = 512


def _apply_rope_4d(x, cos, sin):
    """Rotate [B,S,H,D] with full-width [.., S, H*D] tables (same pairs)."""
    from .rope import apply_rotary_emb

    b, s, h, d = x.shape
    return apply_rotary_emb(
        x, cos.reshape(*cos.shape[:-1], h, d), sin.reshape(*sin.shape[:-1], h, d)
    )


def attention(q, k, v, scale: float, bias=None, impl: str = "auto", rope=None):
    """Scaled dot-product attention over [B, S, H, D] layouts.

    ``rope``: optional (cos, sin) full-width tables meaning q and k arrive
    UNROTATED.  On the packed Pallas path q rotates inside the kernel (exact
    roll-based formulation, never materialized to HBM) and k rotates in one
    XLA pass; other implementations rotate both up front.

    ``rope=("split", cs)``: q/k arrive unrotated AND in the split lane
    layout (projection weights pre-permuted via
    rope.py::rope_split_permutation); ``cs`` is the compact combined table
    from rope_split_tables.  Both q and k rotate inside the packed kernel
    (k once per head-group into VMEM scratch) — half the table bandwidth
    and no per-layer XLA rotation pass.  Requires the packed kernel.
    """
    if rope is not None and isinstance(rope[0], str):
        if rope[0] != "split":
            raise ValueError(f"unknown rope layout tag {rope[0]!r}")
        from .pallas.flash_attention_packed import (
            flash_attention_packed,
            packed_viable,
        )

        b, s, h, d = q.shape
        kv = k.shape[1]
        if impl == "auto":
            impl = "pallas"
        if impl != "pallas" or not packed_viable(s, kv, h, d):
            raise ValueError(
                "split rope layout requires the packed pallas kernel "
                f"(impl={impl!r}, viable={packed_viable(s, kv, h, d)})"
            )
        out = flash_attention_packed(
            q.reshape(b, s, h * d),
            k.reshape(b, kv, h * d),
            v.reshape(b, kv, h * d),
            num_heads=h,
            scale=scale,
            bias=bias,
            rope_split=rope[1],
            **_packed_softmax_opts(),
        )
        return out.reshape(b, s, h, d)
    if impl == "auto":
        if _default_backend() not in ("tpu", "axon"):
            impl = "xla"
        elif k.shape[1] <= _SHORT_KV:
            impl = "xla_bf16"
        else:
            impl = "pallas"
    if impl == "pallas":
        from .pallas.flash_attention import flash_attention
        from .pallas.flash_attention_packed import (
            flash_attention_packed,
            packed_viable,
        )

        b, s, h, d = q.shape
        kv = k.shape[1]
        if packed_viable(s, kv, h, d):
            # natural-layout kernel: no q/k/v/out transposes (~34 ms/step
            # saved at LTX 2B shapes), one-pass exact softmax
            if rope is not None:
                k = _apply_rope_4d(k, rope[0], rope[1])
            out = flash_attention_packed(
                q.reshape(b, s, h * d),
                k.reshape(b, kv, h * d),
                v.reshape(b, kv, h * d),
                num_heads=h,
                scale=scale,
                bias=bias,
                rope_q=rope,
                **_packed_softmax_opts(),
            )
            return out.reshape(b, s, h, d)
        if rope is not None:
            q = _apply_rope_4d(q, rope[0], rope[1])
            k = _apply_rope_4d(k, rope[0], rope[1])
        return flash_attention(q, k, v, scale=scale, bias=bias)
    if rope is not None:
        q = _apply_rope_4d(q, rope[0], rope[1])
        k = _apply_rope_4d(k, rope[0], rope[1])
    if impl == "xla_bf16":
        return attention_xla_bf16(q, k, v, scale, bias=bias)
    return attention_xla(q, k, v, scale, bias=bias)
