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

import jax
import jax.numpy as jnp


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


def attention(q, k, v, scale: float, bias=None, impl: str = "auto"):
    """Scaled dot-product attention over [B, S, H, D] layouts."""
    if impl == "auto":
        impl = "pallas" if _default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, bias=bias)
    return attention_xla(q, k, v, scale, bias=bias)
