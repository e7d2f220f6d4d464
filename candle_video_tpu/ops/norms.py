"""Normalization primitives with the reference's pinned f32 upcast points.

The reference upcasts RMSNorm internals to f32 and casts back to the input
dtype *before* the affine weight multiply (reference:
src/models/ltx_video/ltx_transformer.rs:99-119); parity at BF16 depends on
keeping that ordering.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x, weight=None, eps: float = 1e-6):
    """RMSNorm over the last axis. f32 internals, cast back, then affine."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf / jnp.sqrt(ms + jnp.float32(eps))
    y = y.astype(x.dtype)
    if weight is not None:
        y = y * weight.astype(x.dtype)
    return y


def group_norm(x, num_groups: int, weight=None, bias=None, eps: float = 1e-6):
    """GroupNorm over channels-first [N, C, *spatial] (torch semantics)."""
    n, c = x.shape[0], x.shape[1]
    spatial = x.shape[2:]
    xf = x.astype(jnp.float32).reshape(n, num_groups, c // num_groups, -1)
    mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(2, 3), keepdims=True)
    y = ((xf - mean) / jnp.sqrt(var + jnp.float32(eps))).reshape(n, c, *spatial)
    y = y.astype(x.dtype)
    bshape = (1, c) + (1,) * len(spatial)
    if weight is not None:
        y = y * weight.astype(x.dtype).reshape(bshape)
    if bias is not None:
        y = y + bias.astype(x.dtype).reshape(bshape)
    return y


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm over the last axis (f32 internals, torch-compatible)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc / jnp.sqrt(var + jnp.float32(eps))
    y = y.astype(x.dtype)
    if weight is not None:
        y = y * weight.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y
