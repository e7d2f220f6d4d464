"""Activation functions with the reference's f32 upcast points.

``gelu_tanh`` mirrors the reference's tanh-approximate GELU which upcasts to
f32 for the polynomial/tanh math (reference:
src/models/ltx_video/ltx_transformer.rs:214-226).  SiLU stays in the input
dtype (the reference applies candle's silu directly on BF16).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_GELU_SCALE = math.sqrt(2.0 / math.pi)


def gelu_tanh(x):
    """0.5 * x * (1 + tanh(sqrt(2/pi) * (x + 0.044715 x^3))) in f32."""
    xf = x.astype(jnp.float32)
    inner = xf + jnp.float32(0.044715) * (xf * xf * xf)
    out = jnp.float32(0.5) * xf * (jnp.tanh(jnp.float32(_GELU_SCALE) * inner) + 1.0)
    return out.astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)
