"""Causal 3D convolution as a single XLA conv — the TPU-first answer to the
reference's conv2d-slice loop.

The reference emulates Conv3d as a Rust-level loop of ``kt`` Conv2d slices
summed over time (src/models/ltx_video/vae.rs:296-465).  On TPU this is one
``lax.conv_general_dilated`` call with explicit replicate temporal padding:
causal = (kt-1)·dilation frames of the first frame on the left; non-causal =
(kt-1)/2 on each side (vae.rs:374-413 edge semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def replicate_pad_time(x, kt: int, dilation_t: int = 1, causal: bool = True):
    """x [B,C,T,H,W] -> temporally padded with edge replication."""
    if kt <= 1:
        return x
    span = (kt - 1) * dilation_t
    if causal:
        left, right = span, 0
    else:
        left = right = (kt - 1) // 2 * dilation_t
    pads = [(0, 0), (0, 0), (left, right), (0, 0), (0, 0)]
    return jnp.pad(x, pads, mode="edge")


def causal_conv3d(
    x,
    weight,  # [O, I/groups, kt, kh, kw] (torch layout)
    bias=None,  # [O]
    stride=(1, 1, 1),
    dilation=(1, 1, 1),
    groups: int = 1,
    causal: bool = True,
):
    """3D conv with replicate temporal padding and zero spatial padding.

    Spatial padding is kh//2 / kw//2 (torch Conv2d ``padding=k//2``
    semantics, vae.rs:343-349).  Accumulates in f32 and casts back to the
    weight dtype (torch BF16 conv behavior).
    """
    kt, kh, kw = weight.shape[2], weight.shape[3], weight.shape[4]
    st, sh, sw = stride
    dt, dh, dw = dilation

    x = x.astype(weight.dtype)
    x = replicate_pad_time(x, kt, dt, causal)

    out = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(st, sh, sw),
        padding=[(0, 0), (kh // 2 * dh, kh // 2 * dh), (kw // 2 * dw, kw // 2 * dw)],
        rhs_dilation=(dt, dh, dw),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None, None, None]
    return out.astype(weight.dtype)
