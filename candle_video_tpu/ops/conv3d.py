"""Causal 3D convolution — the TPU-first answer to the reference's
conv2d-slice loop.

The reference emulates Conv3d as a Rust-level loop of ``kt`` Conv2d slices
summed over time (src/models/ltx_video/vae.rs:296-465).  Here two
implementations behind one interface:

- ``impl="xla"``: one ``lax.conv_general_dilated`` call with explicit
  replicate temporal padding: causal = (kt-1)·dilation frames of the first
  frame on the left; non-causal = (kt-1)/2 on each side (vae.rs:374-413
  edge semantics).  The correctness oracle, and the CPU path.
- ``impl="taps"``: the 3D conv decomposed into kt·kh·kw shifted
  channels-last MATMULS accumulated in f32.  EXPERIMENTAL, measured
  SLOWER than the XLA conv at real decoder shapes once host-fetch
  artifacts were excluded (e.g. C=64 49x256x384: 141 vs 49 ms; the XLA
  lowering reaches 32-64 TF/s at the decoder's real C>=128 stages) —
  kept as an exact A/B tool.  Supports stride/dilation; groups fall
  back to "xla".
- ``impl="auto"``: currently always "xla" (the measured winner on both
  backends).  ``CVT_CONV3D_IMPL`` overrides for experiments.

``causal_conv3d_cl`` is the channels-last variant ([B,T,H,W,C]) used by the
decoder's channels-last path: the 3D conv is decomposed into ``kt`` NHWC 2D
convs with T folded into the batch, summed over the temporal taps.  Measured
on v5e at the decoder's two hottest stages this lowering runs at 158-165
TF/s vs 90-117 TF/s for the NCDHW 3D conv (scripts/profile_conv_variants.py)
— XLA's NHWC conv2d lowering tiles the MXU far better than its NCDHW conv3d.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


@functools.cache
def _default_backend() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return "cpu"


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


def _conv3d_taps(x, weight, stride, dilation):
    """Tap-decomposed conv: x [B,C,T,H,W] pre-padded (time AND space),
    weight [O,I,kt,kh,kw] -> [B,O,T',H',W'] f32.

    Channels move to the lane dimension once, each of the kt*kh*kw taps is a
    strided slice feeding an [*, I] x [I, O] dot on the MXU, accumulated in
    f32, and the result moves back — two relayouts around pure matmuls
    instead of XLA's 3D conv lowering.
    """
    kt, kh, kw = weight.shape[2], weight.shape[3], weight.shape[4]
    st, sh, sw = stride
    dt, dh, dw = dilation
    xcl = jnp.transpose(x, (0, 2, 3, 4, 1))  # [B,T,H,W,C]
    wcl = jnp.transpose(weight, (2, 3, 4, 1, 0))  # [kt,kh,kw,I,O]
    b, tp, hp, wp, _ = xcl.shape
    t_out = (tp - (kt - 1) * dt - 1) // st + 1
    h_out = (hp - (kh - 1) * dh - 1) // sh + 1
    w_out = (wp - (kw - 1) * dw - 1) // sw + 1
    out = None
    for a in range(kt):
        for bb in range(kh):
            for c in range(kw):
                xs = jax.lax.slice(
                    xcl,
                    (0, a * dt, bb * dh, c * dw, 0),
                    (
                        b,
                        a * dt + (t_out - 1) * st + 1,
                        bb * dh + (h_out - 1) * sh + 1,
                        c * dw + (w_out - 1) * sw + 1,
                        xcl.shape[4],
                    ),
                    (1, st, sh, sw, 1),
                )
                part = jax.lax.dot_general(
                    xs,
                    wcl[a, bb, c],
                    (((4,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out = part if out is None else out + part
    return jnp.transpose(out, (0, 4, 1, 2, 3))  # [B,O,T',H',W'] f32


def causal_conv3d(
    x,
    weight,  # [O, I/groups, kt, kh, kw] (torch layout)
    bias=None,  # [O]
    stride=(1, 1, 1),
    dilation=(1, 1, 1),
    groups: int = 1,
    causal: bool = True,
    impl: str = "auto",
):
    """3D conv with replicate temporal padding and zero spatial padding.

    Spatial padding is kh//2 / kw//2 (torch Conv2d ``padding=k//2``
    semantics, vae.rs:343-349).  Accumulates in f32 and casts back to the
    weight dtype (torch BF16 conv behavior).
    """
    kt, kh, kw = weight.shape[2], weight.shape[3], weight.shape[4]
    st, sh, sw = stride
    dt, dh, dw = dilation

    if impl == "auto":
        # Env override applies only to "auto" so explicit caller choices win.
        impl = os.environ.get("CVT_CONV3D_IMPL", "auto")
    if impl == "auto":
        impl = "xla"

    x = x.astype(weight.dtype)
    x = replicate_pad_time(x, kt, dt, causal)

    # Output-buffer dtype: the TPU MXU always accumulates partial products
    # in f32 internally; for BF16 weights, asking XLA for a BF16 output
    # (instead of materializing an f32 buffer and casting after) halves the
    # largest decoder temp buffers (~1.2 GB f32 conv outputs at the last
    # up-block).  Measured max rel err vs the f32-output path: 1.9e-3 at
    # C=256 decoder shapes = exactly one-bf16-rounding (pure-rounding
    # control 1.9e-3) — accumulation is unchanged.  f32 weights (CPU parity
    # tests vs torch) keep the f32 output buffer.
    out_dtype = weight.dtype
    acc_dtype = (
        jnp.bfloat16
        if out_dtype == jnp.bfloat16 and not os.environ.get("CVT_CONV3D_F32_OUT")
        else jnp.float32
    )

    if impl == "taps" and groups == 1:
        pads = [(0, 0), (0, 0), (0, 0),
                (kh // 2 * dh, kh // 2 * dh), (kw // 2 * dw, kw // 2 * dw)]
        out = _conv3d_taps(jnp.pad(x, pads), weight, stride, dilation)
    else:
        out = jax.lax.conv_general_dilated(
            x,
            weight,
            window_strides=(st, sh, sw),
            padding=[(0, 0), (kh // 2 * dh, kh // 2 * dh), (kw // 2 * dw, kw // 2 * dw)],
            rhs_dilation=(dt, dh, dw),
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            feature_group_count=groups,
            preferred_element_type=acc_dtype,
        )
    if bias is not None:
        out = out + bias.astype(acc_dtype)[None, :, None, None, None]
    return out.astype(out_dtype)


def causal_conv3d_cl(
    x,  # [B, T, H, W, C] channels-last
    weight,  # [O, I/groups, kt, kh, kw] (torch layout, same as causal_conv3d)
    bias=None,  # [O]
    stride=(1, 1, 1),
    dilation=(1, 1, 1),
    groups: int = 1,
    causal: bool = True,
    time_pad: str = "edge",
):
    """Channels-last 3D conv with replicate temporal padding: ``kt`` NHWC 2D
    convs (T folded into batch) summed over the temporal taps.

    Same edge semantics as ``causal_conv3d`` (vae.rs:374-413): causal pads
    (kt-1)·dilation frames of the first frame on the left, non-causal pads
    (kt-1)//2·dilation per side; spatial padding k//2 (zero).  Accumulation:
    each 2D tap accumulates f32 inside XLA and rounds to the activation
    dtype; the kt tap partials are then summed in that dtype (for bf16 this
    adds kt-1 bf16 adds vs the NCDHW path's single rounding — measured
    immaterial next to bf16 input rounding).  ``CVT_CONV3D_F32_OUT`` keeps
    f32 tap buffers like the NCDHW path.

    ``time_pad="valid"``: skip temporal padding entirely — the caller has
    already concatenated boundary frames (streaming-decode overlap-save:
    the input holds (kt-1)·dilation extra frames of carried context and the
    output is the pure valid convolution).  Spatial padding is unchanged.
    """
    kt, kh, kw = weight.shape[2], weight.shape[3], weight.shape[4]
    st, sh, sw = stride
    dt_, dh, dw = dilation

    x = x.astype(weight.dtype)
    if kt > 1 and time_pad != "valid":
        span = (kt - 1) * dt_
        left, right = (span, 0) if causal else (span // 2, span - span // 2)
        x = jnp.pad(x, [(0, 0), (left, right), (0, 0), (0, 0), (0, 0)],
                    mode="edge")

    out_dtype = weight.dtype
    acc_dtype = (
        jnp.bfloat16
        if out_dtype == jnp.bfloat16 and not os.environ.get("CVT_CONV3D_F32_OUT")
        else jnp.float32
    )

    b, tp, h, w, c = x.shape
    t_out = (tp - (kt - 1) * dt_ - 1) // st + 1
    w_cl = jnp.transpose(weight, (2, 3, 4, 1, 0))  # [kt,kh,kw,I,O]
    out = None
    for tap in range(kt):
        xs = x[:, tap * dt_ : tap * dt_ + (t_out - 1) * st + 1 : st]
        xs = xs.reshape(b * t_out, h, w, c)
        o = jax.lax.conv_general_dilated(
            xs,
            w_cl[tap],
            window_strides=(sh, sw),
            padding=[(kh // 2 * dh, kh // 2 * dh), (kw // 2 * dw, kw // 2 * dw)],
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=acc_dtype,
        )
        out = o if out is None else out + o
    if bias is not None:
        out = out + bias.astype(acc_dtype)
    ho, wo = out.shape[1], out.shape[2]
    return out.astype(out_dtype).reshape(b, t_out, ho, wo, -1)
