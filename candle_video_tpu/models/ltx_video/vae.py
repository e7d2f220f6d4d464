"""LTX-Video 3D causal VAE — functional JAX, TPU-first.

Parity target: AutoencoderKLLtxVideo (src/models/ltx_video/vae.rs:30-2463):
pixel-unshuffle downsamplers with grouped-mean residuals, depth-to-space
upsamplers with channel-repeat residuals and causal frame crops,
timestep-conditioned resnets (per-block [4,C] scale_shift tables), patchify
p=4, encoder logvar-replication trick, decoder-level global modulation, and
spatial/temporal tiling with linear-ramp blending.

TPU-first: CausalConv3d is one ``lax.conv_general_dilated`` (the reference
loops Conv2d slices over time, vae.rs:438-454); blends are vectorized lerps;
tile decodes are jitted once per tile shape.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

import os

from ...ops.activations import silu
from ...ops.conv3d import causal_conv3d, causal_conv3d_cl
from ...ops.embeddings import sinusoidal_timestep_embedding


@dataclasses.dataclass(frozen=True)
class LtxVaeConfig:
    """Mirror of AutoencoderKLLtxVideoConfig (vae.rs:30-103)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    block_out_channels: tuple = (128, 256, 512, 1024, 2048)
    decoder_block_out_channels: tuple = (256, 512, 1024)
    spatiotemporal_scaling: tuple = (True, True, True, True)
    decoder_spatiotemporal_scaling: tuple = (True, True, True)
    layers_per_block: tuple = (4, 6, 6, 2, 2)
    decoder_layers_per_block: tuple = (5, 5, 5, 5)
    patch_size: int = 4
    patch_size_t: int = 1
    resnet_eps: float = 1e-6
    scaling_factor: float = 1.0
    spatial_compression_ratio: int = 32
    temporal_compression_ratio: int = 8
    decoder_inject_noise: tuple = (False, False, False, False)
    decoder_upsample_residual: tuple = (True, True, True)
    decoder_upsample_factor: tuple = (2, 2, 2)
    timestep_conditioning: bool = True
    downsample_types: tuple = ("spatial", "temporal", "spatiotemporal", "spatiotemporal")
    is_causal: bool = True
    decoder_causal: bool = False


_DOWNSAMPLE_STRIDES = {
    "conv": (2, 2, 2),
    "spatial": (1, 2, 2),
    "temporal": (2, 1, 1),
    "spatiotemporal": (2, 2, 2),
}


# ---------------------------------------------------------------------------
# primitives — ONE definition per op, parametrized by layout (``cl``)
#
# Every decoder op exists in two layouts: channels-first [B,C,T,H,W] (the
# reference's NCDHW order, vae.rs:148-153) and channels-last [B,T,H,W,C]
# (the production TPU path: NHWC conv taps hit 158-175 TF/s vs 90-117 for
# NCDHW conv3d — scripts/profile_conv_variants.py).  Rather than twin
# function bodies kept in lock-step by hand (the round-3 drift class), the
# math lives ONCE and the layout is a parameter: reduce axis, broadcast
# shape, and conv lowering switch on ``cl``; the NCDHW-vs-CL parity test
# still compares two genuinely different XLA programs.
#
# The streaming (overlap-save) decoder variants reuse the SAME bodies with
# injected conv callables that thread per-conv caches (see the streaming
# section below) — block and stream cannot drift because there is nothing
# to drift between.
# ---------------------------------------------------------------------------


def _rms_norm(x, eps: float = 1e-8, weight=None, *, cl: bool = False):
    """RMSNorm over the channel axis, f32 internals (vae.rs:148-153)."""
    axis = -1 if cl else 1
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=axis, keepdims=True)
    y = (xf / jnp.sqrt(ms + jnp.float32(eps))).astype(x.dtype)
    if weight is not None:
        w = weight.astype(x.dtype)
        y = y * (w if cl else w[None, :, None, None, None])
    return y


def _layer_norm(x, eps: float, weight=None, bias=None, *, cl: bool = False):
    axis = -1 if cl else 1
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=axis, keepdims=True)
    y = (xc / jnp.sqrt(var + jnp.float32(eps))).astype(x.dtype)
    if weight is not None:
        w = weight.astype(x.dtype)
        y = y * (w if cl else w[None, :, None, None, None])
    if bias is not None:
        b = bias.astype(x.dtype)
        y = y + (b if cl else b[None, :, None, None, None])
    return y


def _conv(p, x, stride=(1, 1, 1), causal=True):
    return causal_conv3d(
        x, p["weight"], p.get("bias"), stride=stride, causal=causal
    )


def _conv_cl(p, x, stride=(1, 1, 1), causal=True):
    return causal_conv3d_cl(
        x, p["weight"], p.get("bias"), stride=stride, causal=causal
    )


def _time_embedder(p, temb, dtype):
    """CombinedTimestepEmbedder: sinusoid(256) → MLP (vae.rs:200-265)."""
    proj = sinusoidal_timestep_embedding(temb, 256).astype(dtype)
    h = proj @ p["linear_1"]["weight"] + p["linear_1"]["bias"]
    h = silu(h)
    return h @ p["linear_2"]["weight"] + p["linear_2"]["bias"]


def _split_temb4(p, temb, cl: bool):
    """Block scale_shift_table [4,C] + flat temb [B,4C] (or legacy 5D
    [B,4C,1,1,1]) → four layout-broadcastable (shift1, scale1, shift2,
    scale2), or Nones when unconditioned."""
    if p.get("scale_shift_table") is None or temb is None:
        return None, None, None, None
    tbl = p["scale_shift_table"]  # [4, C]
    b = temb.shape[0]
    c = tbl.shape[1]
    t = temb.reshape(b, 4, c) + tbl[None].astype(temb.dtype)
    if cl:
        t = t[:, :, None, None, None, :]  # [B,4,1,1,1,C]
    else:
        t = t[:, :, :, None, None, None]  # [B,4,C,1,1,1]
    return t[:, 0], t[:, 1], t[:, 2], t[:, 3]


def _inject_noise(h, key, scale, cl: bool):
    """Per-channel spatially-shared [H, W] noise (vae.rs:741-753)."""
    key, sub = jax.random.split(key)
    sp = h.shape[2:4] if cl else h.shape[-2:]
    noise = jax.random.normal(sub, sp, h.dtype)
    s = scale.astype(h.dtype)
    if cl:
        h = h + noise[None, None, :, :, None] * s.reshape(1, 1, 1, 1, -1)
    else:
        h = h + noise[None, None, None] * s.reshape(1, -1, 1, 1, 1)
    return h, key


def _resnet_core(p, cfg, x, temb, conv1, conv2, shortcut_conv,
                 shortcut_align, cl: bool, noise_key):
    """LtxVideoResnetBlock3d (vae.rs:584-822) — the single body behind the
    NCDHW, channels-last, and streaming variants.  ``conv1``/``conv2``/
    ``shortcut_conv`` are layout- (and cache-) carrying callables;
    ``shortcut_align`` re-aligns the residual branch with conv-delayed
    streams (identity for block mode)."""
    h = _rms_norm(x, 1e-8, cl=cl)
    shift1, scale1, shift2, scale2 = _split_temb4(p, temb, cl)

    if shift1 is not None:
        h = h * (1.0 + scale1.astype(h.dtype)) + shift1.astype(h.dtype)
    h = silu(h)
    h = conv1(h)

    if p.get("per_channel_scale1") is not None and noise_key is not None:
        h, noise_key = _inject_noise(h, noise_key, p["per_channel_scale1"], cl)

    h = _rms_norm(h, 1e-8, cl=cl)
    if shift2 is not None:
        h = h * (1.0 + scale2.astype(h.dtype)) + shift2.astype(h.dtype)
    h = silu(h)
    h = conv2(h)

    if p.get("per_channel_scale2") is not None and noise_key is not None:
        h, noise_key = _inject_noise(h, noise_key, p["per_channel_scale2"], cl)

    shortcut = x
    if p.get("norm3") is not None:
        shortcut = _layer_norm(
            shortcut, cfg.resnet_eps, p["norm3"].get("weight"),
            p["norm3"].get("bias"), cl=cl,
        )
    elif p.get("conv_shortcut") is not None:
        # affine-less norm3 still applies whenever the shortcut changes width
        shortcut = _layer_norm(shortcut, cfg.resnet_eps, cl=cl)
    if p.get("conv_shortcut") is not None:
        shortcut = shortcut_conv(shortcut)
    return h + shortcut_align(shortcut)


def _flat_temb(temb):
    """Accept flat [B,4C] or legacy [B,4C,1,1,1] block tembs."""
    if temb is None:
        return None
    return temb.reshape(temb.shape[0], -1)


def _resnet_block(p, cfg, x, temb5=None, causal=True, noise_key=None):
    """NCDHW resnet (parity oracle + encoder path)."""
    return _resnet_core(
        p, cfg, x, _flat_temb(temb5),
        conv1=lambda h: _conv(p["conv1"], h, causal=causal),
        conv2=lambda h: _conv(p["conv2"], h, causal=causal),
        shortcut_conv=lambda s: _conv(p["conv_shortcut"], s, causal=causal),
        shortcut_align=lambda s: s, cl=False, noise_key=noise_key,
    )


def _resnet_block_cl(p, cfg, x, temb2=None, causal=True, noise_key=None):
    """Channels-last resnet (production decode path)."""
    return _resnet_core(
        p, cfg, x, temb2,
        conv1=lambda h: _conv_cl(p["conv1"], h, causal=causal),
        conv2=lambda h: _conv_cl(p["conv2"], h, causal=causal),
        shortcut_conv=lambda s: _conv_cl(p["conv_shortcut"], s, causal=causal),
        shortcut_align=lambda s: s, cl=True, noise_key=noise_key,
    )


def _pixel_unshuffle_downsample(p, x, stride, out_channels: int, causal=True):
    """LtxVideoDownsampler3d (vae.rs:497-582): pixel-unshuffle conv path +
    grouped-mean residual."""
    st, sh, sw = stride
    b, c, t, hgt, wid = x.shape
    group_size = c * st * sh * sw // out_channels

    if st > 1:
        x = jnp.concatenate([x[:, :, : st - 1], x], axis=2)
    t_pad = x.shape[2]
    t_new, h_new, w_new = t_pad // st, hgt // sh, wid // sw

    def unshuffle(y):
        cy = y.shape[1]
        y = y.reshape(b, cy, t_new, st, h_new, sh, w_new, sw)
        y = y.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        return y.reshape(b, cy * st * sh * sw, t_new, h_new, w_new)

    residual = unshuffle(x)
    residual = residual.reshape(
        b, c * st * sh * sw // group_size, group_size, t_new, h_new, w_new
    ).mean(axis=2)

    hidden = _conv(p["conv"], x, causal=causal)
    hidden = unshuffle(hidden)
    return hidden + residual


def _depth_to_space(y, st, sh, sw, *, cl: bool = False):
    """Reference upsampler shuffle (vae.rs:1106-1158); channel order is
    c_out-major then (st, sh, sw) in BOTH layouts."""
    if cl:
        b, t, hgt, wid, c = y.shape
        c_out = c // (st * sh * sw)
        y = y.reshape(b, t, hgt, wid, c_out, st, sh, sw)
        y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # [B,T,st,H,sh,W,sw,C']
        return y.reshape(b, t * st, hgt * sh, wid * sw, c_out)
    b, c, t, hgt, wid = y.shape
    c_out = c // (st * sh * sw)
    y = y.reshape(b, c_out, st, sh, sw, t, hgt, wid)
    y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # [B,C',T,st,H,sh,W,sw]
    return y.reshape(b, c_out, t * st, hgt * sh, wid * sw)


def _tile_channels(y, repeats: int, cl: bool):
    reps = (1, 1, 1, 1, repeats) if cl else (1, repeats, 1, 1, 1)
    return jnp.tile(y, reps)


def _crop_t(y, n: int, cl: bool):
    return y[:, n:] if cl else y[:, :, n:]


def _upsampler_core(p, x, stride, residual: bool, channel_repeats: int,
                    conv_fn, res_align, crop_start: bool, cl: bool):
    """LtxVideoUpsampler3d (vae.rs:1037-1170) — single body.  ``res_align``
    delays the depth-to-space residual to match the conv branch in stream
    mode (identity for block mode); ``crop_start`` applies the causal
    ``st-1`` output crop (always in block mode, stream-start only)."""
    st, sh, sw = stride
    res = None
    if residual:
        res = _depth_to_space(res_align(x), st, sh, sw, cl=cl)
        if channel_repeats > 1:
            res = _tile_channels(res, channel_repeats, cl)
        if crop_start:
            res = _crop_t(res, st - 1, cl)

    h = _depth_to_space(conv_fn(x), st, sh, sw, cl=cl)
    if crop_start:
        h = _crop_t(h, st - 1, cl)
    if res is not None:
        h = h + res
    return h


def _upsampler(p, x, stride, residual: bool, channel_repeats: int,
               causal=True):
    return _upsampler_core(
        p, x, stride, residual, channel_repeats,
        conv_fn=lambda y: _conv(p["conv"], y, causal=causal),
        res_align=lambda y: y, crop_start=True, cl=False,
    )


def _upsampler_cl(p, x, stride, residual: bool, channel_repeats: int,
                  causal=True):
    return _upsampler_core(
        p, x, stride, residual, channel_repeats,
        conv_fn=lambda y: _conv_cl(p["conv"], y, causal=causal),
        res_align=lambda y: y, crop_start=True, cl=True,
    )


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def _patchify(x, p: int, pt: int):
    """(B,C,F,H,W) -> (B, C*pt*p*p, F/pt, H/p, W/p), reference channel order
    [c, pt, p_w, p_h] (vae.rs:1426-1444)."""
    b, c, f, h, w = x.shape
    x = x.reshape(b, c, f // pt, pt, h // p, p, w // p, p)
    x = x.transpose(0, 1, 3, 7, 5, 2, 4, 6)
    return x.reshape(b, c * pt * p * p, f // pt, h // p, w // p)


def _unpatchify(x, p: int, pt: int, *, cl: bool = False):
    """Inverse of _patchify (vae.rs:1626-1654); channel order [c,pt,pw,ph]
    in both layouts."""
    if cl:
        b, f, h, w, c = x.shape
        out_c = c // (pt * p * p)
        x = x.reshape(b, f, h, w, out_c, pt, p, p)  # [..., c, pt, pW, pH]
        x = x.transpose(0, 1, 5, 2, 7, 3, 6, 4)  # [B,F,pt,H,pH,W,pW,c]
        return x.reshape(b, f * pt, h * p, w * p, out_c)
    b, c, f, h, w = x.shape
    out_c = c // (pt * p * p)
    x = x.reshape(b, out_c, pt, p, p, f, h, w)
    x = x.transpose(0, 1, 5, 2, 6, 4, 7, 3)  # [B,C,F,pt,H,p,W,p]
    return x.reshape(b, out_c, f * pt, h * p, w * p)


def encoder_forward(params, cfg: LtxVaeConfig, x):
    """LtxVideoEncoder3d (vae.rs:1316-1468). x [B,3,F,H,W] -> moments
    [B, 2*latent, F', H', W'] with the logvar-replication trick."""
    causal = cfg.is_causal
    h = _patchify(x, cfg.patch_size, cfg.patch_size_t)
    h = _conv(params["conv_in"], h, causal=causal)

    for i, bp in enumerate(params["down_blocks"]):
        for rp in bp["resnets"]:
            h = _resnet_block(rp, cfg, h, causal=causal)
        if bp.get("downsamplers"):
            stride = _DOWNSAMPLE_STRIDES[cfg.downsample_types[i].lower()]
            h = _pixel_unshuffle_downsample(
                bp["downsamplers"][0],
                h,
                stride,
                cfg.block_out_channels[i + 1],
                causal=causal,
            )

    for rp in params["mid_block"]["resnets"]:
        h = _resnet_block(rp, cfg, h, causal=causal)

    h = _rms_norm(h, 1e-8, params.get("norm_out", {}).get("weight") if params.get("norm_out") else None)
    h = silu(h)
    h = _conv(params["conv_out"], h, causal=causal)

    # last-channel replication: conv_out emits latent+1 channels; the final
    # channel is the uniform logvar, replicated to full width (vae.rs:1463-1467)
    ch = h.shape[1]
    last = h[:, ch - 1 : ch]
    rep = jnp.tile(last, (1, ch - 2, 1, 1, 1))
    return jnp.concatenate([h, rep], axis=1)


def _patchify_cl(x, p: int, pt: int):
    """Channels-last _patchify: (B,F,H,W,C) -> (B, F/pt, H/p, W/p,
    C*pt*p*p) with the SAME [c, pt, p_w, p_h] channel order as the NCDHW
    path (vae.rs:1426-1444), so weights load unchanged."""
    b, f, h, w, c = x.shape
    x = x.reshape(b, f // pt, pt, h // p, p, w // p, p, c)
    #                1       2    3     4   5     6  7
    x = x.transpose(0, 1, 3, 5, 7, 2, 6, 4)  # [B,F',H',W', c, pt, pW, pH]
    return x.reshape(b, f // pt, h // p, w // p, c * pt * p * p)


def _pixel_unshuffle_downsample_cl(p, x, stride, out_channels: int,
                                   causal=True):
    """Channels-last LtxVideoDownsampler3d (vae.rs:497-582): same math as
    the NCDHW twin — duplicate-first-frames temporal pad, conv, then
    space(-time)-to-channel unshuffle with [c, st, sh, sw] channel order,
    plus the grouped-mean residual."""
    st, sh, sw = stride
    b, t, hgt, wid, c = x.shape
    group_size = c * st * sh * sw // out_channels

    if st > 1:
        x = jnp.concatenate([x[:, : st - 1], x], axis=1)
    t_pad = x.shape[1]
    t_new, h_new, w_new = t_pad // st, hgt // sh, wid // sw

    def unshuffle(y):
        cy = y.shape[-1]
        y = y.reshape(b, t_new, st, h_new, sh, w_new, sw, cy)
        y = y.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # [B,T',H',W', cy, st, sh, sw]
        return y.reshape(b, t_new, h_new, w_new, cy * st * sh * sw)

    residual = unshuffle(x)
    residual = residual.reshape(
        b, t_new, h_new, w_new, c * st * sh * sw // group_size, group_size
    ).mean(axis=-1)

    hidden = _conv_cl(p["conv"], x, causal=causal)
    hidden = unshuffle(hidden)
    return hidden + residual


def encoder_forward_cl(params, cfg: LtxVaeConfig, x):
    """Channels-last encoder twin (production TPU path): NHWC conv2d-tap
    convs + lane-axis norms, same structure as :func:`encoder_forward`
    (the NCDHW parity oracle).  Takes/returns the NCDHW [B,C,F,H,W]
    public contract; the layout transposes live at the boundary (the
    moments output is tiny).  Measured 1187 -> ~700 ms untiled at
    512x768x97f (docs/benchmark_results.md)."""
    causal = cfg.is_causal
    h = jnp.permute_dims(x, (0, 2, 3, 4, 1))  # -> [B,F,H,W,C]
    h = _patchify_cl(h, cfg.patch_size, cfg.patch_size_t)
    h = _conv_cl(params["conv_in"], h, causal=causal)

    for i, bp in enumerate(params["down_blocks"]):
        for rp in bp["resnets"]:
            h = _resnet_block_cl(rp, cfg, h, causal=causal)
        if bp.get("downsamplers"):
            stride = _DOWNSAMPLE_STRIDES[cfg.downsample_types[i].lower()]
            h = _pixel_unshuffle_downsample_cl(
                bp["downsamplers"][0],
                h,
                stride,
                cfg.block_out_channels[i + 1],
                causal=causal,
            )

    for rp in params["mid_block"]["resnets"]:
        h = _resnet_block_cl(rp, cfg, h, causal=causal)

    h = _rms_norm(
        h, 1e-8,
        params.get("norm_out", {}).get("weight") if params.get("norm_out")
        else None,
        cl=True,
    )
    h = silu(h)
    h = _conv_cl(params["conv_out"], h, causal=causal)

    ch = h.shape[-1]
    last = h[..., ch - 1 : ch]
    rep = jnp.tile(last, (1, 1, 1, 1, ch - 2))
    h = jnp.concatenate([h, rep], axis=-1)
    return jnp.permute_dims(h, (0, 4, 1, 2, 3))  # -> [B,C',F',H',W']


def _temb_scaled(params, temb):
    if temb is None:
        return None
    t = temb.reshape(-1).astype(jnp.float32)
    if params.get("timestep_scale_multiplier") is not None:
        t = t * params["timestep_scale_multiplier"].astype(jnp.float32)
    return t


def _block_temb_flat(block_params, temb_scaled, dtype):
    if temb_scaled is None or block_params.get("time_embedder") is None:
        return None
    return _time_embedder(block_params["time_embedder"], temb_scaled, dtype)


def _decoder_geometry(cfg: LtxVaeConfig):
    boc = list(cfg.decoder_block_out_channels)[::-1]
    sts = list(cfg.decoder_spatiotemporal_scaling)[::-1]
    upr = list(cfg.decoder_upsample_residual)[::-1]
    upf = list(cfg.decoder_upsample_factor)[::-1]
    return boc, sts, upr, upf


def _decoder_head_walk(params, cfg: LtxVaeConfig, h, temb_scaled, dtype,
                       conv_in, resnet, upsampler, stop: str):
    """The decoder-head traversal (vae.rs:1488-1619), shared by the block,
    pre-ups, and streaming variants.  ``resnet(site, p, h, temb)`` and
    ``upsampler(i, p, h, stride, residual, channel_repeats)`` carry layout
    and cache behavior; ``stop`` is 'tail' (break after the last upsampler
    — its resnets belong to the tail) or 'last_ups' (break before it)."""
    h = conv_in(params["conv_in"], h)

    mid = params["mid_block"]
    mt = _block_temb_flat(mid, temb_scaled, dtype)
    for k, rp in enumerate(mid["resnets"]):
        h = resnet(("mid", k), rp, h, mt)

    boc, sts, upr, upf = _decoder_geometry(cfg)
    n_up = len(params["up_blocks"])
    for i, bp in enumerate(params["up_blocks"]):
        last = i == n_up - 1
        if last and stop == "last_ups":
            break
        out_ch = boc[i] // upf[i]
        ut = _block_temb_flat(bp, temb_scaled, dtype)
        stride = (2, 2, 2) if sts[i] else (1, 2, 2)
        in_ch = out_ch * upf[i]
        channel_repeats = (out_ch * stride[0] * stride[1] * stride[2]) // in_ch
        h = upsampler(i, bp["upsamplers"][0], h, stride, upr[i],
                      channel_repeats)
        if last:
            break  # the last block's resnets belong to the tail
        for k, rp in enumerate(bp["resnets"]):
            h = resnet(("up", i, k), rp, h, ut)
    return h


def decoder_head_forward(params, cfg: LtxVaeConfig, z, temb=None,
                         noise_key=None):
    """conv_in → mid → up blocks, STOPPING before the last up-block's
    resnets (vae.rs:1488-1619 minus the final resnet stack).  The split
    point is right after the last upsampler so the tail is a pure
    temporal-conv pipeline that can run in exact halo chunks."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    return _decoder_head_walk(
        params, cfg, z.astype(dtype), _temb_scaled(params, temb), dtype,
        conv_in=lambda p, h: _conv(p, h, causal=causal),
        resnet=lambda site, p, h, t: _resnet_block(
            p, cfg, h, t, causal=causal, noise_key=noise_key),
        upsampler=lambda i, p, h, st, res, reps: _upsampler(
            p, h, st, res, reps, causal=causal),
        stop="tail",
    )


def _tail_modulation(params, cfg: LtxVaeConfig, h, temb_scaled, dtype,
                     cl: bool):
    """Output norm + decoder-level scale_shift_table modulation
    (vae.rs:1687-1723)."""
    h = _rms_norm(h, 1e-8, cl=cl)
    if (
        temb_scaled is not None
        and params.get("time_embedder") is not None
        and params.get("scale_shift_table") is not None
    ):
        e = _time_embedder(params["time_embedder"], temb_scaled, dtype)  # [B,2C]
        c = params["scale_shift_table"].shape[1]
        e = e.reshape(-1, 2, c) + params["scale_shift_table"][None].astype(dtype)
        if cl:
            shift = e[:, 0][:, None, None, None, :]
            scale = e[:, 1][:, None, None, None, :]
        else:
            shift = e[:, 0][:, :, None, None, None]
            scale = e[:, 1][:, :, None, None, None]
        h = h * (1.0 + scale) + shift
    return silu(h)


def _decoder_tail_walk(params, cfg: LtxVaeConfig, h, temb_scaled, dtype,
                       resnet, conv_out, cl: bool):
    """Last up-block resnets + output modulation + conv_out + unpatchify
    (vae.rs:1619-1727), shared by the block and streaming variants."""
    bp = params["up_blocks"][-1]
    ut = _block_temb_flat(bp, temb_scaled, dtype)
    for k, rp in enumerate(bp["resnets"]):
        h = resnet(k, rp, h, ut)
    h = _tail_modulation(params, cfg, h, temb_scaled, dtype, cl)
    h = conv_out(params["conv_out"], h)
    return _unpatchify(h, cfg.patch_size, cfg.patch_size_t, cl=cl)


def decoder_tail_forward(params, cfg: LtxVaeConfig, h, temb=None,
                         noise_key=None):
    """Last up-block resnets + output norm/modulation + conv_out +
    unpatchify (vae.rs:1619-1727).  Pure in T except kt<=3 convs, so a
    halo of one frame per conv makes chunked evaluation exact."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    return _decoder_tail_walk(
        params, cfg, h, _temb_scaled(params, temb), dtype,
        resnet=lambda k, p, hh, t: _resnet_block(
            p, cfg, hh, t, causal=causal, noise_key=noise_key),
        conv_out=lambda p, hh: _conv(p, hh, causal=causal),
        cl=False,
    )


# ---------------------------------------------------------------------------
# channels-last decoder (production path)
#
# Same bodies as the NCDHW decoder above (which stays as the parity
# oracle), with cl=True: convs use causal_conv3d_cl (kt NHWC conv2d taps;
# 158-165 TF/s vs 90-117 for XLA's NCDHW conv3d at the decoder's hot
# stages — scripts/profile_conv_variants.py) and channel norms reduce over
# the LANE axis.  Interfaces stay NCDHW: z is transposed on entry, video
# on exit.
# ---------------------------------------------------------------------------


def decoder_head_forward_cl(params, cfg: LtxVaeConfig, z, temb=None,
                            noise_key=None):
    """Channels-last twin of decoder_head_forward: z [B,latent,F',H',W']
    (NCDHW, transposed on entry) -> h [B,T,H,W,C]."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    h = jnp.transpose(z.astype(dtype), (0, 2, 3, 4, 1))
    return _decoder_head_walk(
        params, cfg, h, _temb_scaled(params, temb), dtype,
        conv_in=lambda p, hh: _conv_cl(p, hh, causal=causal),
        resnet=lambda site, p, hh, t: _resnet_block_cl(
            p, cfg, hh, t, causal=causal, noise_key=noise_key),
        upsampler=lambda i, p, hh, st, res, reps: _upsampler_cl(
            p, hh, st, res, reps, causal=causal),
        stop="tail",
    )


def decoder_tail_forward_cl(params, cfg: LtxVaeConfig, h, temb=None,
                            noise_key=None):
    """Channels-last twin of decoder_tail_forward: h [B,T,H,W,C] ->
    video [B,3,F,H,W] (NCDHW on exit)."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    out = _decoder_tail_walk(
        params, cfg, h, _temb_scaled(params, temb), dtype,
        resnet=lambda k, p, hh, t: _resnet_block_cl(
            p, cfg, hh, t, causal=causal, noise_key=noise_key),
        conv_out=lambda p, hh: _conv_cl(p, hh, causal=causal),
        cl=True,
    )
    return jnp.transpose(out, (0, 4, 1, 2, 3))


def decoder_head_pre_ups_forward_cl(params, cfg: LtxVaeConfig, z, temb=None,
                                    noise_key=None):
    """decoder_head_forward_cl STOPPING before the last up-block's
    upsampler: everything here runs at <= half the final resolution, so its
    activation peak is ~4x smaller than the full head's.  Pairs with
    decoder_ups_tail_stream_cl, which streams the remaining (memory-
    dominant) last upsampler + tail."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    h = jnp.transpose(z.astype(dtype), (0, 2, 3, 4, 1))
    return _decoder_head_walk(
        params, cfg, h, _temb_scaled(params, temb), dtype,
        conv_in=lambda p, hh: _conv_cl(p, hh, causal=causal),
        resnet=lambda site, p, hh, t: _resnet_block_cl(
            p, cfg, hh, t, causal=causal, noise_key=noise_key),
        upsampler=lambda i, p, hh, st, res, reps: _upsampler_cl(
            p, hh, st, res, reps, causal=causal),
        stop="last_ups",
    )


# ---------------------------------------------------------------------------
# streaming decoder (overlap-save): exact chunked decode with ZERO recompute
#
# (The exact halo-chunked tail these replaced — removed in round 5 —
# reprocessed 22 frames per chunk boundary.)  The streaming variants carry
# each temporal conv's last (kt-1) INPUT frames as explicit state between
# chunks (overlap-save), so every frame is convolved exactly once:
# identical math to the unchunked decoder, O(chunk) activation memory in T,
# and chunk count free of compute overhead — this is what lets the
# 13B-resident chip decode full frames instead of spatial tiles, and
# decodes unbounded-length video in constant memory (the reference's
# temporal tiling BLENDS overlaps, vae.rs:1927-2434 — approximate; this is
# exact).
#
# Stream calculus (symmetric kt=3, replicate edges, the decoder's config —
# decoder_causal=False): a conv consuming chunk frames [a, b) with cached
# inputs [a-2, a) emits outputs [a-1, b-1) — a 1-frame pipeline delay.  The
# first chunk substitutes one replicated frame for the cache (emits t-1);
# the last chunk appends one replicated frame and flushes (emits t+1).
# Residual adds re-align via a pure 2-frame delay register on the shortcut.
# Three programs total (first/mid/last), each jitted once per shape.
#
# The streaming resnet/upsampler/head/tail are the SAME bodies as the block
# variants above — the only difference is the injected conv callables,
# which thread a per-conv cache through `_conv_stream_cl`.
# ---------------------------------------------------------------------------


def _conv_stream_cl(p, x, cache, mode):
    """Streaming symmetric kt=3 conv (channels-last).  ``x`` [B,t,H,W,C] is
    the new input chunk, ``cache`` [B,2,H,W,C] the carried last-2 input
    frames (ignored when mode starts the stream).  Returns (y, new_cache);
    y has t-1 / t / t+1 frames for first/mid/last."""
    first = mode in ("first", "single")
    last = mode in ("last", "single")
    base = x if first else jnp.concatenate([cache, x], axis=1)
    if first:
        # left edge: replicate pad 1 frame ((kt-1)//2, conv3d.py:196)
        xin = jnp.concatenate([base[:, :1], base], axis=1)
    else:
        xin = base
    if last:
        xin = jnp.concatenate([xin, xin[:, -1:]], axis=1)
    y = causal_conv3d_cl(xin, p["weight"], p.get("bias"), time_pad="valid")
    new_cache = None if last else base[:, -2:]
    return y, new_cache


def _delay_stream(x, cache, n: int, mode):
    """Pure n-frame delay register: emits the stream shifted n frames later
    so pointwise branches re-align with conv-delayed branches."""
    first = mode in ("first", "single")
    last = mode in ("last", "single")
    buf = x if first else jnp.concatenate([cache, x], axis=1)
    if last:
        return buf, None
    return buf[:, : buf.shape[1] - n], buf[:, -n:]


def _resnet_stream_cl(p, cfg, x, st, mode, temb2=None, noise_key=None):
    """Streaming resnet: _resnet_core with cache-threading convs — two conv
    delays (1 frame each) plus a 2-frame shortcut delay.  The [H, W]
    spatial noise is shared across T (vae.rs:741-753), so it is identical
    per chunk as long as every chunk replays the same key.  State:
    {"c1","c2","sc"}."""
    new = {}

    def conv_c(name):
        def run(h):
            y, new[name] = _conv_stream_cl(p[name.replace("c", "conv")],
                                           h, st[name], mode)
            return y
        return run

    def shortcut_align(s):
        s, new["sc"] = _delay_stream(s, st["sc"], 2, mode)
        return s

    out = _resnet_core(
        p, cfg, x, temb2,
        conv1=conv_c("c1"), conv2=conv_c("c2"),
        # 1x1x1 conv: pointwise in T, no cache needed
        shortcut_conv=lambda s: _conv_cl(p["conv_shortcut"], s, causal=False),
        shortcut_align=shortcut_align, cl=True, noise_key=noise_key,
    )
    return out, new


def _upsampler_stream_cl(p, x, stt, stride, residual: bool,
                         channel_repeats: int, mode):
    """Streaming upsampler: _upsampler_core with a cache-threading conv.
    The conv path delays 1 input frame; the depth-to-space residual is
    pointwise per input frame, so it re-aligns through a 1-frame delay
    register.  The global ``st-1`` output crop applies only at the stream
    start.  State: {"conv", "res"}."""
    new = {"res": stt.get("res")}  # keep state structure stable when off

    def conv_fn(y):
        out, new["conv"] = _conv_stream_cl(p["conv"], y, stt["conv"], mode)
        return out

    def res_align(y):
        out, new["res"] = _delay_stream(y, stt["res"], 1, mode)
        return out

    h = _upsampler_core(
        p, x, stride, residual, channel_repeats,
        conv_fn=conv_fn, res_align=res_align,
        crop_start=(stride[0] > 1 and mode in ("first", "single")), cl=True,
    )
    return h, new


def head_stream_init(params, cfg: LtxVaeConfig, b: int, hgt: int, wid: int,
                     dtype):
    """Zero-filled carried state for decoder_head_stream_cl at LATENT
    spatial size (hgt, wid).  Cache shapes follow the head's geometry:
    conv_in caches the latent-width input; each up block doubles H/W (and
    its conv cache sits at the PRE-upsample resolution)."""
    boc, sts, upr, upf = _decoder_geometry(cfg)

    def cache(t, h_, w_, c):
        return jnp.zeros((b, t, h_, w_, c), dtype)

    def res_state(c, h_, w_):
        return {"c1": cache(2, h_, w_, c), "c2": cache(2, h_, w_, c),
                "sc": cache(2, h_, w_, c)}

    state = {
        "conv_in": cache(2, hgt, wid, params["conv_in"]["weight"].shape[1]),
        "mid": [res_state(boc[0], hgt, wid)
                for _ in params["mid_block"]["resnets"]],
        "up": [],
    }
    h_, w_ = hgt, wid
    n_up = len(params["up_blocks"])
    for i, bp in enumerate(params["up_blocks"]):
        in_ch = boc[i]
        out_ch = boc[i] // upf[i]
        up_state = {
            "ups": {"conv": cache(2, h_, w_, in_ch),
                    "res": cache(1, h_, w_, in_ch)},
            "resnets": [],
        }
        h_, w_ = h_ * 2, w_ * 2
        if i < n_up - 1:
            up_state["resnets"] = [
                res_state(out_ch, h_, w_) for _ in bp["resnets"]
            ]
        state["up"].append(up_state)
    return state


def decoder_head_stream_cl(params, cfg: LtxVaeConfig, z, state, mode,
                           temb=None, noise_key=None):
    """One streaming step of the channels-last decoder HEAD: ``z`` is the
    next [B,latent,t,H',W'] chunk of latent frames (NCDHW like
    decoder_head_forward_cl); returns (h_chunk [B,T,H,W,C], new_state).

    Composing with decoder_tail_stream_cl makes the WHOLE decode O(chunk)
    in T: every temporal conv in the network carries overlap-save state, so
    clip length is unbounded at constant activation memory, exactly.
    """
    if cfg.decoder_causal:
        raise NotImplementedError(
            "streaming decode assumes the symmetric (non-causal) decoder"
        )
    dtype = params["conv_in"]["weight"].dtype
    h = jnp.transpose(z.astype(dtype), (0, 2, 3, 4, 1))
    new = {"mid": [], "up": []}

    def conv_in(p, hh):
        y, new["conv_in"] = _conv_stream_cl(p, hh, state["conv_in"], mode)
        return y

    def resnet(site, p, hh, t):
        stt = (state["mid"][site[1]] if site[0] == "mid"
               else state["up"][site[1]]["resnets"][site[2]])
        y, ns = _resnet_stream_cl(p, cfg, hh, stt, mode, t, noise_key)
        if site[0] == "mid":
            new["mid"].append(ns)
        else:
            new["up"][site[1]]["resnets"].append(ns)
        return y

    def upsampler(i, p, hh, stride, res, reps):
        y, us = _upsampler_stream_cl(
            p, hh, state["up"][i]["ups"], stride, res, reps, mode
        )
        new["up"].append({"ups": us, "resnets": []})
        return y

    h = _decoder_head_walk(
        params, cfg, h, _temb_scaled(params, temb), dtype,
        conv_in=conv_in, resnet=resnet, upsampler=upsampler, stop="tail",
    )
    return h, new


def _last_ups_geometry(params, cfg: LtxVaeConfig):
    boc, sts, upr, upf = _decoder_geometry(cfg)
    i = len(params["up_blocks"]) - 1
    out_ch = boc[i] // upf[i]
    stride = (2, 2, 2) if sts[i] else (1, 2, 2)
    in_ch = out_ch * upf[i]
    channel_repeats = (out_ch * stride[0] * stride[1] * stride[2]) // in_ch
    return stride, upr[i], channel_repeats, in_ch


def ups_tail_stream_init(params, cfg: LtxVaeConfig, b: int, hgt: int,
                         wid: int, dtype):
    """State for decoder_ups_tail_stream_cl; (hgt, wid) are the
    PRE-upsample spatial dims (half the tail's)."""
    _, _, _, in_ch = _last_ups_geometry(params, cfg)
    return {
        "ups": {
            "conv": jnp.zeros((b, 2, hgt, wid, in_ch), dtype),
            "res": jnp.zeros((b, 1, hgt, wid, in_ch), dtype),
        },
        "tail": tail_stream_init(params, b, hgt * 2, wid * 2, dtype),
    }


def ups_tail_first_chunk_min(params, cfg: LtxVaeConfig) -> int:
    """Smallest first chunk (in pre-upsample frames) that clears the last
    upsampler + tail pipeline fill."""
    stride, _, _, _ = _last_ups_geometry(params, cfg)
    st = stride[0]
    delay = tail_stream_delay(params)
    m = 2
    while st * (m - 1) - (st - 1) <= delay:
        m += 1
    return m


def decoder_ups_tail_stream_cl(params, cfg: LtxVaeConfig, h, state, mode,
                               temb=None, noise_key=None):
    """Streaming step over the LAST upsampler + tail (channels-last).
    Takes chunks of decoder_head_pre_ups_forward_cl's output; the
    upsampler doubles the stream temporally before the tail consumes it,
    so decode peak memory is bounded by ~2x chunk at tail resolution."""
    bp = params["up_blocks"][-1]
    stride, residual, channel_repeats, _ = _last_ups_geometry(params, cfg)
    h, ups_new = _upsampler_stream_cl(
        bp["upsamplers"][0], h, state["ups"], stride, residual,
        channel_repeats, mode,
    )
    v, tail_new = decoder_tail_stream_cl(
        params, cfg, h, state["tail"], mode, temb, noise_key
    )
    return v, {"ups": ups_new, "tail": tail_new}


def tail_stream_delay(params) -> int:
    """Total pipeline delay of the streaming tail in input frames: 2 per
    resnet (two kt=3 convs) + 1 for conv_out."""
    return 2 * len(params["up_blocks"][-1]["resnets"]) + 1


def tail_stream_init(params, b: int, hgt: int, wid: int, dtype):
    """Zero-filled carried state for decoder_tail_stream_cl (contents are
    ignored on the first chunk; shapes must match the tail's width)."""
    c = params["conv_out"]["weight"].shape[1]  # tail channel width

    def cache():
        return jnp.zeros((b, 2, hgt, wid, c), dtype)

    return {
        "resnets": [
            {"c1": cache(), "c2": cache(), "sc": cache()}
            for _ in params["up_blocks"][-1]["resnets"]
        ],
        "out": cache(),
    }


def decoder_tail_stream_cl(params, cfg: LtxVaeConfig, h, state, mode,
                           temb=None, noise_key=None):
    """One streaming step of the channels-last decoder tail.

    ``h`` [B,t,H,W,C] is the next chunk of the head's output stream;
    ``mode`` is "first" / "mid" / "last" / "single".  Returns
    (video_chunk NCDHW, new_state); the chunk has (t-delay) / t /
    (t+delay) frames for first/mid/last.  Requires t >= 2 (conv caches)
    and, for the first chunk, t > tail_stream_delay(params).
    """
    if cfg.decoder_causal:
        raise NotImplementedError(
            "streaming tail assumes the symmetric (non-causal) decoder "
            "padding; decoder_causal configs use dense or temporal-tiled "
            "decode"
        )
    dtype = params["conv_in"]["weight"].dtype
    new_res = []
    out_cache = {}

    def resnet(k, p, hh, t):
        y, ns = _resnet_stream_cl(p, cfg, hh, state["resnets"][k], mode, t,
                                  noise_key)
        new_res.append(ns)
        return y

    def conv_out(p, hh):
        y, out_cache["out"] = _conv_stream_cl(p, hh, state["out"], mode)
        return y

    out = _decoder_tail_walk(
        params, cfg, h, _temb_scaled(params, temb), dtype,
        resnet=resnet, conv_out=conv_out, cl=True,
    )
    video = jnp.transpose(out, (0, 4, 1, 2, 3))
    return video, {"resnets": new_res, "out": out_cache["out"]}


def _use_channels_last(channels_last=None) -> bool:
    if channels_last is not None:
        return channels_last
    return os.environ.get("CVT_DECODER_LAYOUT", "cl") != "ncdhw"


def fullstream_first_chunk_min(params, cfg: LtxVaeConfig) -> int:
    """Smallest first-chunk latent frame count for which every stage of the
    head+tail streaming pipeline emits >= 1 frame on the first chunk (each
    conv swallows 1 frame of pipeline fill; temporal upsamplers double the
    stream and crop st-1)."""
    boc, sts, upr, upf = _decoder_geometry(cfg)
    n_up = len(params["up_blocks"])

    def min_count(m: int) -> int:
        c = m - 1  # conv_in
        counts = [c]
        for _ in params["mid_block"]["resnets"]:
            c -= 2
            counts.append(c)
        for i, bp in enumerate(params["up_blocks"]):
            st = 2 if sts[i] else 1
            c = st * (c - 1) - (st - 1)
            counts.append(c)
            if i < n_up - 1:
                for _ in bp["resnets"]:
                    c -= 2
                    counts.append(c)
        for _ in params["up_blocks"][-1]["resnets"]:
            c -= 2
            counts.append(c)
        counts.append(c - 1)  # conv_out
        return min(counts)

    m = 2
    while min_count(m) < 1:
        m += 1
    return m


def decoder_forward_fullstream(params, cfg: LtxVaeConfig, z, temb=None,
                               noise_key=None, n_chunks: int = 2,
                               head_fn=None, tail_fn=None):
    """FULLY streamed decode: latent chunks flow through the streaming head
    AND streaming tail, so activation memory is O(chunk) at every stage —
    clip length is unbounded, exactly (no halo recompute, no tile blending).
    Requires first latent chunk >= fullstream_first_chunk_min (pipeline
    fill); at 97f/13-latent-frame clips use the head-once + streamed-tail
    path (decoder_forward(tail_stream_chunks=...)) instead.
    ``head_fn``/``tail_fn`` optionally substitute jitted step programs."""
    t_total = z.shape[2]
    spans = stream_spans(t_total, n_chunks)
    need = fullstream_first_chunk_min(params, cfg)
    if len(spans) > 1 and spans[0][1] - spans[0][0] < need:
        raise ValueError(
            f"full-stream first chunk {spans[0][1] - spans[0][0]} latent "
            f"frames < pipeline fill {need}; use fewer chunks (or the "
            f"tail-only streaming mode)"
        )
    dtype = params["conv_in"]["weight"].dtype
    b, _, _, hl, wl = z.shape
    up_factor = 2 ** len(params["up_blocks"])
    hstate = head_stream_init(params, cfg, b, hl, wl, dtype)
    tstate = tail_stream_init(params, b, hl * up_factor, wl * up_factor,
                              dtype)
    hstep = head_fn or (
        lambda zz, st, mode: decoder_head_stream_cl(
            params, cfg, zz, st, mode, temb, noise_key
        )
    )
    tstep = tail_fn or (
        lambda hh, st, mode: decoder_tail_stream_cl(
            params, cfg, hh, st, mode, temb, noise_key
        )
    )
    outs = []
    for i, (a, bnd) in enumerate(spans):
        mode = _stream_mode(i, len(spans))
        hc, hstate = hstep(z[:, :, a:bnd], hstate, mode)
        vc, tstate = tstep(hc, tstate, mode)
        outs.append(vc)
    return jnp.concatenate(outs, axis=2)


def stream_spans(t_total: int, n_chunks: int):
    """Uniform chunk spans [(start, end), ...] for the streaming tail."""
    per = max(-(-t_total // n_chunks), 1)
    return [(s, min(s + per, t_total)) for s in range(0, t_total, per)]


def _stream_mode(i: int, n: int) -> str:
    if n == 1:
        return "single"
    return "first" if i == 0 else ("last" if i == n - 1 else "mid")


def decoder_tail_streamed(params, cfg: LtxVaeConfig, h, temb=None,
                          noise_key=None, n_chunks: int = 2, tail_fn=None):
    """Run the channels-last tail over ``n_chunks`` streaming steps
    (overlap-save, zero recompute — see decoder_tail_stream_cl).  ``h`` is
    the head's [B,T,H,W,C] output; returns NCDHW video.  ``tail_fn``
    optionally substitutes a jitted (params, h, state, temb, mode) step."""
    t_total = h.shape[1]
    spans = stream_spans(t_total, n_chunks)
    delay = tail_stream_delay(params)
    if len(spans) > 1 and spans[0][1] - spans[0][0] <= delay:
        raise ValueError(
            f"streaming tail chunk size {spans[0][1] - spans[0][0]} must "
            f"exceed the pipeline delay {delay}; use fewer chunks"
        )
    state = tail_stream_init(params, h.shape[0], h.shape[2], h.shape[3],
                             h.dtype)
    step = tail_fn or (
        lambda p, hh, st, tt, mode: decoder_tail_stream_cl(
            p, cfg, hh, st, mode, tt, noise_key
        )
    )
    outs = []
    for i, (a, b) in enumerate(spans):
        mode = _stream_mode(i, len(spans))
        piece, state = step(params, h[:, a:b], state, temb, mode)
        outs.append(piece)
    return jnp.concatenate(outs, axis=2)


def decoder_ups_tail_streamed(params, cfg: LtxVaeConfig, h, temb=None,
                              noise_key=None, n_chunks: int = 4,
                              step_fn=None):
    """Run the last upsampler + tail over ``n_chunks`` streaming steps.
    ``h`` is decoder_head_pre_ups_forward_cl's [B,T,H/2,W/2,C] output."""
    t_total = h.shape[1]
    spans = stream_spans(t_total, n_chunks)
    need = ups_tail_first_chunk_min(params, cfg)
    if len(spans) > 1 and spans[0][1] - spans[0][0] < need:
        raise ValueError(
            f"ups+tail stream first chunk {spans[0][1] - spans[0][0]} "
            f"frames < pipeline fill {need}; use fewer chunks"
        )
    state = ups_tail_stream_init(params, cfg, h.shape[0], h.shape[2],
                                 h.shape[3], h.dtype)
    step = step_fn or (
        lambda p, hh, st, tt, mode: decoder_ups_tail_stream_cl(
            p, cfg, hh, st, mode, tt, noise_key
        )
    )
    outs = []
    for i, (a, b) in enumerate(spans):
        mode = _stream_mode(i, len(spans))
        piece, state = step(params, h[:, a:b], state, temb, mode)
        outs.append(piece)
    return jnp.concatenate(outs, axis=2)


def decoder_forward(params, cfg: LtxVaeConfig, z, temb=None, noise_key=None,
                    channels_last=None,
                    tail_stream_chunks: int = 0,
                    tail_stream_from_ups: bool = False):
    """LtxVideoDecoder3d (vae.rs:1488-1727). z [B,latent,F,H,W] -> video
    [B,3,F*8,H*32,W*32] in [-1,1]; ``temb`` [B] decode timesteps or None.

    ``tail_stream_chunks > 1``: streaming overlap-save tail — each temporal
    conv carries its last-2 input frames as state, so chunking has ZERO
    recompute and the chunk count is free: O(chunk) tail memory at
    unchunked cost.  The full-frame decode peak is dominated by this tail
    (measured 6.5 of 7.1 GB at 512x768x97f); with n=2 the whole decode fits
    alongside a resident 5 GiB text encoder.  Channels-last only.  (The
    exact halo-chunked tail this superseded — 22 recomputed frames per
    boundary for the same exactness — was removed in round 5.)

    ``tail_stream_from_ups``: start the stream BEFORE the last upsampler so
    the dense prefix runs at half resolution (13B-resident decode mode).

    ``channels_last`` (default: on, opt out via CVT_DECODER_LAYOUT=ncdhw):
    run the channels-last decoder twins — the production path on TPU.

    NOTE: when this whole function runs under ONE jit, XLA may schedule
    the chunks' buffers to overlap and the peak-memory win evaporates —
    the facade (``decode``) therefore jits head and tail separately.
    """
    cl = _use_channels_last(channels_last)
    head = decoder_head_forward_cl if cl else decoder_head_forward
    tail = decoder_tail_forward_cl if cl else decoder_tail_forward

    if tail_stream_chunks > 0 and not cl:
        raise ValueError("tail_stream_chunks requires the channels-last "
                         "decoder (production layout)")
    if tail_stream_chunks > 1 and tail_stream_from_ups:
        h = decoder_head_pre_ups_forward_cl(params, cfg, z, temb, noise_key)
        return decoder_ups_tail_streamed(
            params, cfg, h, temb, noise_key, n_chunks=tail_stream_chunks
        )
    h = head(params, cfg, z, temb, noise_key)
    if tail_stream_chunks > 1:
        return decoder_tail_streamed(
            params, cfg, h, temb, noise_key, n_chunks=tail_stream_chunks
        )
    return tail(params, cfg, h, temb, noise_key)


# ---------------------------------------------------------------------------
# distribution + facade
# ---------------------------------------------------------------------------


def gaussian_split(moments):
    """moments [B, 2C, ...] -> (mean, logvar) (vae.rs:115-146)."""
    c = moments.shape[1] // 2
    return moments[:, :c], moments[:, c:]


def gaussian_sample(moments, key):
    mean, logvar = gaussian_split(moments)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + jnp.exp(0.5 * logvar) * eps


def normalize_latents(latents, mean, std, scaling_factor: float = 1.0):
    """(x - mean) * scaling / std per channel (t2v_pipeline.rs:552-571)."""
    c = latents.shape[1]
    mean = mean.reshape(1, c, 1, 1, 1).astype(latents.dtype)
    std = std.reshape(1, c, 1, 1, 1).astype(latents.dtype)
    return (latents - mean) * scaling_factor / std


def denormalize_latents(latents, mean, std, scaling_factor: float = 1.0):
    c = latents.shape[1]
    mean = mean.reshape(1, c, 1, 1, 1).astype(latents.dtype)
    std = std.reshape(1, c, 1, 1, 1).astype(latents.dtype)
    return latents * std / scaling_factor + mean


# ---------------------------------------------------------------------------
# tiling (vae.rs:1927-2434)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TilingConfig:
    tile_sample_min_height: int = 512
    tile_sample_min_width: int = 512
    tile_sample_min_num_frames: int = 16
    tile_sample_stride_height: int = 384
    tile_sample_stride_width: int = 384
    tile_sample_stride_num_frames: int = 8


def blend_h(a, b, blend: int):
    """b[..., :blend] = a[..., -blend+x]*(1-x/blend) + b[..., x]*(x/blend)."""
    blend = min(blend, a.shape[4], b.shape[4])
    if blend == 0:
        return b
    w = (jnp.arange(blend, dtype=jnp.float32) / blend).astype(b.dtype)
    w = w.reshape(1, 1, 1, 1, blend)
    mixed = a[..., -blend:] * (1.0 - w) + b[..., :blend] * w
    return jnp.concatenate([mixed, b[..., blend:]], axis=4)


def blend_v(a, b, blend: int):
    blend = min(blend, a.shape[3], b.shape[3])
    if blend == 0:
        return b
    w = (jnp.arange(blend, dtype=jnp.float32) / blend).astype(b.dtype)
    w = w.reshape(1, 1, 1, blend, 1)
    mixed = a[..., -blend:, :] * (1.0 - w) + b[..., :blend, :] * w
    return jnp.concatenate([mixed, b[..., blend:, :]], axis=3)


def blend_t(a, b, blend: int):
    blend = min(blend, a.shape[2], b.shape[2])
    if blend == 0:
        return b
    w = (jnp.arange(blend, dtype=jnp.float32) / blend).astype(b.dtype)
    w = w.reshape(1, 1, blend, 1, 1)
    mixed = a[:, :, -blend:] * (1.0 - w) + b[:, :, :blend] * w
    return jnp.concatenate([mixed, b[:, :, blend:]], axis=2)


def tiled_decode(params, cfg: LtxVaeConfig, z, temb, tiling: TilingConfig,
                 decode_fn=None):
    """Spatial tiling: loop in latent space, blend in sample space
    (vae.rs:2225-2290).  Tiles blend against already-blended neighbors."""
    decode_fn = decode_fn or (lambda zz, tt: decoder_forward(params["decoder"], cfg, zz, tt))
    _, _, _, height, width = z.shape
    sc = cfg.spatial_compression_ratio
    sample_h, sample_w = height * sc, width * sc

    lat_min_h = tiling.tile_sample_min_height // sc
    lat_min_w = tiling.tile_sample_min_width // sc
    lat_str_h = tiling.tile_sample_stride_height // sc
    lat_str_w = tiling.tile_sample_stride_width // sc
    bh = tiling.tile_sample_min_height - tiling.tile_sample_stride_height
    bw = tiling.tile_sample_min_width - tiling.tile_sample_stride_width

    rows = []
    for i in range(0, height, lat_str_h):
        row = []
        for j in range(0, width, lat_str_w):
            tile = z[:, :, :, i : min(i + lat_min_h, height), j : min(j + lat_min_w, width)]
            row.append(decode_fn(tile, temb))
        rows.append(row)

    prev_row_blended: list = []
    result_rows = []
    for ri, row in enumerate(rows):
        result_row = []
        curr_row_blended: list = []
        for cj, tile in enumerate(row):
            if ri > 0:
                tile = blend_v(prev_row_blended[cj], tile, bh)
            if cj > 0:
                tile = blend_h(curr_row_blended[cj - 1], tile, bw)
            curr_row_blended.append(tile)
            hs = min(tiling.tile_sample_stride_height, tile.shape[3])
            ws = min(tiling.tile_sample_stride_width, tile.shape[4])
            result_row.append(tile[:, :, :, :hs, :ws])
        result_rows.append(jnp.concatenate(result_row, axis=4))
        prev_row_blended = curr_row_blended

    dec = jnp.concatenate(result_rows, axis=3)
    return dec[:, :, :, :sample_h, :sample_w]


def tiled_encode(params, cfg: LtxVaeConfig, x, tiling: TilingConfig,
                 encode_fn=None):
    """Spatial tiling for encode: loop in sample space, blend in latent space
    (vae.rs:2158-2223)."""
    encode_fn = encode_fn or (lambda xx: encoder_forward(params["encoder"], cfg, xx))
    _, _, _, height, width = x.shape
    sc = cfg.spatial_compression_ratio
    lat_h, lat_w = height // sc, width // sc

    lat_min_h = tiling.tile_sample_min_height // sc
    lat_min_w = tiling.tile_sample_min_width // sc
    lat_str_h = tiling.tile_sample_stride_height // sc
    lat_str_w = tiling.tile_sample_stride_width // sc
    bh = lat_min_h - lat_str_h
    bw = lat_min_w - lat_str_w

    rows = []
    for i in range(0, height, tiling.tile_sample_stride_height):
        row = []
        for j in range(0, width, tiling.tile_sample_stride_width):
            tile = x[
                :, :, :,
                i : min(i + tiling.tile_sample_min_height, height),
                j : min(j + tiling.tile_sample_min_width, width),
            ]
            row.append(encode_fn(tile))
        rows.append(row)

    prev_row_blended: list = []
    result_rows = []
    for ri, row in enumerate(rows):
        result_row = []
        curr_row_blended: list = []
        for cj, tile in enumerate(row):
            if ri > 0:
                tile = blend_v(prev_row_blended[cj], tile, bh)
            if cj > 0:
                tile = blend_h(curr_row_blended[cj - 1], tile, bw)
            curr_row_blended.append(tile)
            hs = min(lat_str_h, tile.shape[3])
            ws = min(lat_str_w, tile.shape[4])
            result_row.append(tile[:, :, :, :hs, :ws])
        result_rows.append(jnp.concatenate(result_row, axis=4))
        prev_row_blended = curr_row_blended

    enc = jnp.concatenate(result_rows, axis=3)
    return enc[:, :, :, :lat_h, :lat_w]


def temporal_tiled_decode(params, cfg: LtxVaeConfig, z, temb,
                          tiling: TilingConfig, decode_fn=None):
    """Temporal tiling (vae.rs:2358-2434): stride in latent time, blend in
    sample time, drop the trailing frame of non-first tiles."""
    _, _, num_frames, h, w = z.shape
    tc = cfg.temporal_compression_ratio
    sc = cfg.spatial_compression_ratio
    num_sample_frames = (num_frames - 1) * tc + 1

    lat_min_t = tiling.tile_sample_min_num_frames // tc
    lat_str_t = tiling.tile_sample_stride_num_frames // tc
    blend = tiling.tile_sample_min_num_frames - tiling.tile_sample_stride_num_frames

    lat_min_h = tiling.tile_sample_min_height // sc
    lat_min_w = tiling.tile_sample_min_width // sc

    row = []
    for loop_idx, i in enumerate(range(0, num_frames, lat_str_t)):
        tile = z[:, :, i : min(i + lat_min_t + 1, num_frames)]
        if w > lat_min_w or h > lat_min_h:
            dec = tiled_decode(params, cfg, tile, temb, tiling, decode_fn)
        else:
            fn = decode_fn or (lambda zz, tt: decoder_forward(params["decoder"], cfg, zz, tt))
            dec = fn(tile, temb)
        if loop_idx > 0 and dec.shape[2] > 1:
            dec = dec[:, :, :-1]
        row.append(dec)

    result = []
    for idx, tile in enumerate(row):
        if idx > 0:
            blended = blend_t(row[idx - 1], tile, blend)
            end = min(tiling.tile_sample_stride_num_frames, blended.shape[2])
            result.append(blended[:, :, :end])
        else:
            end = min(tiling.tile_sample_stride_num_frames + 1, tile.shape[2])
            result.append(tile[:, :, :end])

    dec = jnp.concatenate(result, axis=2)
    return dec[:, :, :num_sample_frames]


def temporal_tiled_encode(params, cfg: LtxVaeConfig, x, tiling: TilingConfig,
                          encode_fn=None):
    """Temporal tiling for encode (vae.rs:2294-2356)."""
    _, _, num_frames, h, w = x.shape
    tc = cfg.temporal_compression_ratio
    latent_num_frames = (num_frames - 1) // tc + 1

    lat_min_t = tiling.tile_sample_min_num_frames // tc
    lat_str_t = tiling.tile_sample_stride_num_frames // tc
    blend = lat_min_t - lat_str_t

    row = []
    for i in range(0, num_frames, tiling.tile_sample_stride_num_frames):
        tile = x[:, :, i : min(i + tiling.tile_sample_min_num_frames + 1, num_frames)]
        if h > tiling.tile_sample_min_height or w > tiling.tile_sample_min_width:
            enc = tiled_encode(params, cfg, tile, tiling, encode_fn)
        else:
            fn = encode_fn or (lambda xx: encoder_forward(params["encoder"], cfg, xx))
            enc = fn(tile)
        if i == 0:
            enc = enc[:, :, 1:]
        row.append(enc)

    result = []
    for idx, tile in enumerate(row):
        if idx > 0:
            blended = blend_t(row[idx - 1], tile, blend)
            end = min(lat_str_t, blended.shape[2])
            result.append(blended[:, :, :end])
        else:
            end = min(lat_str_t + 1, tile.shape[2])
            result.append(tile[:, :, :end])

    enc = jnp.concatenate(result, axis=2)
    return enc[:, :, :latent_num_frames]


@functools.lru_cache(maxsize=8)
def _jitted_decoder(cfg: LtxVaeConfig, channels_last: bool):
    """Compile-once full decoder for the facade's default path (config is
    static; params/z/temb are traced arguments)."""
    return jax.jit(
        lambda p, zz, tt: decoder_forward(p, cfg, zz, tt,
                                          channels_last=channels_last)
    )


@functools.lru_cache(maxsize=8)
def _jitted_decoder_stream(cfg: LtxVaeConfig, n_chunks: int):
    """Streaming-tail decode with head and per-chunk steps as SEPARATE
    jits, zero chunking recompute.  One jit over the whole chunked decode
    would let XLA overlap the chunks' buffers and lose the peak-memory
    win (observed RESOURCE_EXHAUSTED next to a resident 5 GiB T5); the
    step programs (first/mid/last) compile once each per shape and state
    rides between them as device arrays."""
    head = jax.jit(lambda p, zz, tt: decoder_head_forward_cl(p, cfg, zz, tt))
    step = {
        m: jax.jit(
            functools.partial(
                lambda p, hh, st, tt, mode: decoder_tail_stream_cl(
                    p, cfg, hh, st, mode, tt
                ),
                mode=m,
            )
        )
        for m in ("first", "mid", "last", "single")
    }

    def run(p, zz, tt):
        h = head(p, zz, tt)
        return decoder_tail_streamed(
            p, cfg, h, tt, n_chunks=n_chunks,
            tail_fn=lambda pp, hh, st, t2, mode: step[mode](pp, hh, st, t2),
        )

    return run


@functools.lru_cache(maxsize=8)
def _jitted_decoder_stream_ups(cfg: LtxVaeConfig, n_chunks: int):
    """Streaming decode split BEFORE the last upsampler: the dense prefix
    runs at <= half resolution (~4x smaller peak than the full head), and
    the last upsampler + tail stream in n_chunks overlap-save steps —
    decode peak ~1.5 GiB at 512x768x97f vs ~2.2 head-bound.  This is the
    13B-resident decode mode."""
    head = jax.jit(
        lambda p, zz, tt: decoder_head_pre_ups_forward_cl(p, cfg, zz, tt)
    )

    def us(p, hh, st, tt, mode):
        return decoder_ups_tail_stream_cl(p, cfg, hh, st, mode, tt)

    step = {m: jax.jit(functools.partial(us, mode=m))
            for m in ("first", "mid", "last", "single")}

    def run(p, zz, tt):
        h = head(p, zz, tt)
        return decoder_ups_tail_streamed(
            p, cfg, h, tt, n_chunks=n_chunks,
            step_fn=lambda pp, hh, st, t2, mode: step[mode](pp, hh, st, t2),
        )

    return run


@functools.lru_cache(maxsize=8)
def _jitted_decoder_fullstream(cfg: LtxVaeConfig, n_chunks: int):
    """Fully streamed decode (streaming head AND tail) with per-mode step
    programs — O(chunk) activation memory at every stage, unbounded T."""
    def hs(p, zz, st, tt, mode):
        return decoder_head_stream_cl(p, cfg, zz, st, mode, tt)

    def ts(p, hh, st, tt, mode):
        return decoder_tail_stream_cl(p, cfg, hh, st, mode, tt)

    modes = ("first", "mid", "last", "single")
    hstep = {m: jax.jit(functools.partial(hs, mode=m)) for m in modes}
    tstep = {m: jax.jit(functools.partial(ts, mode=m)) for m in modes}

    def run(p, zz, tt):
        return decoder_forward_fullstream(
            p, cfg, zz, tt, n_chunks=n_chunks,
            head_fn=lambda c, s, m: hstep[m](p, c, s, tt),
            tail_fn=lambda c, s, m: tstep[m](p, c, s, tt),
        )

    return run


@functools.lru_cache(maxsize=8)
@functools.lru_cache(maxsize=8)
def _jitted_encoder(cfg: LtxVaeConfig, channels_last: Optional[bool] = None):
    """Default encode program: channels-last on by default (same
    CVT_DECODER_LAYOUT=ncdhw opt-out as the decoder; the NCDHW
    encoder_forward stays as the parity oracle)."""
    if _use_channels_last(channels_last):
        return jax.jit(lambda p, xx: encoder_forward_cl(p, cfg, xx))
    return jax.jit(lambda p, xx: encoder_forward(p, cfg, xx))


def _device_free_bytes() -> Optional[int]:
    """Free HBM on the default device, or None when the backend doesn't
    report memory stats (CPU, some plugins)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
    except Exception:  # noqa: BLE001 — stats are best-effort
        pass
    return None


# measured at 512x768x97f (docs/benchmark_results.md, scripts/profile_decode):
# full-frame dense decode peaks ~7.1 GiB, head-bound ~2.2 GiB, ups-split
# prefix ~1.5 GiB, fullstream O(chunk).  Expressed per output pixel-frame
# (B*F*H*W at sample resolution) so the policy scales across shapes.
_DENSE_PEAK_B_PER_PX = 200.0
_HEAD_PEAK_B_PER_PX = 62.0
_UPS_PEAK_B_PER_PX = 43.0


def select_decode_mode(cfg: LtxVaeConfig, z_shape, *,
                       free_bytes: Optional[int] = None,
                       channels_last: Optional[bool] = None) -> dict:
    """THE decode-mode policy — the single selection point for the facade.

    Inputs: latent shape, free HBM (queried from the device when not
    given), decoder layout.  Output: kwargs for :func:`decode` choosing
    among the EXACT modes only (dense / streamed tail / ups-split stream /
    fullstream) — approximate spatial/temporal tiling stays opt-in via
    ``use_tiling``/``use_framewise_decoding`` since it changes outputs.

    Ladder (activation peak per mode, measured at 512x768x97f):
      dense       ~200 B/px — fastest, one head+tail program
      stream tail ~max(head 62, tail/n) B/px — zero recompute, same cost
      ups-split   ~43 B/px + streamed ups+tail — 13B-resident mode
      fullstream  O(chunk) at every stage — unbounded clip length
    """
    cl = _use_channels_last(channels_last)
    b, _, t, h, w = z_shape
    px = (b * t * cfg.temporal_compression_ratio
          * h * cfg.spatial_compression_ratio
          * w * cfg.spatial_compression_ratio)
    if free_bytes is None:
        free_bytes = _device_free_bytes()
    if free_bytes is None or not cl or cfg.decoder_causal or t < 4:
        # no memory pressure signal, oracle layout, causal padding, or too
        # few latent frames to stream: dense (streaming needs the first
        # chunk to exceed the conv-pipeline fill).  NOTE the axon tunnel
        # plugin reports no memory_stats() — there the policy always lands
        # here; pass free_bytes= (or explicit chunk kwargs) when models are
        # resident.  Measured: dense 512x768x257f decode fits an otherwise
        # empty v5e chip (benches/bench_long.py).
        return {}
    budget = 0.85 * free_bytes  # leave headroom for the video output
    if _DENSE_PEAK_B_PER_PX * px <= budget:
        return {}
    if _HEAD_PEAK_B_PER_PX * px <= budget:
        # tail chunks are free (zero recompute): pick n so one tail chunk
        # fits comfortably under the head-bound peak
        n = max(2, math.ceil(_DENSE_PEAK_B_PER_PX * px / budget))
        return {"tail_stream_chunks": min(n, max(2, t // 2))}
    if _UPS_PEAK_B_PER_PX * px <= budget:
        n = max(4, math.ceil(_DENSE_PEAK_B_PER_PX * px / budget))
        return {"tail_stream_chunks": min(n, max(2, t // 2)),
                "tail_stream_from_ups": True}
    # last resort: stream every stage; chunk count bounded by the head
    # stream's pipeline-fill requirement (checked by the runner)
    return {"full_stream_chunks": max(2, min(t // 4, 8))}


def decode(
    params,
    cfg: LtxVaeConfig,
    z,
    temb=None,
    *,
    tiling: Optional[TilingConfig] = None,
    use_tiling: bool = True,
    use_framewise_decoding: bool = True,
    use_slicing: bool = False,
    decode_fn=None,
    tail_stream_chunks: int = 0,
    tail_stream_from_ups: bool = False,
    full_stream_chunks: int = 0,
    auto_mode: bool = False,
):
    """Facade decode with the reference's dispatch order (vae.rs:2037-2066):
    batch slicing (vae.rs:2109-2121), then temporal tiling if T exceeds the
    latent frame tile, else spatial tiling if H/W exceed the latent tile,
    else direct.

    Mode selection is centralized in :func:`select_decode_mode`: pass
    ``auto_mode=True`` (and no explicit chunk kwargs) to let the policy
    pick an exact mode from the latent shape and free HBM.  Explicit
    ``tail_stream_chunks``/``tail_stream_from_ups``/``full_stream_chunks``
    always win."""
    tiling = tiling or TilingConfig()
    if (auto_mode and decode_fn is None and not tail_stream_chunks
            and not full_stream_chunks):
        picked = select_decode_mode(cfg, z.shape)
        tail_stream_chunks = picked.get("tail_stream_chunks", 0)
        tail_stream_from_ups = picked.get("tail_stream_from_ups", False)
        full_stream_chunks = picked.get("full_stream_chunks", 0)
    if decode_fn is None:
        # jit the default decoder: eagerly-dispatched decoder ops cost
        # ~0.7 s of per-op tunnel dispatches (and lose fusion) at 97f scale
        cl = _use_channels_last()
        if full_stream_chunks > 1:
            if not cl:
                raise ValueError(
                    "full_stream_chunks requires the channels-last decoder"
                )
            jitted = _jitted_decoder_fullstream(cfg, full_stream_chunks)
        elif tail_stream_chunks > 1:
            if not cl:
                raise ValueError(
                    "tail_stream_chunks requires the channels-last decoder"
                )
            jitted = (
                _jitted_decoder_stream_ups(cfg, tail_stream_chunks)
                if tail_stream_from_ups
                else _jitted_decoder_stream(cfg, tail_stream_chunks)
            )
        else:
            jitted = _jitted_decoder(cfg, cl)
        decode_fn = lambda zz, tt: jitted(params["decoder"], zz, tt)  # noqa: E731
    if use_slicing and z.shape[0] > 1:
        outs = []
        for i in range(z.shape[0]):
            ti = None if temb is None else temb[i : i + 1]
            outs.append(
                decode(
                    params, cfg, z[i : i + 1], ti, tiling=tiling,
                    use_tiling=use_tiling,
                    use_framewise_decoding=use_framewise_decoding,
                    use_slicing=False, decode_fn=decode_fn,
                )
            )
        return jnp.concatenate(outs, axis=0)
    _, _, t, h, w = z.shape
    sc = cfg.spatial_compression_ratio
    tc = cfg.temporal_compression_ratio
    if use_framewise_decoding and t > tiling.tile_sample_min_num_frames // tc:
        return temporal_tiled_decode(params, cfg, z, temb, tiling, decode_fn)
    if use_tiling and (
        w > tiling.tile_sample_min_width // sc or h > tiling.tile_sample_min_height // sc
    ):
        return tiled_decode(params, cfg, z, temb, tiling, decode_fn)
    fn = decode_fn or (lambda zz, tt: decoder_forward(params["decoder"], cfg, zz, tt))
    return fn(z, temb)


def encode(
    params,
    cfg: LtxVaeConfig,
    x,
    *,
    tiling: Optional[TilingConfig] = None,
    use_tiling: bool = True,
    use_framewise_encoding: bool = False,
    encode_fn=None,
):
    tiling = tiling or TilingConfig()
    if encode_fn is None:
        jitted = _jitted_encoder(cfg)
        encode_fn = lambda xx: jitted(params["encoder"], xx)  # noqa: E731
    _, _, t, h, w = x.shape
    if use_framewise_encoding and t > tiling.tile_sample_min_num_frames:
        return temporal_tiled_encode(params, cfg, x, tiling, encode_fn)
    if use_tiling and (
        h > tiling.tile_sample_min_height or w > tiling.tile_sample_min_width
    ):
        return tiled_encode(params, cfg, x, tiling, encode_fn)
    return encode_fn(x)


def forward(
    params,
    cfg: LtxVaeConfig,
    sample,
    temb=None,
    sample_posterior: bool = False,
    key=None,
    **decode_kwargs,
):
    """Encode → (sample|mode) → decode roundtrip facade (vae.rs:2139-2154)."""
    moments = encode(params, cfg, sample, **{
        k: v for k, v in decode_kwargs.items()
        if k in ("tiling", "use_tiling", "use_framewise_encoding", "encode_fn")
    })
    if sample_posterior:
        if key is None:
            raise ValueError("sample_posterior=True requires a PRNG key")
        z = gaussian_sample(moments, key)
    else:
        z, _ = gaussian_split(moments)
    dec_kwargs = {
        k: v for k, v in decode_kwargs.items()
        if k in ("tiling", "use_tiling", "use_framewise_decoding",
                 "use_slicing", "decode_fn")
    }
    return decode(params, cfg, z, temb, **dec_kwargs)
