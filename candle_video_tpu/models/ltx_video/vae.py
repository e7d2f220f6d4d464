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
# primitives
# ---------------------------------------------------------------------------


def _rms_norm_cf(x, eps: float = 1e-8, weight=None):
    """RMSNorm over the channel axis of [B,C,T,H,W] (channels-first),
    f32 internals (vae.rs:148-153 permute → rmsnorm → permute, fused here)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=1, keepdims=True)
    y = (xf / jnp.sqrt(ms + jnp.float32(eps))).astype(x.dtype)
    if weight is not None:
        y = y * weight.astype(x.dtype)[None, :, None, None, None]
    return y


def _layer_norm_cf(x, eps: float, weight=None, bias=None):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = (xc / jnp.sqrt(var + jnp.float32(eps))).astype(x.dtype)
    if weight is not None:
        y = y * weight.astype(x.dtype)[None, :, None, None, None]
    if bias is not None:
        y = y + bias.astype(x.dtype)[None, :, None, None, None]
    return y


def _conv(p, x, stride=(1, 1, 1), causal=True):
    return causal_conv3d(
        x, p["weight"], p.get("bias"), stride=stride, causal=causal
    )


def _time_embedder(p, temb, dtype):
    """CombinedTimestepEmbedder: sinusoid(256) → MLP (vae.rs:200-265)."""
    proj = sinusoidal_timestep_embedding(temb, 256).astype(dtype)
    h = proj @ p["linear_1"]["weight"] + p["linear_1"]["bias"]
    h = silu(h)
    return h @ p["linear_2"]["weight"] + p["linear_2"]["bias"]


def _resnet_block(p, cfg, x, temb5=None, causal=True, noise_key=None):
    """LtxVideoResnetBlock3d (vae.rs:584-822).

    ``temb5``: [B, 4C, 1, 1, 1] block-projected timestep embedding or None.
    """
    h = x
    h = _rms_norm_cf(h, 1e-8)

    if p.get("scale_shift_table") is not None and temb5 is not None:
        tbl = p["scale_shift_table"]  # [4, C]
        b = temb5.shape[0]
        c = tbl.shape[1]
        t = temb5.reshape(b, 4, c, 1, 1, 1) + tbl[None, :, :, None, None, None]
        shift1, scale1, shift2, scale2 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    else:
        shift1 = scale1 = shift2 = scale2 = None

    if shift1 is not None:
        h = h * (1.0 + scale1.astype(h.dtype)) + shift1.astype(h.dtype)
    h = silu(h)
    h = _conv(p["conv1"], h, causal=causal)

    if p.get("per_channel_scale1") is not None and noise_key is not None:
        # spatial (H, W) noise scaled per channel (vae.rs:741-753)
        noise_key, sub = jax.random.split(noise_key)
        noise = jax.random.normal(sub, h.shape[-2:], h.dtype)[None, None, None]
        h = h + noise * p["per_channel_scale1"].astype(h.dtype).reshape(1, -1, 1, 1, 1)

    h = _rms_norm_cf(h, 1e-8)
    if shift2 is not None:
        h = h * (1.0 + scale2.astype(h.dtype)) + shift2.astype(h.dtype)
    h = silu(h)
    h = _conv(p["conv2"], h, causal=causal)

    if p.get("per_channel_scale2") is not None and noise_key is not None:
        noise_key, sub = jax.random.split(noise_key)
        sp = h.shape[-2:]
        noise = jax.random.normal(sub, sp, h.dtype)[None, None, None]
        h = h + noise * p["per_channel_scale2"].astype(h.dtype).reshape(1, -1, 1, 1, 1)

    shortcut = x
    if p.get("norm3") is not None:
        shortcut = _layer_norm_cf(
            shortcut, cfg.resnet_eps, p["norm3"].get("weight"), p["norm3"].get("bias")
        )
    elif p.get("conv_shortcut") is not None:
        # affine-less norm3 still applies whenever the shortcut changes width
        shortcut = _layer_norm_cf(shortcut, cfg.resnet_eps)
    if p.get("conv_shortcut") is not None:
        shortcut = _conv(p["conv_shortcut"], shortcut, causal=causal)
    return h + shortcut


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


def _depth_to_space(y, st, sh, sw):
    """reference upsampler shuffle (vae.rs:1106-1158)."""
    b, c, t, hgt, wid = y.shape
    c_out = c // (st * sh * sw)
    y = y.reshape(b, c_out, st, sh, sw, t, hgt, wid)
    y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # [B,C',T,st,H,sh,W,sw]
    return y.reshape(b, c_out, t * st, hgt * sh, wid * sw)


def _upsampler(p, x, stride, residual: bool, channel_repeats: int, causal=True):
    """LtxVideoUpsampler3d (vae.rs:1037-1170)."""
    st, sh, sw = stride
    res = None
    if residual:
        res = _depth_to_space(x, st, sh, sw)
        if channel_repeats > 1:
            res = jnp.tile(res, (1, channel_repeats, 1, 1, 1))
        res = res[:, :, st - 1 :]

    h = _conv(p["conv"], x, causal=causal)
    h = _depth_to_space(h, st, sh, sw)
    h = h[:, :, st - 1 :]
    if res is not None:
        h = h + res
    return h


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


def _unpatchify(x, p: int, pt: int):
    """inverse (vae.rs:1626-1654)."""
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

    h = _rms_norm_cf(h, 1e-8, params.get("norm_out", {}).get("weight") if params.get("norm_out") else None)
    h = silu(h)
    h = _conv(params["conv_out"], h, causal=causal)

    # last-channel replication: conv_out emits latent+1 channels; the final
    # channel is the uniform logvar, replicated to full width (vae.rs:1463-1467)
    ch = h.shape[1]
    last = h[:, ch - 1 : ch]
    rep = jnp.tile(last, (1, ch - 2, 1, 1, 1))
    return jnp.concatenate([h, rep], axis=1)


def _temb_scaled(params, temb):
    if temb is None:
        return None
    t = temb.reshape(-1).astype(jnp.float32)
    if params.get("timestep_scale_multiplier") is not None:
        t = t * params["timestep_scale_multiplier"].astype(jnp.float32)
    return t


def _block_temb(block_params, temb_scaled, width, dtype):
    if temb_scaled is None or block_params.get("time_embedder") is None:
        return None
    e = _time_embedder(block_params["time_embedder"], temb_scaled, dtype)
    return e.reshape(e.shape[0], width * 4, 1, 1, 1)


def _decoder_geometry(cfg: LtxVaeConfig):
    boc = list(cfg.decoder_block_out_channels)[::-1]
    sts = list(cfg.decoder_spatiotemporal_scaling)[::-1]
    upr = list(cfg.decoder_upsample_residual)[::-1]
    upf = list(cfg.decoder_upsample_factor)[::-1]
    return boc, sts, upr, upf


def decoder_head_forward(params, cfg: LtxVaeConfig, z, temb=None,
                         noise_key=None):
    """conv_in → mid → up blocks, STOPPING before the last up-block's
    resnets (vae.rs:1488-1619 minus the final resnet stack).  The split
    point is right after the last upsampler so the tail is a pure
    temporal-conv pipeline that can run in exact halo chunks."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    z = z.astype(dtype)

    h = _conv(params["conv_in"], z, causal=causal)
    temb_scaled = _temb_scaled(params, temb)

    mid = params["mid_block"]
    mt = _block_temb(mid, temb_scaled, h.shape[1], dtype)
    for rp in mid["resnets"]:
        h = _resnet_block(rp, cfg, h, mt, causal=causal, noise_key=noise_key)

    boc, sts, upr, upf = _decoder_geometry(cfg)
    n_up = len(params["up_blocks"])
    for i, bp in enumerate(params["up_blocks"]):
        out_ch = boc[i] // upf[i]
        ut = _block_temb(bp, temb_scaled, out_ch, dtype)
        stride = (2, 2, 2) if sts[i] else (1, 2, 2)
        in_ch = out_ch * upf[i]
        channel_repeats = (out_ch * stride[0] * stride[1] * stride[2]) // in_ch
        h = _upsampler(
            bp["upsamplers"][0], h, stride, upr[i], channel_repeats, causal=causal
        )
        if i == n_up - 1:
            break  # the last block's resnets belong to the tail
        for rp in bp["resnets"]:
            h = _resnet_block(rp, cfg, h, ut, causal=causal, noise_key=noise_key)
    return h


def decoder_tail_forward(params, cfg: LtxVaeConfig, h, temb=None,
                         noise_key=None):
    """Last up-block resnets + output norm/modulation + conv_out +
    unpatchify (vae.rs:1619-1727).  Pure in T except kt<=3 convs, so a
    halo of one frame per conv makes chunked evaluation exact."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    temb_scaled = _temb_scaled(params, temb)

    boc, _, _, upf = _decoder_geometry(cfg)
    i_last = len(params["up_blocks"]) - 1
    bp = params["up_blocks"][i_last]
    ut = _block_temb(bp, temb_scaled, boc[i_last] // upf[i_last], dtype)
    for rp in bp["resnets"]:
        h = _resnet_block(rp, cfg, h, ut, causal=causal, noise_key=noise_key)

    h = _rms_norm_cf(h, 1e-8)
    if (
        temb_scaled is not None
        and params.get("time_embedder") is not None
        and params.get("scale_shift_table") is not None
    ):
        e = _time_embedder(params["time_embedder"], temb_scaled, dtype)  # [B, 2C]
        c = params["scale_shift_table"].shape[1]
        e = e.reshape(-1, 2, c) + params["scale_shift_table"][None].astype(dtype)
        shift = e[:, 0][:, :, None, None, None]
        scale = e[:, 1][:, :, None, None, None]
        h = h * (1.0 + scale) + shift

    h = silu(h)
    h = _conv(params["conv_out"], h, causal=causal)
    return _unpatchify(h, cfg.patch_size, cfg.patch_size_t)


# ---------------------------------------------------------------------------
# channels-last decoder (production path)
#
# Same math as the NCDHW decoder above (which stays as the parity oracle),
# but every tensor is [B, T, H, W, C]:
# - convs use causal_conv3d_cl (kt NHWC conv2d taps; 158-165 TF/s vs 90-117
#   for XLA's NCDHW conv3d at the decoder's hot stages — see
#   scripts/profile_conv_variants.py),
# - channel norms reduce over the LANE axis instead of a strided middle axis.
# Interfaces stay NCDHW: z is transposed on entry, video on exit.
# ---------------------------------------------------------------------------


def _rms_norm_cl(x, eps: float = 1e-8, weight=None):
    """RMSNorm over the trailing channel axis of [B,T,H,W,C], f32 internals
    (vae.rs:148-153)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf / jnp.sqrt(ms + jnp.float32(eps))).astype(x.dtype)
    if weight is not None:
        y = y * weight.astype(x.dtype)
    return y


def _layer_norm_cl(x, eps: float, weight=None, bias=None):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc / jnp.sqrt(var + jnp.float32(eps))).astype(x.dtype)
    if weight is not None:
        y = y * weight.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _conv_cl(p, x, stride=(1, 1, 1), causal=True):
    return causal_conv3d_cl(
        x, p["weight"], p.get("bias"), stride=stride, causal=causal
    )


def _resnet_block_cl(p, cfg, x, temb2=None, causal=True, noise_key=None):
    """LtxVideoResnetBlock3d (vae.rs:584-822), channels-last.

    ``temb2``: [B, 4C] block-projected timestep embedding or None.
    """
    h = _rms_norm_cl(x, 1e-8)

    if p.get("scale_shift_table") is not None and temb2 is not None:
        tbl = p["scale_shift_table"]  # [4, C]
        b = temb2.shape[0]
        c = tbl.shape[1]
        t = temb2.reshape(b, 4, c) + tbl[None].astype(temb2.dtype)
        t = t[:, :, None, None, None, :]  # [B,4,1,1,1,C]
        shift1, scale1, shift2, scale2 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    else:
        shift1 = scale1 = shift2 = scale2 = None

    if shift1 is not None:
        h = h * (1.0 + scale1.astype(h.dtype)) + shift1.astype(h.dtype)
    h = silu(h)
    h = _conv_cl(p["conv1"], h, causal=causal)

    if p.get("per_channel_scale1") is not None and noise_key is not None:
        noise_key, sub = jax.random.split(noise_key)
        noise = jax.random.normal(sub, h.shape[2:4], h.dtype)
        h = h + noise[None, None, :, :, None] * p["per_channel_scale1"].astype(
            h.dtype
        ).reshape(1, 1, 1, 1, -1)

    h = _rms_norm_cl(h, 1e-8)
    if shift2 is not None:
        h = h * (1.0 + scale2.astype(h.dtype)) + shift2.astype(h.dtype)
    h = silu(h)
    h = _conv_cl(p["conv2"], h, causal=causal)

    if p.get("per_channel_scale2") is not None and noise_key is not None:
        noise_key, sub = jax.random.split(noise_key)
        noise = jax.random.normal(sub, h.shape[2:4], h.dtype)
        h = h + noise[None, None, :, :, None] * p["per_channel_scale2"].astype(
            h.dtype
        ).reshape(1, 1, 1, 1, -1)

    shortcut = x
    if p.get("norm3") is not None:
        shortcut = _layer_norm_cl(
            shortcut, cfg.resnet_eps, p["norm3"].get("weight"), p["norm3"].get("bias")
        )
    elif p.get("conv_shortcut") is not None:
        shortcut = _layer_norm_cl(shortcut, cfg.resnet_eps)
    if p.get("conv_shortcut") is not None:
        shortcut = _conv_cl(p["conv_shortcut"], shortcut, causal=causal)
    return h + shortcut


def _depth_to_space_cl(y, st, sh, sw):
    """Channel order matches _depth_to_space: c = c_out-major, then
    (st, sh, sw) (vae.rs:1106-1158)."""
    b, t, hgt, wid, c = y.shape
    c_out = c // (st * sh * sw)
    y = y.reshape(b, t, hgt, wid, c_out, st, sh, sw)
    y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # [B,T,st,H,sh,W,sw,C']
    return y.reshape(b, t * st, hgt * sh, wid * sw, c_out)


def _upsampler_cl(p, x, stride, residual: bool, channel_repeats: int,
                  causal=True):
    st, sh, sw = stride
    res = None
    if residual:
        res = _depth_to_space_cl(x, st, sh, sw)
        if channel_repeats > 1:
            res = jnp.tile(res, (1, 1, 1, 1, channel_repeats))
        res = res[:, st - 1 :]

    h = _conv_cl(p["conv"], x, causal=causal)
    h = _depth_to_space_cl(h, st, sh, sw)
    h = h[:, st - 1 :]
    if res is not None:
        h = h + res
    return h


def _unpatchify_cl(x, p: int, pt: int):
    """[B,F,H,W,C] with C ordered [c, pt, p_w, p_h] -> [B,F*pt,H*p,W*p,c]
    (vae.rs:1626-1654)."""
    b, f, h, w, c = x.shape
    out_c = c // (pt * p * p)
    x = x.reshape(b, f, h, w, out_c, pt, p, p)  # [..., c, pt, pW, pH]
    x = x.transpose(0, 1, 5, 2, 7, 3, 6, 4)  # [B,F,pt,H,pH,W,pW,c]
    return x.reshape(b, f * pt, h * p, w * p, out_c)


def _block_temb_flat(block_params, temb_scaled, dtype):
    if temb_scaled is None or block_params.get("time_embedder") is None:
        return None
    return _time_embedder(block_params["time_embedder"], temb_scaled, dtype)


def decoder_head_forward_cl(params, cfg: LtxVaeConfig, z, temb=None,
                            noise_key=None):
    """Channels-last twin of decoder_head_forward: z [B,latent,F',H',W']
    (NCDHW, transposed on entry) -> h [B,T,H,W,C]."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    h = jnp.transpose(z.astype(dtype), (0, 2, 3, 4, 1))

    h = _conv_cl(params["conv_in"], h, causal=causal)
    temb_scaled = _temb_scaled(params, temb)

    mid = params["mid_block"]
    mt = _block_temb_flat(mid, temb_scaled, dtype)
    for rp in mid["resnets"]:
        h = _resnet_block_cl(rp, cfg, h, mt, causal=causal, noise_key=noise_key)

    boc, sts, upr, upf = _decoder_geometry(cfg)
    n_up = len(params["up_blocks"])
    for i, bp in enumerate(params["up_blocks"]):
        out_ch = boc[i] // upf[i]
        ut = _block_temb_flat(bp, temb_scaled, dtype)
        stride = (2, 2, 2) if sts[i] else (1, 2, 2)
        in_ch = out_ch * upf[i]
        channel_repeats = (out_ch * stride[0] * stride[1] * stride[2]) // in_ch
        h = _upsampler_cl(
            bp["upsamplers"][0], h, stride, upr[i], channel_repeats, causal=causal
        )
        if i == n_up - 1:
            break  # the last block's resnets belong to the tail
        for rp in bp["resnets"]:
            h = _resnet_block_cl(rp, cfg, h, ut, causal=causal,
                                 noise_key=noise_key)
    return h


def decoder_tail_forward_cl(params, cfg: LtxVaeConfig, h, temb=None,
                            noise_key=None):
    """Channels-last twin of decoder_tail_forward: h [B,T,H,W,C] ->
    video [B,3,F,H,W] (NCDHW on exit)."""
    causal = cfg.decoder_causal
    dtype = params["conv_in"]["weight"].dtype
    temb_scaled = _temb_scaled(params, temb)

    i_last = len(params["up_blocks"]) - 1
    bp = params["up_blocks"][i_last]
    ut = _block_temb_flat(bp, temb_scaled, dtype)
    for rp in bp["resnets"]:
        h = _resnet_block_cl(rp, cfg, h, ut, causal=causal, noise_key=noise_key)

    h = _rms_norm_cl(h, 1e-8)
    if (
        temb_scaled is not None
        and params.get("time_embedder") is not None
        and params.get("scale_shift_table") is not None
    ):
        e = _time_embedder(params["time_embedder"], temb_scaled, dtype)  # [B,2C]
        c = params["scale_shift_table"].shape[1]
        e = e.reshape(-1, 2, c) + params["scale_shift_table"][None].astype(dtype)
        shift = e[:, 0][:, None, None, None, :]
        scale = e[:, 1][:, None, None, None, :]
        h = h * (1.0 + scale) + shift

    h = silu(h)
    h = _conv_cl(params["conv_out"], h, causal=causal)
    h = _unpatchify_cl(h, cfg.patch_size, cfg.patch_size_t)
    return jnp.transpose(h, (0, 4, 1, 2, 3))


def tail_chunk_bounds(params, cfg: LtxVaeConfig, t_total: int,
                      tail_t_chunks: int):
    """Exact halo accounting for the chunked tail: each tail resnet has 2
    temporal kt=3 convs (conv_shortcut is 1x1x1), plus conv_out — the
    receptive field grows 1 frame per conv on each side (2x on the left
    for causal tails).  Returns (start, end, lo, hi) latent-frame spans."""
    n_convs = 2 * len(params["up_blocks"][-1]["resnets"]) + 1
    halo = n_convs if not cfg.decoder_causal else 2 * n_convs
    per = max(-(-t_total // tail_t_chunks), 1)
    spans = []
    start = 0
    while start < t_total:
        end = min(start + per, t_total)
        lo = max(0, start - halo)
        hi = min(t_total, end + halo)
        spans.append((start, end, lo, hi))
        start = end
    return spans


def _use_channels_last(channels_last=None) -> bool:
    if channels_last is not None:
        return channels_last
    return os.environ.get("CVT_DECODER_LAYOUT", "cl") != "ncdhw"


def decoder_forward(params, cfg: LtxVaeConfig, z, temb=None, noise_key=None,
                    tail_t_chunks: int = 1, channels_last=None):
    """LtxVideoDecoder3d (vae.rs:1488-1727). z [B,latent,F,H,W] -> video
    [B,3,F*8,H*32,W*32] in [-1,1]; ``temb`` [B] decode timesteps or None.

    ``tail_t_chunks > 1``: run the LAST up-block's resnets + the output
    head over that many temporal chunks with exact conv halos — identical
    math (every temporal op in the tail is a kt<=3 conv or pointwise, so an
    11-frame halo covers the receptive field of the 11 temporal convs), at
    ~1/n of the tail's activation peak.  The full-frame decode peak is
    dominated by this tail (measured 6.5 of 7.1 GB at 512x768x97f); with
    n=2 the whole decode fits alongside a resident 5 GiB text encoder.
    Noise injection stays consistent: the per-conv noise is [H, W] spatial
    (shared across T), and each chunk replays the same key sequence.

    ``channels_last`` (default: on, opt out via CVT_DECODER_LAYOUT=ncdhw):
    run the channels-last decoder twins — the production path on TPU.

    NOTE: when this whole function runs under ONE jit, XLA may schedule
    the chunks' buffers to overlap and the peak-memory win evaporates —
    the facade (``decode``) therefore jits head and tail separately.
    """
    cl = _use_channels_last(channels_last)
    head = decoder_head_forward_cl if cl else decoder_head_forward
    tail = decoder_tail_forward_cl if cl else decoder_tail_forward
    t_axis = 1 if cl else 2

    h = head(params, cfg, z, temb, noise_key)
    if tail_t_chunks <= 1:
        return tail(params, cfg, h, temb, noise_key)
    pt = cfg.patch_size_t
    outs = []
    for start, end, lo, hi in tail_chunk_bounds(
        params, cfg, h.shape[t_axis], tail_t_chunks
    ):
        piece = tail(
            params, cfg,
            h[:, :, lo:hi] if not cl else h[:, lo:hi],
            temb, noise_key,
        )
        # tail output has T * pt frames; crop the halo in output time
        outs.append(piece[:, :, (start - lo) * pt : (end - lo) * pt])
    return jnp.concatenate(outs, axis=2)


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
def _jitted_decoder_chunked(cfg: LtxVaeConfig, tail_t_chunks: int,
                            channels_last: bool):
    """Halo-chunked decode with head and tail as SEPARATE jits.

    One jit over the whole chunked decode lets XLA overlap the chunks'
    buffers and the ~2x activation-peak reduction evaporates (observed:
    RESOURCE_EXHAUSTED with a resident 5 GiB T5 where the per-chunk eager
    path fit).  Separate programs bound the peak to max(head, one tail
    chunk) while still avoiding per-op dispatch."""
    head_fn = decoder_head_forward_cl if channels_last else decoder_head_forward
    tail_fn = decoder_tail_forward_cl if channels_last else decoder_tail_forward
    t_axis = 1 if channels_last else 2
    head = jax.jit(lambda p, zz, tt: head_fn(p, cfg, zz, tt))
    tail = jax.jit(lambda p, hh, tt: tail_fn(p, cfg, hh, tt))

    def run(p, zz, tt):
        h = head(p, zz, tt)
        pt = cfg.patch_size_t
        outs = []
        for start, end, lo, hi in tail_chunk_bounds(
            p, cfg, h.shape[t_axis], tail_t_chunks
        ):
            piece = tail(p, h[:, :, lo:hi] if not channels_last else h[:, lo:hi], tt)
            outs.append(piece[:, :, (start - lo) * pt : (end - lo) * pt])
        return jnp.concatenate(outs, axis=2)

    return run


@functools.lru_cache(maxsize=8)
def _jitted_encoder(cfg: LtxVaeConfig):
    return jax.jit(lambda p, xx: encoder_forward(p, cfg, xx))


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
    tail_t_chunks: int = 1,
):
    """Facade decode with the reference's dispatch order (vae.rs:2037-2066):
    batch slicing (vae.rs:2109-2121), then temporal tiling if T exceeds the
    latent frame tile, else spatial tiling if H/W exceed the latent tile,
    else direct.

    ``tail_t_chunks``: exact halo-chunked decoder tail (decoder_forward) —
    cuts the decode activation peak ~2x at n=2 with identical outputs;
    the lever that lets a full 512x768x97f decode run UNTILED next to a
    resident 5 GiB text encoder."""
    tiling = tiling or TilingConfig()
    if decode_fn is None:
        # jit the default decoder: eagerly-dispatched decoder ops cost
        # ~0.7 s of per-op tunnel dispatches (and lose fusion) at 97f scale
        cl = _use_channels_last()
        if tail_t_chunks > 1:
            jitted = _jitted_decoder_chunked(cfg, tail_t_chunks, cl)
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
