"""Random/zeros VAE parameter builders (shape contract + benches).

The structure mirrors vae_params_from_state_dict output; real checkpoints
come through the loader.  Equivalent of the reference's VarBuilder::zeros
models used in benches and shape tests (benches/ltx_video_benchmarks.rs:139).

Parameters are described as a spec tree and materialized by
utils/init_spec.materialize — ONE jitted on-device builder on TPU (one
remote compile, cached), host-side NumPy f32 on CPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.init_spec import const, materialize, normal, ones, zeros
from .vae import LtxVaeConfig, _DOWNSAMPLE_STRIDES


def _conv_p(c_in, c_out, k, std=0.05):
    kk = (k, k, k) if isinstance(k, int) else k
    return {"weight": normal((c_out, c_in, *kk), std), "bias": zeros((c_out,))}


def _lin_p(d_in, d_out, std=0.02):
    return {"weight": normal((d_in, d_out), std), "bias": zeros((d_out,))}


def _te_p(dim):
    return {"linear_1": _lin_p(256, dim), "linear_2": _lin_p(dim, dim)}


def _resnet_p(c_in, c_out, timestep_conditioning=False):
    p = {
        "conv1": _conv_p(c_in, c_out, 3),
        "conv2": _conv_p(c_out, c_out, 3),
    }
    if c_in != c_out:
        p["conv_shortcut"] = _conv_p(c_in, c_out, 1)
    if timestep_conditioning:
        p["scale_shift_table"] = normal((4, c_in), 1.0 / (c_in**0.5))
    return p


def _vae_spec(cfg: LtxVaeConfig):
    # encoder
    boc = cfg.block_out_channels
    p_in = cfg.in_channels * cfg.patch_size**2 * cfg.patch_size_t
    down_blocks = []
    for i in range(len(boc) - 1):
        blk = {
            "resnets": [
                _resnet_p(boc[i], boc[i]) for _ in range(cfg.layers_per_block[i])
            ]
        }
        if cfg.spatiotemporal_scaling[i]:
            stride = _DOWNSAMPLE_STRIDES[cfg.downsample_types[i].lower()]
            sp = stride[0] * stride[1] * stride[2]
            blk["downsamplers"] = [{"conv": _conv_p(boc[i], boc[i + 1] // sp, 3)}]
        down_blocks.append(blk)
    encoder = {
        "conv_in": _conv_p(p_in, boc[0], 3),
        "down_blocks": down_blocks,
        "mid_block": {
            "resnets": [
                _resnet_p(boc[-1], boc[-1])
                for _ in range(max(cfg.layers_per_block[-1] - 1, 0))
            ]
        },
        "conv_out": _conv_p(boc[-1], cfg.latent_channels + 1, 3),
    }

    # decoder
    dboc = list(cfg.decoder_block_out_channels)[::-1]
    lpb = list(cfg.decoder_layers_per_block)[::-1]
    sts = list(cfg.decoder_spatiotemporal_scaling)[::-1]
    upf = list(cfg.decoder_upsample_factor)[::-1]
    tc = cfg.timestep_conditioning

    mid = {"resnets": [_resnet_p(dboc[0], dboc[0], tc) for _ in range(lpb[0])]}
    if tc:
        mid["time_embedder"] = _te_p(dboc[0] * 4)

    up_blocks = []
    final_ch = dboc[0]
    for i in range(len(dboc)):
        out_ch = dboc[i] // upf[i]
        stride = (2, 2, 2) if sts[i] else (1, 2, 2)
        sp = stride[0] * stride[1] * stride[2]
        blk = {
            "upsamplers": [{"conv": _conv_p(out_ch * upf[i], out_ch * sp, 3)}],
            "resnets": [
                _resnet_p(out_ch, out_ch, tc) for _ in range(lpb[i + 1])
            ],
        }
        if tc:
            blk["time_embedder"] = _te_p(out_ch * 4)
        up_blocks.append(blk)
        final_ch = out_ch

    decoder = {
        "conv_in": _conv_p(cfg.latent_channels, dboc[0], 3),
        "mid_block": mid,
        "up_blocks": up_blocks,
        "conv_out": _conv_p(final_ch, cfg.out_channels * cfg.patch_size**2, 3),
    }
    if tc:
        decoder["time_embedder"] = _te_p(final_ch * 2)
        decoder["scale_shift_table"] = normal((2, final_ch), 1.0 / (final_ch**0.5))
        decoder["timestep_scale_multiplier"] = const(1000.0)

    return {
        "encoder": encoder,
        "decoder": decoder,
        "latents_mean": zeros((cfg.latent_channels,)),
        "latents_std": ones((cfg.latent_channels,)),
    }


def init_vae_params(key, cfg: LtxVaeConfig, dtype=jnp.bfloat16):
    return materialize(
        key, _vae_spec(cfg), dtype,
        f32_kinds=("const",),
        f32_paths=("latents_mean", "latents_std"),
    )
