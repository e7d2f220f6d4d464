"""Random/zeros VAE parameter builders (shape contract + benches).

The structure mirrors vae_params_from_state_dict output; real checkpoints
come through the loader.  Equivalent of the reference's VarBuilder::zeros
models used in benches and shape tests (benches/ltx_video_benchmarks.rs:139).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vae import LtxVaeConfig, _DOWNSAMPLE_STRIDES


def _conv_p(rng, c_in, c_out, k, dtype, std=0.05):
    kk = (k, k, k) if isinstance(k, int) else k
    # host-side NumPy init: per-shape jax.random calls would each compile
    return {
        "weight": jnp.asarray(
            rng.normal(size=(c_out, c_in, *kk)).astype(np.float32) * std, dtype
        ),
        "bias": jnp.zeros((c_out,), dtype),
    }


def _lin_p(rng, d_in, d_out, dtype, std=0.02):
    return {
        "weight": jnp.asarray(
            rng.normal(size=(d_in, d_out)).astype(np.float32) * std, dtype
        ),
        "bias": jnp.zeros((d_out,), dtype),
    }


def _te_p(rng, dim, dtype):
    return {
        "linear_1": _lin_p(rng, 256, dim, dtype),
        "linear_2": _lin_p(rng, dim, dim, dtype),
    }


def _resnet_p(rng, c_in, c_out, dtype, timestep_conditioning=False):
    p = {
        "conv1": _conv_p(rng, c_in, c_out, 3, dtype),
        "conv2": _conv_p(rng, c_out, c_out, 3, dtype),
    }
    if c_in != c_out:
        p["conv_shortcut"] = _conv_p(rng, c_in, c_out, 1, dtype)
    if timestep_conditioning:
        p["scale_shift_table"] = jnp.asarray(
            rng.normal(size=(4, c_in)).astype(np.float32) / (c_in**0.5), dtype
        )
    return p


def init_vae_params(key, cfg: LtxVaeConfig, dtype=jnp.bfloat16):
    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    keys = np.random.default_rng(seed)

    # encoder
    boc = cfg.block_out_channels
    p_in = cfg.in_channels * cfg.patch_size**2 * cfg.patch_size_t
    down_blocks = []
    for i in range(len(boc) - 1):
        blk = {
            "resnets": [
                _resnet_p(keys, boc[i], boc[i], dtype)
                for _ in range(cfg.layers_per_block[i])
            ]
        }
        if cfg.spatiotemporal_scaling[i]:
            stride = _DOWNSAMPLE_STRIDES[cfg.downsample_types[i].lower()]
            sp = stride[0] * stride[1] * stride[2]
            blk["downsamplers"] = [
                {"conv": _conv_p(keys, boc[i], boc[i + 1] // sp, 3, dtype)}
            ]
        down_blocks.append(blk)
    encoder = {
        "conv_in": _conv_p(keys, p_in, boc[0], 3, dtype),
        "down_blocks": down_blocks,
        "mid_block": {
            "resnets": [
                _resnet_p(keys, boc[-1], boc[-1], dtype)
                for _ in range(max(cfg.layers_per_block[-1] - 1, 0))
            ]
        },
        "conv_out": _conv_p(keys, boc[-1], cfg.latent_channels + 1, 3, dtype),
    }

    # decoder
    dboc = list(cfg.decoder_block_out_channels)[::-1]
    lpb = list(cfg.decoder_layers_per_block)[::-1]
    sts = list(cfg.decoder_spatiotemporal_scaling)[::-1]
    upf = list(cfg.decoder_upsample_factor)[::-1]
    tc = cfg.timestep_conditioning

    mid = {
        "resnets": [
            _resnet_p(keys, dboc[0], dboc[0], dtype, tc) for _ in range(lpb[0])
        ]
    }
    if tc:
        mid["time_embedder"] = _te_p(keys, dboc[0] * 4, dtype)

    up_blocks = []
    final_ch = dboc[0]
    for i in range(len(dboc)):
        out_ch = dboc[i] // upf[i]
        stride = (2, 2, 2) if sts[i] else (1, 2, 2)
        sp = stride[0] * stride[1] * stride[2]
        blk = {
            "upsamplers": [
                {"conv": _conv_p(keys, out_ch * upf[i], out_ch * sp, 3, dtype)}
            ],
            "resnets": [
                _resnet_p(keys, out_ch, out_ch, dtype, tc) for _ in range(lpb[i + 1])
            ],
        }
        if tc:
            blk["time_embedder"] = _te_p(keys, out_ch * 4, dtype)
        up_blocks.append(blk)
        final_ch = out_ch

    decoder = {
        "conv_in": _conv_p(keys, cfg.latent_channels, dboc[0], 3, dtype),
        "mid_block": mid,
        "up_blocks": up_blocks,
        "conv_out": _conv_p(
            keys, final_ch, cfg.out_channels * cfg.patch_size**2, 3, dtype
        ),
    }
    if tc:
        decoder["time_embedder"] = _te_p(keys, final_ch * 2, dtype)
        decoder["scale_shift_table"] = jnp.asarray(
            keys.normal(size=(2, final_ch)).astype(np.float32) / (final_ch**0.5),
            dtype,
        )
        decoder["timestep_scale_multiplier"] = jnp.asarray(1000.0, jnp.float32)

    return {
        "encoder": encoder,
        "decoder": decoder,
        "latents_mean": jnp.zeros((cfg.latent_channels,), jnp.float32),
        "latents_std": jnp.ones((cfg.latent_channels,), jnp.float32),
    }
