"""AutoencoderKLTemporalDecoder (SVD): 2D encoder + temporal-aware decoder.

Parity target: src/models/svd/vae/{mod,encoder,decoder}.rs — standard SD
encoder (down blocks + single-head-attention mid block), temporal decoder
whose resblocks blend a spatial ResnetBlock2D with a 3x1x1 temporal conv
block (AlphaBlender), plus a final 3x1x1 ``time_conv_out``.

Note: the encoder downsample uses diffusers' asymmetric (0,1,0,1) padding;
the reference's dead code pads symmetrically (encoder.rs:90-103), which does
not match real checkpoints.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.activations import silu
from ...ops.norms import group_norm
from .configs import SvdVaeConfig
from .unet import _alpha_blend, _conv2d, _linear, _temporal_conv


def _resnet2d(p, x):
    h = group_norm(x, 32, p["norm1"]["weight"], p["norm1"]["bias"])
    h = _conv2d(p["conv1"], silu(h))
    h = group_norm(h, 32, p["norm2"]["weight"], p["norm2"]["bias"])
    h = _conv2d(p["conv2"], silu(h))
    res = x
    if "conv_shortcut" in p:
        res = _conv2d(p["conv_shortcut"], res, padding=0)
    return h + res


def _temporal_resnet(p, x, num_frames: int):
    h = group_norm(x, 32, p["norm1"]["weight"], p["norm1"]["bias"])
    h = _temporal_conv(p["conv1"], silu(h), num_frames)
    h = group_norm(h, 32, p["norm2"]["weight"], p["norm2"]["bias"])
    h = _temporal_conv(p["conv2"], silu(h), num_frames)
    return h + x


def _st_resnet(p, x, num_frames: int):
    hs = _resnet2d(p["spatial_res_block"], x)
    ht = _temporal_resnet(p["temporal_res_block"], hs, num_frames)
    return _alpha_blend(p["time_mixer"], hs, ht)


def _attention_block(p, x):
    """Single-head VAE attention (decoder.rs:403-452)."""
    b, c, h, w = x.shape
    residual = x
    y = group_norm(x, 32, p["group_norm"]["weight"], p["group_norm"]["bias"])
    y = y.reshape(b, c, h * w).transpose(0, 2, 1)
    q = _linear(p["to_q"], y).astype(jnp.float32)
    k = _linear(p["to_k"], y).astype(jnp.float32)
    v = _linear(p["to_v"], y).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    att = jnp.einsum("bsc,bkc->bsk", q, k, precision=hi) * (c**-0.5)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bsk,bkc->bsc", att, v, precision=hi).astype(x.dtype)
    out = _linear(p["to_out"], out)
    return out.transpose(0, 2, 1).reshape(b, c, h, w) + residual


def encoder_forward(params, cfg: SvdVaeConfig, x):
    """[B,3,H,W] -> moments [B, 2*latent, H/8, W/8] (encoder.rs:258-341)."""
    h = _conv2d(params["conv_in"], x)
    for blk in params["down_blocks"]:
        for rp in blk["resnets"]:
            h = _resnet2d(rp, h)
        if "downsamplers" in blk:
            # diffusers: pad (0,1,0,1) then stride-2 conv with no padding
            h = jnp.pad(h, [(0, 0), (0, 0), (0, 1), (0, 1)])
            h = _conv2d(blk["downsamplers"][0]["conv"], h, stride=2, padding=0)
    mid = params["mid_block"]
    h = _resnet2d(mid["resnets"][0], h)
    h = _attention_block(mid["attentions"][0], h)
    h = _resnet2d(mid["resnets"][1], h)
    h = group_norm(h, 32, params["conv_norm_out"]["weight"],
                   params["conv_norm_out"]["bias"])
    return _conv2d(params["conv_out"], silu(h))


def decoder_forward(params, cfg: SvdVaeConfig, z, num_frames: int):
    """[B*T, latent, h, w] -> [B*T, 3, 8h, 8w] (decoder.rs:501-622)."""
    h = _conv2d(params["conv_in"], z)

    mid = params["mid_block"]
    h = _st_resnet(mid["resnets"][0], h, num_frames)
    for attn, rp in zip(mid["attentions"], mid["resnets"][1:]):
        h = _attention_block(attn, h)
        h = _st_resnet(rp, h, num_frames)

    for blk in params["up_blocks"]:
        for rp in blk["resnets"]:
            h = _st_resnet(rp, h, num_frames)
        if "upsamplers" in blk:
            bt, c, hh, ww = h.shape
            h = jax.image.resize(h, (bt, c, hh * 2, ww * 2), method="nearest")
            h = _conv2d(blk["upsamplers"][0]["conv"], h)

    h = group_norm(h, 32, params["conv_norm_out"]["weight"],
                   params["conv_norm_out"]["bias"])
    h = _conv2d(params["conv_out"], silu(h))
    return _temporal_conv(params["time_conv_out"], h, num_frames)


def encode_to_latent(params, cfg: SvdVaeConfig, x, key=None):
    moments = encoder_forward(params["encoder"], cfg, x)
    moments = _conv2d(params["quant_conv"], moments, padding=0)
    c = moments.shape[1] // 2
    mean, logvar = moments[:, :c], moments[:, c:]
    if key is not None:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
    else:
        z = mean
    return z * cfg.scaling_factor


def decode(params, cfg: SvdVaeConfig, z, num_frames: int, chunk_size=None):
    """Chunked decode (mod.rs:117-163)."""
    z = z / cfg.scaling_factor
    bt = z.shape[0]
    chunk_size = chunk_size or bt
    chunks = []
    for start in range(0, bt, chunk_size):
        end = min(start + chunk_size, bt)
        nf = min(end - start, num_frames)
        chunks.append(decoder_forward(params["decoder"], cfg, z[start:end], nf))
    return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


def vae_params_from_state_dict(sd: Dict[str, np.ndarray], dtype=jnp.float32):
    from .loader import _conv, _lin, _norm

    def enc_resnet(pre):
        p = {
            "norm1": _norm(sd, f"{pre}.norm1", dtype),
            "conv1": _conv(sd, f"{pre}.conv1", dtype),
            "norm2": _norm(sd, f"{pre}.norm2", dtype),
            "conv2": _conv(sd, f"{pre}.conv2", dtype),
        }
        if f"{pre}.conv_shortcut.weight" in sd:
            p["conv_shortcut"] = _conv(sd, f"{pre}.conv_shortcut", dtype)
        return p

    def st_resnet(pre):
        return {
            "spatial_res_block": enc_resnet(f"{pre}.spatial_res_block"),
            "temporal_res_block": enc_resnet(f"{pre}.temporal_res_block"),
            "time_mixer": {
                "mix_factor": jnp.asarray(sd[f"{pre}.time_mixer.mix_factor"], jnp.float32)
            },
        }

    def attn_block(pre):
        return {
            "group_norm": _norm(sd, f"{pre}.group_norm", dtype),
            "to_q": _lin(sd, f"{pre}.to_q", dtype),
            "to_k": _lin(sd, f"{pre}.to_k", dtype),
            "to_v": _lin(sd, f"{pre}.to_v", dtype),
            "to_out": _lin(sd, f"{pre}.to_out.0", dtype),
        }

    def enc_blocks():
        out = []
        i = 0
        while f"encoder.down_blocks.{i}.resnets.0.conv1.weight" in sd:
            pre = f"encoder.down_blocks.{i}"
            blk = {"resnets": []}
            j = 0
            while f"{pre}.resnets.{j}.conv1.weight" in sd:
                blk["resnets"].append(enc_resnet(f"{pre}.resnets.{j}"))
                j += 1
            if f"{pre}.downsamplers.0.conv.weight" in sd:
                blk["downsamplers"] = [{"conv": _conv(sd, f"{pre}.downsamplers.0.conv", dtype)}]
            out.append(blk)
            i += 1
        return out

    def dec_blocks():
        out = []
        i = 0
        while f"decoder.up_blocks.{i}.resnets.0.spatial_res_block.conv1.weight" in sd:
            pre = f"decoder.up_blocks.{i}"
            blk = {"resnets": []}
            j = 0
            while f"{pre}.resnets.{j}.spatial_res_block.conv1.weight" in sd:
                blk["resnets"].append(st_resnet(f"{pre}.resnets.{j}"))
                j += 1
            if f"{pre}.upsamplers.0.conv.weight" in sd:
                blk["upsamplers"] = [{"conv": _conv(sd, f"{pre}.upsamplers.0.conv", dtype)}]
            out.append(blk)
            i += 1
        return out

    encoder = {
        "conv_in": _conv(sd, "encoder.conv_in", dtype),
        "down_blocks": enc_blocks(),
        "mid_block": {
            "resnets": [
                enc_resnet("encoder.mid_block.resnets.0"),
                enc_resnet("encoder.mid_block.resnets.1"),
            ],
            "attentions": [attn_block("encoder.mid_block.attentions.0")],
        },
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out", dtype),
        "conv_out": _conv(sd, "encoder.conv_out", dtype),
    }

    n_mid = 0
    while f"decoder.mid_block.resnets.{n_mid}.spatial_res_block.conv1.weight" in sd:
        n_mid += 1
    decoder = {
        "conv_in": _conv(sd, "decoder.conv_in", dtype),
        "mid_block": {
            "resnets": [st_resnet(f"decoder.mid_block.resnets.{j}") for j in range(n_mid)],
            "attentions": [attn_block("decoder.mid_block.attentions.0")],
        },
        "up_blocks": dec_blocks(),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out", dtype),
        "conv_out": _conv(sd, "decoder.conv_out", dtype),
        "time_conv_out": _conv(sd, "decoder.time_conv_out", dtype),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv(sd, "quant_conv", dtype),
    }
