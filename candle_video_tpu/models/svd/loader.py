"""SVD checkpoint loading: diffusers-layout state dicts → pytrees.

Counterpart of the reference's SVD weight mappers (src/models/svd/
weights.rs:48-136); structure is discovered from the keys.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _lin(sd, prefix, dtype, bias=True):
    p = {"weight": jnp.asarray(np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T), dtype)}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
    return p


def _conv(sd, prefix, dtype):
    p = {"weight": jnp.asarray(sd[f"{prefix}.weight"], dtype)}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
    return p


def _norm(sd, prefix, dtype):
    return {
        "weight": jnp.asarray(sd[f"{prefix}.weight"], dtype),
        "bias": jnp.asarray(sd[f"{prefix}.bias"], dtype),
    }


def _resnet2d(sd, pre, dtype):
    p = {
        "norm1": _norm(sd, f"{pre}.norm1", dtype),
        "conv1": _conv(sd, f"{pre}.conv1", dtype),
        "norm2": _norm(sd, f"{pre}.norm2", dtype),
        "conv2": _conv(sd, f"{pre}.conv2", dtype),
    }
    if f"{pre}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin(sd, f"{pre}.time_emb_proj", dtype)
    if f"{pre}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{pre}.conv_shortcut", dtype)
    return p


def _st_resnet(sd, pre, dtype):
    return {
        "spatial_res_block": _resnet2d(sd, f"{pre}.spatial_res_block", dtype),
        "temporal_res_block": _resnet2d(sd, f"{pre}.temporal_res_block", dtype),
        "time_mixer": {
            "mix_factor": jnp.asarray(sd[f"{pre}.time_mixer.mix_factor"], jnp.float32)
        },
    }


def _attn(sd, pre, dtype):
    return {
        "to_q": _lin(sd, f"{pre}.to_q", dtype),
        "to_k": _lin(sd, f"{pre}.to_k", dtype),
        "to_v": _lin(sd, f"{pre}.to_v", dtype),
        "to_out": _lin(sd, f"{pre}.to_out.0", dtype),
    }


def _basic_block(sd, pre, dtype, temporal=False):
    p = {
        "norm1": _norm(sd, f"{pre}.norm1", dtype),
        "attn1": _attn(sd, f"{pre}.attn1", dtype),
        "norm2": _norm(sd, f"{pre}.norm2", dtype),
        "attn2": _attn(sd, f"{pre}.attn2", dtype),
        "norm3": _norm(sd, f"{pre}.norm3", dtype),
        "ff": {
            "proj": _lin(sd, f"{pre}.ff.net.0.proj", dtype),
            "proj_out": _lin(sd, f"{pre}.ff.net.2", dtype),
        },
    }
    if temporal:
        p["norm_in"] = _norm(sd, f"{pre}.norm_in", dtype)
        p["ff_in"] = {
            "proj": _lin(sd, f"{pre}.ff_in.net.0.proj", dtype),
            "proj_out": _lin(sd, f"{pre}.ff_in.net.2", dtype),
        }
    return p


def _st_transformer(sd, pre, dtype):
    blocks = []
    tblocks = []
    i = 0
    while f"{pre}.transformer_blocks.{i}.norm1.weight" in sd:
        blocks.append(_basic_block(sd, f"{pre}.transformer_blocks.{i}", dtype))
        tblocks.append(
            _basic_block(sd, f"{pre}.temporal_transformer_blocks.{i}", dtype, True)
        )
        i += 1
    return {
        "norm": _norm(sd, f"{pre}.norm", dtype),
        "proj_in": _lin(sd, f"{pre}.proj_in", dtype),
        "transformer_blocks": blocks,
        "temporal_transformer_blocks": tblocks,
        "time_pos_embed": {
            "linear_1": _lin(sd, f"{pre}.time_pos_embed.linear_1", dtype),
            "linear_2": _lin(sd, f"{pre}.time_pos_embed.linear_2", dtype),
        },
        "time_mixer": {
            "mix_factor": jnp.asarray(sd[f"{pre}.time_mixer.mix_factor"], jnp.float32)
        },
        "proj_out": _lin(sd, f"{pre}.proj_out", dtype),
    }


def unet_params_from_state_dict(sd: Dict[str, np.ndarray], dtype=jnp.float32):
    def blocks(kind):
        out = []
        i = 0
        while f"{kind}.{i}.resnets.0.spatial_res_block.conv1.weight" in sd:
            pre = f"{kind}.{i}"
            blk: dict = {"resnets": []}
            j = 0
            while f"{pre}.resnets.{j}.spatial_res_block.conv1.weight" in sd:
                blk["resnets"].append(_st_resnet(sd, f"{pre}.resnets.{j}", dtype))
                j += 1
            if f"{pre}.attentions.0.proj_in.weight" in sd:
                blk["attentions"] = [
                    _st_transformer(sd, f"{pre}.attentions.{k}", dtype)
                    for k in range(j)
                ]
            if f"{pre}.downsamplers.0.conv.weight" in sd:
                blk["downsamplers"] = [{"conv": _conv(sd, f"{pre}.downsamplers.0.conv", dtype)}]
            if f"{pre}.upsamplers.0.conv.weight" in sd:
                blk["upsamplers"] = [{"conv": _conv(sd, f"{pre}.upsamplers.0.conv", dtype)}]
            out.append(blk)
            i += 1
        return out

    mid = {
        "resnets": [
            _st_resnet(sd, "mid_block.resnets.0", dtype),
            _st_resnet(sd, "mid_block.resnets.1", dtype),
        ],
        "attentions": [_st_transformer(sd, "mid_block.attentions.0", dtype)],
    }

    return {
        "conv_in": _conv(sd, "conv_in", dtype),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1", dtype),
            "linear_2": _lin(sd, "time_embedding.linear_2", dtype),
        },
        "add_embedding": {
            "linear_1": _lin(sd, "add_embedding.linear_1", dtype),
            "linear_2": _lin(sd, "add_embedding.linear_2", dtype),
        },
        "down_blocks": blocks("down_blocks"),
        "mid_block": mid,
        "up_blocks": blocks("up_blocks"),
        "conv_norm_out": _norm(sd, "conv_norm_out", dtype),
        "conv_out": _conv(sd, "conv_out", dtype),
    }
