"""diffusers-name -> official (native) checkpoint-name mapping.

Inverse of candle_video_tpu.models.ltx_video.weight_format.remap_key
(reference: weight_format.rs:55-143).  Used to synthesize official-format
unified checkpoints for loader tests at tiny and full scale.
"""

from __future__ import annotations


def officialize_transformer_key(key: str) -> str:
    k = key
    k = k.replace("proj_in", "patchify_proj")
    k = k.replace("time_embed", "adaln_single")
    k = k.replace("norm_q", "q_norm")
    k = k.replace("norm_k", "k_norm")
    return "model.diffusion_model." + k


ENC_INV = {
    "down_blocks.0.downsamplers.0": "down_blocks.1",
    "down_blocks.1.downsamplers.0": "down_blocks.3",
    "down_blocks.2.downsamplers.0": "down_blocks.5",
    "down_blocks.3.downsamplers.0": "down_blocks.7",
    "down_blocks.0": "down_blocks.0",
    "down_blocks.1": "down_blocks.2",
    "down_blocks.2": "down_blocks.4",
    "down_blocks.3": "down_blocks.6",
    "mid_block": "down_blocks.8",
}
DEC_INV = {
    "up_blocks.0.upsamplers.0": "up_blocks.1",
    "up_blocks.1.upsamplers.0": "up_blocks.3",
    "up_blocks.2.upsamplers.0": "up_blocks.5",
    "up_blocks.3.upsamplers.0": "up_blocks.7",
    "mid_block": "up_blocks.0",
    "up_blocks.0": "up_blocks.2",
    "up_blocks.1": "up_blocks.4",
    "up_blocks.2": "up_blocks.6",
    "up_blocks.3": "up_blocks.8",
}


def officialize_vae_key(key: str) -> str:
    k = key
    section = "encoder" if k.startswith("encoder.") else "decoder"
    table = ENC_INV if section == "encoder" else DEC_INV
    body = k[len(section) + 1 :]
    for diff, native in sorted(table.items(), key=lambda kv: -len(kv[0])):
        if body.startswith(diff + "."):
            body = native + body[len(diff) :]
            break
    body = body.replace("resnets", "res_blocks")
    if body.startswith("time_embedder"):
        body = body.replace("time_embedder", "last_time_embedder", 1)
    if body.startswith("scale_shift_table"):
        body = body.replace("scale_shift_table", "last_scale_shift_table", 1)
    return f"vae.{section}.{body}"
