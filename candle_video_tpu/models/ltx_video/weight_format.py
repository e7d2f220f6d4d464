"""Checkpoint format detection and Official→Diffusers key remapping.

Mirror of the reference's weight_format module (src/models/ltx_video/
weight_format.rs:13-164), itself derived from diffusers'
convert_ltx_to_diffusers.py VAE_095_RENAME_DICT.
"""

from __future__ import annotations

import os
import re
from typing import Dict

_ENCODER_BLOCK_RE = re.compile(r"encoder\.down_blocks\.(\d+)")
_DECODER_BLOCK_RE = re.compile(r"decoder\.up_blocks\.(\d+)")

_ENCODER_MAP = {
    0: "encoder.down_blocks.0",
    1: "encoder.down_blocks.0.downsamplers.0",
    2: "encoder.down_blocks.1",
    3: "encoder.down_blocks.1.downsamplers.0",
    4: "encoder.down_blocks.2",
    5: "encoder.down_blocks.2.downsamplers.0",
    6: "encoder.down_blocks.3",
    7: "encoder.down_blocks.3.downsamplers.0",
    8: "encoder.mid_block",
}

_DECODER_MAP = {
    0: "decoder.mid_block",
    1: "decoder.up_blocks.0.upsamplers.0",
    2: "decoder.up_blocks.0",
    3: "decoder.up_blocks.1.upsamplers.0",
    4: "decoder.up_blocks.1",
    5: "decoder.up_blocks.2.upsamplers.0",
    6: "decoder.up_blocks.2",
    7: "decoder.up_blocks.3.upsamplers.0",
    8: "decoder.up_blocks.3",
}


def detect_format(path: str) -> str:
    """file → 'official' (unified), directory → 'diffusers'
    (weight_format.rs:22-29)."""
    return "official" if os.path.isfile(path) else "diffusers"


def remap_key(key: str) -> str:
    """Official → Diffusers key translation (weight_format.rs:55-81)."""
    k = key
    k = k.replace("patchify_proj", "proj_in")
    k = k.replace("adaln_single", "time_embed")
    k = k.replace("q_norm", "norm_q")
    k = k.replace("k_norm", "norm_k")
    k = k.replace("res_blocks", "resnets")

    k = _ENCODER_BLOCK_RE.sub(
        lambda m: _ENCODER_MAP.get(int(m.group(1)), m.group(0)), k
    )
    k = _DECODER_BLOCK_RE.sub(
        lambda m: _DECODER_MAP.get(int(m.group(1)), m.group(0)), k
    )

    k = k.replace("last_time_embedder", "time_embedder")
    k = k.replace("last_scale_shift_table", "scale_shift_table")
    k = k.replace("norm3.norm", "norm3")
    k = k.replace("per_channel_statistics.mean-of-means", "latents_mean")
    k = k.replace("per_channel_statistics.std-of-means", "latents_std")
    return k


def is_transformer_key(key: str) -> bool:
    """weight_format.rs:146-154."""
    return (
        key.startswith("transformer.")
        or key.startswith("model.diffusion_model.")
        or "transformer_blocks" in key
        or "patchify_proj" in key
        or "proj_in" in key
        or "adaln_single" in key
        or "time_embed" in key
    )


def is_vae_key(key: str) -> bool:
    """weight_format.rs:157-164."""
    return (
        key.startswith("vae.")
        or key.startswith("encoder.")
        or key.startswith("decoder.")
        or "per_channel_statistics" in key
        or "latents_mean" in key
        or "latents_std" in key
    )


def split_unified_state_dict(sd: Dict) -> tuple[Dict, Dict]:
    """Split a unified (official single-file) checkpoint into remapped
    transformer and VAE state dicts (examples/ltx-video/main.rs:461-522)."""
    transformer, vae = {}, {}
    for key, value in sd.items():
        new_key = remap_key(key)
        stripped = new_key
        for prefix in ("transformer.", "model.diffusion_model.", "vae."):
            if stripped.startswith(prefix):
                stripped = stripped[len(prefix):]
                break
        if is_transformer_key(key) and not is_vae_key(key):
            transformer[stripped] = value
        elif is_vae_key(key):
            vae[stripped] = value
    return transformer, vae
