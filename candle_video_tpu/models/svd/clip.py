"""CLIP vision encoder with projection — SVD image conditioning.

Mirror of the reference's CLIP wrapper (src/models/svd/clip.rs:18-104) which
rides candle-transformers' ClipVisionTransformer; here the ViT is implemented
functionally (patch conv embedding + CLS token + learned positions, pre-LN
blocks with quick-GELU MLPs, post-LN pooled CLS, bias-less projection) and
tested against HF transformers CLIPVisionModelWithProjection.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import layer_norm
from .configs import ClipEncoderConfig

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def normalize_for_clip(images):
    """[B,3,H,W] in [0,1] -> CLIP-normalized (clip.rs:96-104)."""
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1).astype(images.dtype)
    std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1).astype(images.dtype)
    return (images - mean) / std


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _linear(p, x):
    y = x @ p["weight"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _attention(p, cfg: ClipEncoderConfig, x):
    b, s, d = x.shape
    h = cfg.num_attention_heads
    hd = d // h
    scale = hd**-0.5
    q = _linear(p["q_proj"], x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = _linear(p["k_proj"], x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    v = _linear(p["v_proj"], x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    att = jnp.einsum(
        "bhsd,bhkd->bhsk", q.astype(jnp.float32) * scale, k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhsk,bhkd->bhsd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    return _linear(p["out_proj"], out)


def forward(params, cfg: ClipEncoderConfig, pixel_values):
    """pixel_values [B,3,H,W] (already CLIP-normalized) -> image embeds
    [B, projection_dim]."""
    b = pixel_values.shape[0]
    d = cfg.hidden_size
    emb = params["embeddings"]

    # patch conv (no bias), stride=kernel=patch_size
    patches = jax.lax.conv_general_dilated(
        pixel_values.astype(emb["patch_embedding"]["weight"].dtype),
        emb["patch_embedding"]["weight"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(pixel_values.dtype)
    patches = patches.reshape(b, d, -1).transpose(0, 2, 1)  # [B, P, D]

    cls = jnp.broadcast_to(emb["class_embedding"].reshape(1, 1, d), (b, 1, d))
    x = jnp.concatenate([cls.astype(patches.dtype), patches], axis=1)
    x = x + emb["position_embedding"]["weight"][None]

    x = layer_norm(
        x, params["pre_layrnorm"]["weight"], params["pre_layrnorm"]["bias"],
        eps=cfg.layer_norm_eps,
    )

    for blk in params["layers"]:
        residual = x
        h = layer_norm(
            x, blk["layer_norm1"]["weight"], blk["layer_norm1"]["bias"],
            eps=cfg.layer_norm_eps,
        )
        x = residual + _attention(blk["self_attn"], cfg, h)
        residual = x
        h = layer_norm(
            x, blk["layer_norm2"]["weight"], blk["layer_norm2"]["bias"],
            eps=cfg.layer_norm_eps,
        )
        h = _linear(blk["mlp"]["fc2"], _quick_gelu(_linear(blk["mlp"]["fc1"], h)))
        x = residual + h

    pooled = x[:, 0]
    pooled = layer_norm(
        pooled, params["post_layernorm"]["weight"], params["post_layernorm"]["bias"],
        eps=cfg.layer_norm_eps,
    )
    return pooled @ params["visual_projection"]["weight"]


def params_from_hf_state_dict(
    sd: Dict[str, np.ndarray], cfg: ClipEncoderConfig, dtype=jnp.float32
):
    """HF CLIPVisionModelWithProjection state dict → pytree."""

    def lin(prefix, bias=True, transpose=True):
        w = np.asarray(sd[f"{prefix}.weight"])
        if transpose:
            w = np.ascontiguousarray(w.T)
        p = {"weight": jnp.asarray(w, dtype)}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
        return p

    def vec(key):
        return jnp.asarray(sd[key], dtype)

    vm = "vision_model"
    layers = []
    i = 0
    while f"{vm}.encoder.layers.{i}.layer_norm1.weight" in sd:
        pre = f"{vm}.encoder.layers.{i}"
        layers.append(
            {
                "layer_norm1": {"weight": vec(f"{pre}.layer_norm1.weight"),
                                "bias": vec(f"{pre}.layer_norm1.bias")},
                "layer_norm2": {"weight": vec(f"{pre}.layer_norm2.weight"),
                                "bias": vec(f"{pre}.layer_norm2.bias")},
                "self_attn": {
                    "q_proj": lin(f"{pre}.self_attn.q_proj"),
                    "k_proj": lin(f"{pre}.self_attn.k_proj"),
                    "v_proj": lin(f"{pre}.self_attn.v_proj"),
                    "out_proj": lin(f"{pre}.self_attn.out_proj"),
                },
                "mlp": {
                    "fc1": lin(f"{pre}.mlp.fc1"),
                    "fc2": lin(f"{pre}.mlp.fc2"),
                },
            }
        )
        i += 1

    return {
        "embeddings": {
            "class_embedding": vec(f"{vm}.embeddings.class_embedding"),
            "patch_embedding": {
                "weight": jnp.asarray(
                    sd[f"{vm}.embeddings.patch_embedding.weight"], dtype
                )
            },
            "position_embedding": {
                "weight": vec(f"{vm}.embeddings.position_embedding.weight")
            },
        },
        "pre_layrnorm": {"weight": vec(f"{vm}.pre_layrnorm.weight"),
                         "bias": vec(f"{vm}.pre_layrnorm.bias")},
        "layers": layers,
        "post_layernorm": {"weight": vec(f"{vm}.post_layernorm.weight"),
                           "bias": vec(f"{vm}.post_layernorm.bias")},
        "visual_projection": lin("visual_projection", bias=False),
    }
