"""UNet spatio-temporal condition model (SVD) — functional JAX.

Parity target: the reference's SVD UNet family (src/models/svd/unet/
{model,blocks,transformer,resnet}.rs): spatio-temporal resnets (spatial
ResnetBlock2D + temporal 3x1x1-conv block blended by a learned AlphaBlender),
spatio-temporal transformers (spatial block → +frame-position embedding →
temporal block over the frame axis → learned time mixer), cross-attention on
CLIP image embeddings, and the fps/motion/noise-aug added-time conditioning.

Tensors ride a fused [B*T, C, H, W] layout; the temporal mixers reshape to
[B·H·W, T, C] which keeps every matmul MXU-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.activations import silu
from ...ops.attention import attention as sdpa
from ...ops.embeddings import sinusoidal_timestep_embedding
from ...ops.norms import group_norm, layer_norm
from .configs import SvdUnetConfig

# up-block input-channel lists from the diffusers SVD checkpoint layout
# (src/models/svd/unet/model.rs:243-249)
UP_BLOCK_CHANNELS = (
    ((2560, 2560, 2560), 1280, False, True),
    ((2560, 2560, 1920), 1280, True, True),
    ((1920, 1280, 960), 640, True, True),
    ((960, 640, 640), 320, True, False),
)


def timestep_embedding(t, dim: int):
    """SVD sinusoid: downscale_freq_shift=1, [cos, sin] (model.rs:40-57)."""
    return sinusoidal_timestep_embedding(
        t, dim, flip_sin_to_cos=True, downscale_freq_shift=1.0
    )


def _linear(p, x):
    y = x @ p["weight"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _conv2d(p, x, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x.astype(p["weight"].dtype),
        p["weight"],
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        out = out + p["bias"].astype(jnp.float32)[None, :, None, None]
    return out.astype(p["weight"].dtype)


def _time_mlp(p, x):
    return _linear(p["linear_2"], silu(_linear(p["linear_1"], x)))


def _resnet2d(p, x, temb):
    h = group_norm(x, 32, p["norm1"]["weight"], p["norm1"]["bias"])
    h = _conv2d(p["conv1"], silu(h))
    if temb is not None and "time_emb_proj" in p:
        h = h + _linear(p["time_emb_proj"], silu(temb))[:, :, None, None]
    h = group_norm(h, 32, p["norm2"]["weight"], p["norm2"]["bias"])
    h = _conv2d(p["conv2"], silu(h))
    res = x
    if "conv_shortcut" in p:
        res = _conv2d(p["conv_shortcut"], res, padding=0)
    return h + res


def _temporal_conv(p, x, num_frames: int):
    """3x1x1 temporal conv on [B*T, C, H, W] (resnet.rs TemporalConv3d)."""
    bt, c, hgt, wid = x.shape
    b = bt // num_frames
    w = p["weight"]  # [O, I, 3, 1, 1]
    o = w.shape[0]
    xt = x.reshape(b, num_frames, c, hgt, wid).transpose(0, 3, 4, 2, 1)
    xt = xt.reshape(b * hgt * wid, c, num_frames)
    out = jax.lax.conv_general_dilated(
        xt.astype(w.dtype),
        w[:, :, :, 0, 0],
        window_strides=(1,),
        padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        out = out + p["bias"].astype(jnp.float32)[None, :, None]
    out = out.astype(x.dtype).reshape(b, hgt, wid, o, num_frames)
    return out.transpose(0, 4, 3, 1, 2).reshape(bt, o, hgt, wid)


def _temporal_resnet(p, x, temb, num_frames: int):
    h = group_norm(x, 32, p["norm1"]["weight"], p["norm1"]["bias"])
    h = _temporal_conv(p["conv1"], silu(h), num_frames)
    if temb is not None and "time_emb_proj" in p:
        h = h + _linear(p["time_emb_proj"], silu(temb))[:, :, None, None]
    h = group_norm(h, 32, p["norm2"]["weight"], p["norm2"]["bias"])
    h = _temporal_conv(p["conv2"], silu(h), num_frames)
    return h + x


def _alpha_blend(p, spatial, temporal, temporal_first: bool = False):
    """learned sigmoid mix (resnet.rs AlphaBlender / transformer.rs TimeMixer).

    ``temporal_first=False``: alpha·spatial + (1-alpha)·temporal (resnets);
    ``temporal_first=True``: alpha·temporal + (1-alpha)·spatial (transformer
    time mixer)."""
    alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)).astype(spatial.dtype)
    if temporal_first:
        return temporal * alpha + spatial * (1.0 - alpha)
    return spatial * alpha + temporal * (1.0 - alpha)


def _st_resnet(p, x, temb, image_only_indicator, num_frames: int):
    h_spatial = _resnet2d(p["spatial_res_block"], x, temb)
    h_temporal = _temporal_resnet(p["temporal_res_block"], h_spatial, temb, num_frames)
    return _alpha_blend(p["time_mixer"], h_spatial, h_temporal)


def _attention(p, cfg_heads: int, x, context=None):
    b, s, d = x.shape
    ctx = x if context is None else context
    hd = d // cfg_heads
    q = _linear(p["to_q"], x).reshape(b, s, cfg_heads, hd)
    k = _linear(p["to_k"], ctx).reshape(b, ctx.shape[1], cfg_heads, hd)
    v = _linear(p["to_v"], ctx).reshape(b, ctx.shape[1], cfg_heads, hd)
    out = sdpa(q, k, v, hd**-0.5, impl="xla")
    return _linear(p["to_out"], out.reshape(b, s, d))


def _geglu_ff(p, x):
    h = _linear(p["proj"], x)
    gate, value = jnp.split(h, 2, axis=-1)
    return _linear(p["proj_out"], jax.nn.gelu(gate, approximate=False) * value)


def _basic_block(p, heads, x, context):
    x = x + _attention(p["attn1"], heads,
                       layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"], 1e-5))
    x = x + _attention(p["attn2"], heads,
                       layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"], 1e-5),
                       context)
    x = x + _geglu_ff(p["ff"],
                      layer_norm(x, p["norm3"]["weight"], p["norm3"]["bias"], 1e-5))
    return x


def _temporal_basic_block(p, heads, x, time_context, num_frames: int):
    bt, s, d = x.shape
    b = bt // num_frames
    h = x.reshape(b, num_frames, s, d).transpose(0, 2, 1, 3).reshape(b * s, num_frames, d)

    h = h + _geglu_ff(p["ff_in"],
                      layer_norm(h, p["norm_in"]["weight"], p["norm_in"]["bias"], 1e-5))
    h = h + _attention(p["attn1"], heads,
                       layer_norm(h, p["norm1"]["weight"], p["norm1"]["bias"], 1e-5))
    h = h + _attention(p["attn2"], heads,
                       layer_norm(h, p["norm2"]["weight"], p["norm2"]["bias"], 1e-5),
                       time_context)
    h = h + _geglu_ff(p["ff"],
                      layer_norm(h, p["norm3"]["weight"], p["norm3"]["bias"], 1e-5))
    return h.reshape(b, s, num_frames, d).transpose(0, 2, 1, 3).reshape(bt, s, d)


def _st_transformer(p, heads, x, context, num_frames: int):
    """TransformerSpatioTemporalModel (transformer.rs:330-454)."""
    bt, c, hgt, wid = x.shape
    b = bt // num_frames
    residual = x

    time_context = None
    if context is not None:
        d = context.shape[-1]
        first = context.reshape(b, num_frames, -1, d)[:, 0]  # [B, L, D]
        time_context = jnp.repeat(first[:, None], hgt * wid, axis=1).reshape(
            b * hgt * wid, -1, d
        )

    h = group_norm(x, 32, p["norm"]["weight"], p["norm"]["bias"])
    h = h.reshape(bt, c, hgt * wid).transpose(0, 2, 1)
    h = _linear(p["proj_in"], h)

    frame_idx = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32), b)
    t_emb = timestep_embedding(frame_idx, c).astype(h.dtype)
    emb = _time_mlp(p["time_pos_embed"], t_emb)[:, None, :]  # [B*T, 1, C]

    for sp, tp in zip(p["transformer_blocks"], p["temporal_transformer_blocks"]):
        h_spatial = _basic_block(sp, heads, h, context)
        h_mix = h_spatial + emb
        h_temporal = _temporal_basic_block(tp, heads, h_mix, time_context, num_frames)
        h = _alpha_blend(p["time_mixer"], h_spatial, h_temporal, temporal_first=True)

    h = _linear(p["proj_out"], h)
    return h.transpose(0, 2, 1).reshape(bt, c, hgt, wid) + residual


def forward(
    params,
    cfg: SvdUnetConfig,
    sample,  # [B*T, in_channels, H, W]
    timestep,  # [B] or scalar
    encoder_hidden_states,  # [B*T, L, cross_dim] (CLIP image embeds)
    added_time_ids,  # [B, 3] fps / motion_bucket_id / noise_aug_strength
    num_frames: int,
):
    """UNetSpatioTemporalConditionModel forward (model.rs:305-404)."""
    dtype = params["conv_in"]["weight"].dtype
    bt = sample.shape[0]
    b = bt // num_frames

    # 1. time embedding (broadcast over frames)
    t = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
    t_emb = timestep_embedding(t, cfg.block_out_channels[0]).astype(dtype)
    emb = _time_mlp(params["time_embedding"], t_emb)

    # 2. added time ids
    ids = added_time_ids.astype(jnp.float32)
    aug = jnp.concatenate(
        [timestep_embedding(ids[:, i], cfg.addition_time_embed_dim) for i in range(3)],
        axis=-1,
    ).astype(dtype)
    emb = emb + _time_mlp(params["add_embedding"], aug)
    emb = jnp.repeat(emb, num_frames, axis=0)  # [B*T, D]

    # 3. conv in
    h = _conv2d(params["conv_in"], sample.astype(dtype))

    # 4. down blocks
    res_stack = [h]
    heads = cfg.num_attention_heads
    for i, blk in enumerate(params["down_blocks"]):
        for j, rp in enumerate(blk["resnets"]):
            h = _st_resnet(rp, h, emb, None, num_frames)
            if "attentions" in blk:
                h = _st_transformer(
                    blk["attentions"][j], heads[i], h, encoder_hidden_states, num_frames
                )
            res_stack.append(h)
        if "downsamplers" in blk:
            h = _conv2d(blk["downsamplers"][0]["conv"], h, stride=2)
            res_stack.append(h)

    # 5. mid block
    mid = params["mid_block"]
    h = _st_resnet(mid["resnets"][0], h, emb, None, num_frames)
    h = _st_transformer(mid["attentions"][0], heads[-1], h, encoder_hidden_states,
                        num_frames)
    h = _st_resnet(mid["resnets"][1], h, emb, None, num_frames)

    # 6. up blocks (head counts reversed, diffusers semantics — all hd=64)
    rev_heads = tuple(reversed(heads))
    for i, blk in enumerate(params["up_blocks"]):
        for j, rp in enumerate(blk["resnets"]):
            res = res_stack.pop()
            h = jnp.concatenate([h, res], axis=1)
            h = _st_resnet(rp, h, emb, None, num_frames)
            if "attentions" in blk:
                h = _st_transformer(
                    blk["attentions"][j], rev_heads[i], h,
                    encoder_hidden_states, num_frames,
                )
        if "upsamplers" in blk:
            bt2, c2, hh, ww = h.shape
            h = jax.image.resize(h, (bt2, c2, hh * 2, ww * 2), method="nearest")
            h = _conv2d(blk["upsamplers"][0]["conv"], h)

    # 7. out
    h = group_norm(h, 32, params["conv_norm_out"]["weight"],
                   params["conv_norm_out"]["bias"])
    return _conv2d(params["conv_out"], silu(h))
