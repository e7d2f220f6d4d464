"""Zeros-weight transformer params — the VarBuilder::zeros pattern the
reference uses for benches/shape tests (benches/ltx_video_benchmarks.rs:139).
Fast to build (no host RNG), identical structure to real checkpoints."""

from __future__ import annotations

import jax.numpy as jnp

from .transformer import LtxTransformerConfig


def zeros_transformer_params(cfg: LtxTransformerConfig, dtype=jnp.bfloat16):
    d = cfg.inner_dim

    def lin(d_in, d_out, bias=True):
        p = {"weight": jnp.zeros((d_in, d_out), dtype)}
        if bias:
            p["bias"] = jnp.zeros((d_out,), dtype)
        return p

    def attn(kv):
        return {
            "norm_q": {"weight": jnp.ones((d,), dtype)},
            "norm_k": {"weight": jnp.ones((d,), dtype)},
            "to_q": lin(d, d, cfg.attention_bias),
            "to_k": lin(kv, d, cfg.attention_bias),
            "to_v": lin(kv, d, cfg.attention_bias),
            "to_out": lin(d, d, cfg.attention_out_bias),
        }

    L = cfg.num_layers

    def stack(p):
        return jnp.zeros((L,) + p.shape, p.dtype) if p.ndim else p

    block = {
        "attn1": attn(d),
        "attn2": attn(d),
        "ff": {"net_0_proj": lin(d, 4 * d), "net_2": lin(4 * d, d)},
        "scale_shift_table": jnp.zeros((6, d), dtype),
    }
    import jax

    blocks = jax.tree.map(lambda x: jnp.broadcast_to(x, (L,) + x.shape), block)

    return {
        "proj_in": lin(cfg.in_channels, d),
        "time_embed": {
            "emb": {
                "timestep_embedder": {
                    "linear_1": lin(256, d),
                    "linear_2": lin(d, d),
                }
            },
            "linear": lin(d, 6 * d),
        },
        "caption_projection": {
            "linear_1": lin(cfg.caption_channels, d),
            "linear_2": lin(d, d),
        },
        "blocks": blocks,
        "scale_shift_table": jnp.zeros((2, d), dtype),
        "proj_out": lin(d, cfg.out_channels or cfg.in_channels),
    }
