"""Zeros-weight transformer params — the VarBuilder::zeros pattern the
reference uses for benches/shape tests (benches/ltx_video_benchmarks.rs:139).
Fast to build (no host RNG), identical structure to real checkpoints.

The whole tree is emitted by ONE jitted builder: per-leaf jnp.zeros in
eager mode cost one (remote, ~0.4 s) XLA compile per distinct shape —
~20 compiles that dominated the parameter-build stage of the cold start.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transformer import LtxTransformerConfig


def _zeros_spec(cfg: LtxTransformerConfig):
    """(shape, fill) spec tree; fill is 0.0 or 1.0 (norm weights)."""
    d = cfg.inner_dim

    def lin(d_in, d_out, bias=True):
        p = {"weight": ((d_in, d_out), 0.0)}
        if bias:
            p["bias"] = ((d_out,), 0.0)
        return p

    def attn(kv):
        return {
            "norm_q": {"weight": ((d,), 1.0)},
            "norm_k": {"weight": ((d,), 1.0)},
            "to_q": lin(d, d, cfg.attention_bias),
            "to_k": lin(kv, d, cfg.attention_bias),
            "to_v": lin(kv, d, cfg.attention_bias),
            "to_out": lin(d, d, cfg.attention_out_bias),
        }

    L = cfg.num_layers
    block = {
        "attn1": attn(d),
        "attn2": attn(d),
        "ff": {"net_0_proj": lin(d, 4 * d), "net_2": lin(4 * d, d)},
        "scale_shift_table": ((6, d), 0.0),
    }
    blocks = jax.tree.map(
        lambda sp: ((L,) + sp[0], sp[1]),
        block,
        is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2
        and isinstance(x[0], tuple),
    )

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
        "scale_shift_table": ((2, d), 0.0),
        "proj_out": lin(d, cfg.out_channels or cfg.in_channels),
    }


def zeros_transformer_params(cfg: LtxTransformerConfig, dtype=jnp.bfloat16):
    def _is_leaf(x):
        return (isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], tuple))

    spec = _zeros_spec(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(spec, is_leaf=_is_leaf)

    @jax.jit
    def build():
        return [jnp.full(shape, fill, dtype) for shape, fill in leaves]

    return jax.tree_util.tree_unflatten(treedef, build())
