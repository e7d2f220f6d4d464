"""Weight I/O: safetensors → JAX parameter pytrees.

The reference's weight loader (src/models/ltx_video/loader.rs:188-428)
mmaps single/sharded safetensors files with index.json auto-detection and
remaps checkpoint keys; here the same responsibilities are split into:

- ``load_safetensors`` / ``load_sharded``: zero-copy numpy views via the
  safetensors library (mmap under the hood),
- ``transformer_params_from_state_dict`` / ``vae_params_from_state_dict``:
  diffusers-layout key → pytree path conversion.  Linear weights are
  transposed [out,in] → [in,out] once at load so the hot path is ``x @ w``;
  conv weights keep torch's [O,I,kt,kh,kw] layout (fed to
  ``lax.conv_general_dilated`` with OIDHW dimension numbers).
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, Iterable, Optional

import jax.numpy as jnp
import numpy as np

from .transformer import LtxTransformerConfig


class LoaderError(Exception):
    """Mirror of the reference's typed LoaderError (loader.rs:23-57)."""


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load every tensor of a .safetensors file as numpy (mmap-backed)."""
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def list_tensor_names(path: str) -> list[str]:
    from safetensors import safe_open

    with safe_open(path, framework="numpy") as f:
        return list(f.keys())


def load_sharded(directory: str, index_name: str = "model.safetensors.index.json"):
    """Sharded checkpoint dir with index.json (loader.rs:341-396)."""
    index_path = os.path.join(directory, index_name)
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        weight_map = index["weight_map"]
        shards = sorted(set(weight_map.values()))
        out: Dict[str, np.ndarray] = {}
        for shard in shards:
            out.update(load_safetensors(os.path.join(directory, shard)))
        return out
    # fall back: single model.safetensors or any *.safetensors in the dir
    single = os.path.join(directory, "model.safetensors")
    if os.path.exists(single):
        return load_safetensors(single)
    cands = [p for p in os.listdir(directory) if p.endswith(".safetensors")]
    if not cands:
        raise LoaderError(f"no safetensors found in {directory}")
    out = {}
    for c in sorted(cands):
        out.update(load_safetensors(os.path.join(directory, c)))
    return out


def load_model_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# state-dict → pytree
# ---------------------------------------------------------------------------


def _lin(sd, prefix, dtype, required=True):
    wkey = f"{prefix}.weight"
    if wkey not in sd:
        if required:
            raise LoaderError(f"missing tensor {wkey}")
        return None
    p = {"weight": jnp.asarray(np.ascontiguousarray(sd[wkey].T), dtype)}
    bkey = f"{prefix}.bias"
    if bkey in sd:
        p["bias"] = jnp.asarray(sd[bkey], dtype)
    return p


def _vec(sd, key, dtype):
    if key not in sd:
        raise LoaderError(f"missing tensor {key}")
    return jnp.asarray(sd[key], dtype)


def transformer_params_from_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: LtxTransformerConfig,
    dtype=jnp.bfloat16,
):
    """Diffusers-layout LTX transformer state dict → stacked-block pytree."""

    def attn(prefix):
        return {
            "norm_q": {"weight": _vec(sd, f"{prefix}.norm_q.weight", dtype)},
            "norm_k": {"weight": _vec(sd, f"{prefix}.norm_k.weight", dtype)},
            "to_q": _lin(sd, f"{prefix}.to_q", dtype),
            "to_k": _lin(sd, f"{prefix}.to_k", dtype),
            "to_v": _lin(sd, f"{prefix}.to_v", dtype),
            "to_out": _lin(sd, f"{prefix}.to_out.0", dtype),
        }

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        blocks.append(
            {
                "attn1": attn(f"{pre}.attn1"),
                "attn2": attn(f"{pre}.attn2"),
                "ff": {
                    "net_0_proj": _lin(sd, f"{pre}.ff.net.0.proj", dtype),
                    "net_2": _lin(sd, f"{pre}.ff.net.2", dtype),
                },
                "scale_shift_table": _vec(sd, f"{pre}.scale_shift_table", dtype),
            }
        )
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "proj_in": _lin(sd, "proj_in", dtype),
        "time_embed": {
            "emb": {
                "timestep_embedder": {
                    "linear_1": _lin(sd, "time_embed.emb.timestep_embedder.linear_1", dtype),
                    "linear_2": _lin(sd, "time_embed.emb.timestep_embedder.linear_2", dtype),
                }
            },
            "linear": _lin(sd, "time_embed.linear", dtype),
        },
        "caption_projection": {
            "linear_1": _lin(sd, "caption_projection.linear_1", dtype),
            "linear_2": _lin(sd, "caption_projection.linear_2", dtype),
        },
        "blocks": stacked,
        "scale_shift_table": _vec(sd, "scale_shift_table", dtype),
        "proj_out": _lin(sd, "proj_out", dtype),
    }


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Convenience for tests: torch module.state_dict() → numpy dict."""
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}
