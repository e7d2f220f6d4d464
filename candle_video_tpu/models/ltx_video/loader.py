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
from typing import Dict

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


def get_tensor_info(path: str) -> Dict[str, tuple]:
    """name -> (shape, dtype) without loading data (loader.rs:508-556)."""
    from safetensors import safe_open

    out: Dict[str, tuple] = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            sl = f.get_slice(key)
            out[key] = (tuple(sl.get_shape()), sl.get_dtype())
    return out


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

    top = _transformer_top_level(sd, dtype)
    top["blocks"] = stacked
    return top


def _transformer_top_level(sd, dtype):
    """The non-block leaves of the transformer tree (head/tail/embedders) —
    shared by the dense and the streaming-w8 loaders."""
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
        "scale_shift_table": _vec(sd, "scale_shift_table", dtype),
        "proj_out": _lin(sd, "proj_out", dtype),
    }


def transformer_params_w8_from_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: LtxTransformerConfig,
    dtype=jnp.bfloat16,
    qblock: int = 128,
    rope_split: bool = False,
):
    """Diffusers-layout state dict → weight-only-int8 (W8A16) stacked tree.

    The memory-scalable 13B loader: block linears are quantized HOST-SIDE
    layer by layer straight off the (mmap-backed) state dict and only the
    int8 payloads + f32 scales are uploaded, so neither host RAM nor the
    device ever holds the BF16 block tree (~26 GiB at 13B; device peak is
    the final ~12.7 GiB).  The device-tree path
    (``transformer_params_from_state_dict`` +
    ``transformer.quantize_transformer_params_w8``) produces bit-identical
    payloads when no dtype cast intervenes (tested at f32); with
    ``dtype=bfloat16`` this loader quantizes the checkpoint's ORIGINAL
    precision while the device path quantizes the bf16-cast tree — the
    streaming payloads are strictly more accurate there.  Requires the
    dense tree to fit for the device path; this one always fits.

    ``rope_split=True`` additionally folds the split-rope lane permutation
    into attn1 to_q/to_k (+ norm_q/norm_k) host-side — free, unlike the
    on-device ``materialize_split_rope`` which briefly holds both layouts.
    Callers that pass it MUST mark the pipeline
    (``LtxPipeline.mark_rope_presplit()``) so dispatch refuses non-packed
    fallbacks (the permuted q/k are wrong for the interleaved rotation).
    """
    from .transformer import quantize_w8_np

    def q_leaf(w):
        q8, sc = quantize_w8_np(w, qblock)
        return {"w8": q8, "w8_scale": sc}

    return _transformer_params_quant_from_state_dict(
        sd, cfg, dtype, rope_split, q_leaf
    )


def transformer_params_w4_from_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: LtxTransformerConfig,
    dtype=jnp.bfloat16,
    qblock: int = 32,
    scale_dtype="bfloat16",
    rope_split: bool = False,
):
    """Diffusers-layout state dict → weight-only-int4 (W4A16) stacked tree.

    The 13B-plus-resident-T5 loader: same host-side streaming shape as the
    W8A16 one, but block linears are packed to 4-bit affine group-``qblock``
    (GGUF Q4_K's dequant form; ops/pallas/int4_weight_matmul.py).  At the
    default bf16 scale/min the device tree is ~5 bits/weight ≈ 8.1 GiB at
    13B, leaving room for the int8 T5-XXL to stay resident.  Same
    ``rope_split`` contract as the W8 loader."""
    from ...ops.pallas.int4_weight_matmul import quantize_int4_blockwise

    def q_leaf(w):
        p, s, m = quantize_int4_blockwise(w, qblock, scale_dtype=scale_dtype)
        return {"w4": p, "w4_scale": s, "w4_min": m}

    return _transformer_params_quant_from_state_dict(
        sd, cfg, dtype, rope_split, q_leaf
    )


def _transformer_params_quant_from_state_dict(sd, cfg, dtype, rope_split,
                                              q_leaf):
    """Shared streaming-quantizing loader body: quantize per layer straight
    off the (mmap-backed) state dict via ``q_leaf(w[K, N]) -> leaf dict``,
    stack, upload.  Neither host RAM nor the device ever holds the BF16
    block tree."""
    from ...ops.rope import rope_split_permutation

    L = cfg.num_layers
    perm = np.asarray(rope_split_permutation(cfg.inner_dim)) if rope_split else None

    def q_lin_stacked(path_fmt, permute=False):
        """Stack one block-linear over layers, quantizing per layer."""
        per = []
        has_bias = path_fmt.format(0) + ".bias" in sd
        bias = np.empty((L, np.asarray(sd[path_fmt.format(0) + ".weight"]).shape[0]),
                        np.float32) if has_bias else None
        for i in range(L):
            w = np.ascontiguousarray(sd[path_fmt.format(i) + ".weight"].T)
            if permute and perm is not None:
                w = w[:, perm]
            per.append(q_leaf(w))
            if has_bias:
                b = np.asarray(sd[path_fmt.format(i) + ".bias"], np.float32)
                bias[i] = b[perm] if (permute and perm is not None) else b
        out = {key: jnp.asarray(np.stack([p[key] for p in per]))
               for key in per[0]}
        if has_bias:
            out["bias"] = jnp.asarray(bias, dtype)
        return out

    def vec_stacked(path_fmt, permute=False):
        vs = np.stack([np.asarray(sd[path_fmt.format(i)]) for i in range(L)])
        if permute and perm is not None:
            vs = vs[..., perm]
        return jnp.asarray(vs, dtype)

    def attn(name, q_k_permuted):
        pre = "transformer_blocks.{}." + name
        return {
            "norm_q": {"weight": vec_stacked(pre + ".norm_q.weight", q_k_permuted)},
            "norm_k": {"weight": vec_stacked(pre + ".norm_k.weight", q_k_permuted)},
            "to_q": q_lin_stacked(pre + ".to_q", q_k_permuted),
            "to_k": q_lin_stacked(pre + ".to_k", q_k_permuted),
            "to_v": q_lin_stacked(pre + ".to_v"),
            "to_out": q_lin_stacked(pre + ".to_out.0"),
        }

    blocks = {
        "attn1": attn("attn1", rope_split),
        "attn2": attn("attn2", False),
        "ff": {
            "net_0_proj": q_lin_stacked("transformer_blocks.{}.ff.net.0.proj"),
            "net_2": q_lin_stacked("transformer_blocks.{}.ff.net.2"),
        },
        "scale_shift_table": vec_stacked("transformer_blocks.{}.scale_shift_table"),
    }
    top = _transformer_top_level(sd, dtype)
    top["blocks"] = blocks
    return top


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Convenience for tests: torch module.state_dict() → numpy dict."""
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _conv3d(sd, prefix, dtype, required=True):
    """CausalConv3d params; torch [O,I,kt,kh,kw] layout kept as-is."""
    wkey = f"{prefix}.conv.weight"
    if wkey not in sd:
        if required:
            raise LoaderError(f"missing tensor {wkey}")
        return None
    p = {"weight": jnp.asarray(sd[wkey], dtype)}
    bkey = f"{prefix}.conv.bias"
    if bkey in sd:
        p["bias"] = jnp.asarray(sd[bkey], dtype)
    return p


def _time_embedder_params(sd, prefix, dtype):
    l1 = _lin(sd, f"{prefix}.timestep_embedder.linear_1", dtype, required=False)
    if l1 is None:
        return None
    return {
        "linear_1": l1,
        "linear_2": _lin(sd, f"{prefix}.timestep_embedder.linear_2", dtype),
    }


def _resnet_params(sd, prefix, dtype):
    p = {
        "conv1": _conv3d(sd, f"{prefix}.conv1", dtype),
        "conv2": _conv3d(sd, f"{prefix}.conv2", dtype),
    }
    cs = _conv3d(sd, f"{prefix}.conv_shortcut", dtype, required=False)
    if cs is not None:
        p["conv_shortcut"] = cs
        norm3 = {}
        if f"{prefix}.norm3.weight" in sd:
            norm3["weight"] = _vec(sd, f"{prefix}.norm3.weight", dtype)
        if f"{prefix}.norm3.bias" in sd:
            norm3["bias"] = _vec(sd, f"{prefix}.norm3.bias", dtype)
        if norm3:
            p["norm3"] = norm3
    if f"{prefix}.scale_shift_table" in sd:
        p["scale_shift_table"] = _vec(sd, f"{prefix}.scale_shift_table", dtype)
    for name in ("per_channel_scale1", "per_channel_scale2"):
        for key in (f"{prefix}.{name}", f"{prefix}.{name}.weight"):
            if key in sd:
                p[name] = jnp.asarray(sd[key], dtype)
                break
    return p


def _count_resnets(sd: Dict[str, np.ndarray], prefix: str) -> int:
    n = 0
    while f"{prefix}.resnets.{n}.conv1.conv.weight" in sd:
        n += 1
    return n


def vae_params_from_state_dict(sd: Dict[str, np.ndarray], dtype=jnp.bfloat16):
    """Diffusers-layout LTX VAE state dict → pytree.

    Structure (block/resnet counts) is discovered from the keys so the same
    loader covers 0.9.5–0.9.8 checkpoints.
    """

    def block_list(section, kind):
        blocks = []
        i = 0
        while True:
            pre = f"{section}.{kind}.{i}"
            if f"{pre}.resnets.0.conv1.conv.weight" not in sd and (
                f"{pre}.upsamplers.0.conv.conv.weight" not in sd
                and f"{pre}.downsamplers.0.conv.conv.weight" not in sd
            ):
                break
            blk: dict = {
                "resnets": [
                    _resnet_params(sd, f"{pre}.resnets.{j}", dtype)
                    for j in range(_count_resnets(sd, pre))
                ]
            }
            ds = _conv3d(sd, f"{pre}.downsamplers.0.conv", dtype, required=False)
            if ds is not None:
                blk["downsamplers"] = [{"conv": ds}]
            us = _conv3d(sd, f"{pre}.upsamplers.0.conv", dtype, required=False)
            if us is not None:
                blk["upsamplers"] = [{"conv": us}]
            te = _time_embedder_params(sd, f"{pre}.time_embedder", dtype)
            if te is not None:
                blk["time_embedder"] = te
            blocks.append(blk)
            i += 1
        return blocks

    def mid(section):
        pre = f"{section}.mid_block"
        blk = {
            "resnets": [
                _resnet_params(sd, f"{pre}.resnets.{j}", dtype)
                for j in range(_count_resnets(sd, pre))
            ]
        }
        te = _time_embedder_params(sd, f"{pre}.time_embedder", dtype)
        if te is not None:
            blk["time_embedder"] = te
        return blk

    encoder = {
        "conv_in": _conv3d(sd, "encoder.conv_in", dtype),
        "down_blocks": block_list("encoder", "down_blocks"),
        "mid_block": mid("encoder"),
        "conv_out": _conv3d(sd, "encoder.conv_out", dtype),
    }
    if "encoder.norm_out.weight" in sd:
        encoder["norm_out"] = {"weight": _vec(sd, "encoder.norm_out.weight", dtype)}

    decoder = {
        "conv_in": _conv3d(sd, "decoder.conv_in", dtype),
        "mid_block": mid("decoder"),
        "up_blocks": block_list("decoder", "up_blocks"),
        "conv_out": _conv3d(sd, "decoder.conv_out", dtype),
    }
    te = _time_embedder_params(sd, "decoder.time_embedder", dtype)
    if te is not None:
        decoder["time_embedder"] = te
    if "decoder.scale_shift_table" in sd:
        decoder["scale_shift_table"] = _vec(sd, "decoder.scale_shift_table", dtype)
    if "decoder.timestep_scale_multiplier" in sd:
        decoder["timestep_scale_multiplier"] = jnp.asarray(
            sd["decoder.timestep_scale_multiplier"], jnp.float32
        )

    params = {"encoder": encoder, "decoder": decoder}
    # latents stats live inside the VAE file (vae.rs:1827-1838)
    for name in ("latents_mean", "latents_std"):
        if name in sd:
            params[name] = jnp.asarray(sd[name], jnp.float32)
    return params
