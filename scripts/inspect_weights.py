"""Checkpoint inspection tools — the reference's debug examples
(examples/debug/: inspect_t5, inspect_vae_weights, list_gguf_tensors,
check_t5_shapes, dump_t5_embeddings).

Usage:
  python scripts/inspect_weights.py list  <file.safetensors|file.gguf>
  python scripts/inspect_weights.py split <unified.safetensors>   # key split preview
  python scripts/inspect_weights.py dump-embeds --t5-gguf F --prompt "..." --out E.safetensors
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def cmd_list(path: str):
    if path.endswith(".gguf"):
        from candle_video_tpu.quant.dequant_np import TYPE_NAMES
        from candle_video_tpu.quant.gguf import GGUFFile

        f = GGUFFile(path)
        print(f"# GGUF: {len(f.tensors)} tensors, metadata keys: {len(f.metadata)}")
        for k, v in sorted(f.metadata.items()):
            print(f"  meta {k} = {str(v)[:80]}")
        for name, info in f.tensors.items():
            tname = TYPE_NAMES.get(info.ggml_type, str(info.ggml_type))
            print(f"  {name}  {info.shape}  {tname}")
        f.close()
    else:
        from candle_video_tpu.models.ltx_video.loader import get_tensor_info

        info = get_tensor_info(path)
        print(f"# safetensors: {len(info)} tensors")
        for name, (shape, dtype) in sorted(info.items()):
            print(f"  {name}  {shape}  {dtype}")


def cmd_split(path: str):
    from candle_video_tpu.models.ltx_video.loader import get_tensor_info
    from candle_video_tpu.models.ltx_video.weight_format import (
        is_transformer_key,
        is_vae_key,
        remap_key,
    )

    info = get_tensor_info(path)
    n_t = n_v = n_o = 0
    for key in sorted(info):
        new = remap_key(key)
        if is_transformer_key(key) and not is_vae_key(key):
            dest, n_t = "transformer", n_t + 1
        elif is_vae_key(key):
            dest, n_v = "vae", n_v + 1
        else:
            dest, n_o = "?", n_o + 1
        print(f"  [{dest:>11}] {key} -> {new}")
    print(f"# transformer: {n_t}, vae: {n_v}, unclassified: {n_o}")


def cmd_dump_embeds(args):
    import jax.numpy as jnp
    import numpy as np
    from safetensors.numpy import save_file

    from candle_video_tpu.models.ltx_video import t5 as T5
    from candle_video_tpu.utils.tokenizer import T5TokenizerWrapper

    params = T5.params_from_gguf(args.t5_gguf)
    tok = T5TokenizerWrapper(args.tokenizer, args.max_length)
    ids, mask = tok.encode_batch([args.prompt], args.max_length)
    emb = T5.forward(params, T5.t5_xxl(), jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask))
    save_file(
        {
            "prompt_embeds": np.asarray(emb, np.float32),
            "prompt_attention_mask": mask.astype(np.float32),
        },
        args.out,
    )
    print(f"saved {args.out}: {emb.shape}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list")
    p_list.add_argument("path")
    p_split = sub.add_parser("split")
    p_split.add_argument("path")
    p_dump = sub.add_parser("dump-embeds")
    p_dump.add_argument("--t5-gguf", required=True)
    p_dump.add_argument("--tokenizer", required=True)
    p_dump.add_argument("--prompt", default="a cat")
    p_dump.add_argument("--max-length", type=int, default=128)
    p_dump.add_argument("--out", default="embeddings.safetensors")
    args = ap.parse_args()
    if args.cmd == "list":
        cmd_list(args.path)
    elif args.cmd == "split":
        cmd_split(args.path)
    else:
        cmd_dump_embeds(args)


if __name__ == "__main__":
    main()
