"""Generate a FULL-SIZE synthetic SVD checkpoint directory.

Real SVD (stable-video-diffusion-img2vid) tensor names and shapes in BF16,
written in the diffusers directory layout the SVD CLI consumes
(unet/ vae/ image_encoder/) — the same layout the reference's SVD weight
loader splits by prefix (src/models/svd/weights.rs:48-136).  Zero-egress
environments can't fetch real weights; this exercises the full-scale SVD
weight path (names, shapes, dtype, ~3.5 GiB total) end to end:

    python scripts/gen_synth_checkpoint_svd.py --out /tmp/svd-synth
    CVT_FULL_CHECKPOINT_SVD=/tmp/svd-synth \
        python -m pytest tests/test_full_checkpoint_svd.py -v -s

Full config (UNetSpatioTemporalConditionModel of SVD): block_out_channels
(320, 640, 1280, 1280), layers_per_block 2, cross_attention_dim 1024,
heads (5, 10, 20, 20); temporal-decoder VAE (128, 256, 512, 512) x2;
CLIP ViT-H/14 vision tower (1280 wide, 32 layers, projection 1024).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _convert(sd, np_dtype, scale=0.02):
    import torch

    out = {}
    for k, v in sd.items():
        arr = np.asarray(v.detach().to(torch.float32).numpy()) * scale
        out[k] = arr.astype(np_dtype)
    return out


def build(out_dir: str, dtype: str = "bfloat16", seed: int = 0):
    import ml_dtypes
    import torch

    import torch_svd
    import torch_svd_vae

    from safetensors.numpy import save_file

    np_dtype = {"bfloat16": ml_dtypes.bfloat16, "float32": np.float32}[dtype]
    torch.manual_seed(seed)
    total = 0

    def write(sub, name, tensors):
        nonlocal total
        path = os.path.join(out_dir, sub)
        os.makedirs(path, exist_ok=True)
        save_file(tensors, os.path.join(path, name))
        nbytes = sum(v.nbytes for v in tensors.values())
        total += nbytes
        print(f"  {sub}/{name}: {len(tensors)} tensors, {nbytes/2**30:.2f} GiB")

    with torch.no_grad():
        unet = torch_svd.UNetSpatioTemporal(
            in_channels=8, out_channels=4,
            block_out_channels=(320, 640, 1280, 1280),
            layers_per_block=2, cross_dim=1024, heads=(5, 10, 20, 20),
            addition_time_embed_dim=256,
        )
        write("unet", "diffusion_pytorch_model.safetensors",
              _convert(unet.state_dict(), np_dtype))
        del unet

        vae = torch_svd_vae.AutoencoderKLTemporalDecoder(
            boc=(128, 256, 512, 512), latent=4, layers=2
        )
        write("vae", "diffusion_pytorch_model.safetensors",
              _convert(vae.state_dict(), np_dtype))
        del vae

    # CLIP ViT-H/14 vision tower via HF transformers (random init, real names)
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    clip_cfg = CLIPVisionConfig(
        hidden_size=1280, intermediate_size=5120, num_hidden_layers=32,
        num_attention_heads=16, image_size=224, patch_size=14,
        projection_dim=1024,
    )
    clip = CLIPVisionModelWithProjection(clip_cfg).eval()
    with __import__("torch").no_grad():
        write("image_encoder", "model.safetensors",
              _convert(clip.state_dict(), np_dtype, scale=1.0))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    t0 = time.time()
    total = build(args.out, args.dtype, args.seed)
    print(f"wrote {args.out}: {total/2**30:.2f} GiB total, {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
