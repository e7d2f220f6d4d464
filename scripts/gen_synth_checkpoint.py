"""Generate a FULL-SIZE synthetic official unified checkpoint.

Real 2B tensor names and shapes (28 layers, d=2048, full 3D VAE) in BF16,
one safetensors file ~4.8 GiB — the same layout as the official
ltxv-2b-0.9.8-distilled.safetensors the reference's CLI splits via its
KeyRemapper (examples/ltx-video/main.rs:461-522, weight_format.rs:55-143).
Zero-egress environments can't fetch real weights; this exercises the
full-scale weight path (names, shapes, dtype, file size) end to end.

Usage: python scripts/gen_synth_checkpoint.py --out /tmp/ltxv-2b-synth.safetensors
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from officialize import officialize_transformer_key, officialize_vae_key  # noqa: E402

FULL_VAE_CFG = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=128,
    block_out_channels=[128, 256, 512, 1024, 2048],
    decoder_block_out_channels=[256, 512, 1024],
    spatiotemporal_scaling=[True, True, True, True],
    decoder_spatiotemporal_scaling=[True, True, True],
    layers_per_block=[4, 6, 6, 2, 2],
    decoder_layers_per_block=[5, 5, 5, 5],
    patch_size=4,
    patch_size_t=1,
    timestep_conditioning=True,
    decoder_causal=False,
    decoder_upsample_residual=[True, True, True],
    decoder_upsample_factor=[2, 2, 2],
    downsample_types=["spatial", "temporal", "spatiotemporal", "spatiotemporal"],
    spatial_compression_ratio=32,
    temporal_compression_ratio=8,
)


def build_unified_state_dict(seed: int = 0, dtype="bfloat16"):
    import ml_dtypes
    import torch

    import torch_ltx
    import torch_ltx_vae as tv

    np_dtype = {"bfloat16": ml_dtypes.bfloat16, "float32": np.float32}[dtype]
    torch.manual_seed(seed)

    def convert(sd, officialize):
        out = {}
        for k, v in sd.items():
            arr = np.asarray(v.detach().to(torch.float32).numpy() * 0.02)
            out[officialize(k)] = arr.astype(np_dtype)
        return out

    unified = {}
    with torch.no_grad():
        dit = torch_ltx.LtxTransformer3D()  # defaults ARE the 2B config
        unified.update(convert(dit.state_dict(), officialize_transformer_key))
        del dit
        enc = tv.Encoder3d(FULL_VAE_CFG)
        unified.update(
            convert(enc.state_dict(), lambda k: officialize_vae_key("encoder." + k))
        )
        del enc
        dec = tv.Decoder3d(FULL_VAE_CFG)
        unified.update(
            convert(dec.state_dict(), lambda k: officialize_vae_key("decoder." + k))
        )
        del dec
    unified["vae.per_channel_statistics.mean-of-means"] = np.zeros(
        128, np_dtype
    )
    unified["vae.per_channel_statistics.std-of-means"] = np.ones(128, np_dtype)
    return unified


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from safetensors.numpy import save_file

    t0 = time.time()
    unified = build_unified_state_dict(args.seed, args.dtype)
    n_params = sum(int(np.prod(v.shape)) for v in unified.values())
    nbytes = sum(v.nbytes for v in unified.values())
    save_file(unified, args.out)
    print(
        f"wrote {args.out}: {len(unified)} tensors, {n_params/1e9:.2f}B params, "
        f"{nbytes/2**30:.2f} GiB, {time.time()-t0:.0f}s"
    )


if __name__ == "__main__":
    main()
