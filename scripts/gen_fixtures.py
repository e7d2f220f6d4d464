"""Golden-fixture generator — the reference's capture_*/gen_*_ref.py role.

Runs the independent torch mirrors on fixed seeds and dumps inputs + outputs
(+ state dicts) to safetensors fixtures under ``fixtures/``.  The test-suite
(tests/test_fixtures.py) loads them when present and skips gracefully when
absent — the reference's Tier-2 pattern (tests/verify_dit_parity.rs:14-17).

Usage: python scripts/gen_fixtures.py [--out fixtures/]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import torch

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))  # repo root for candle_video_tpu

from safetensors.numpy import save_file  # noqa: E402


def _sd(module, prefix=""):
    return {
        f"{prefix}{k}": v.detach().cpu().numpy().astype(np.float32)
        for k, v in module.state_dict().items()
    }


def gen_dit(out_dir):
    import torch_ltx

    torch.manual_seed(0)
    model = torch_ltx.LtxTransformer3D(
        in_channels=8, out_channels=8, heads=2, dim_head=12,
        cross_attention_dim=24, num_layers=2, caption_channels=16,
    ).eval()
    rng = np.random.default_rng(0)
    f, h, w = 2, 3, 4
    s = f * h * w
    hidden = rng.normal(size=(2, s, 8)).astype(np.float32)
    enc = rng.normal(size=(2, 5, 16)).astype(np.float32)
    t = np.full((2,), 500.0, np.float32)
    mask = np.ones((2, 5), np.float32)
    from candle_video_tpu.ops.rope import video_coords_grid

    coords = np.broadcast_to(video_coords_grid(f, h, w)[None], (2, s, 3)).copy()
    with torch.no_grad():
        out = model(
            torch.from_numpy(hidden), torch.from_numpy(enc), torch.from_numpy(t),
            torch.from_numpy(coords), torch.from_numpy(mask),
        ).numpy()
    tensors = {
        "hidden_states": hidden, "encoder_hidden_states": enc, "timestep": t,
        "attention_mask": mask, "video_coords": coords, "output": out,
    }
    tensors.update(_sd(model, "weights."))
    save_file(tensors, os.path.join(out_dir, "dit_parity.safetensors"))


def gen_vae(out_dir):
    import torch_ltx_vae as tv

    torch.manual_seed(0)
    cfgd = dict(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=[8, 16, 32], decoder_block_out_channels=[8, 16],
        spatiotemporal_scaling=[True, True],
        decoder_spatiotemporal_scaling=[True, True],
        layers_per_block=[1, 1, 2], decoder_layers_per_block=[1, 1, 1],
        patch_size=2, patch_size_t=1,
        downsample_types=["spatiotemporal", "spatiotemporal"],
        decoder_upsample_residual=[True, True], decoder_upsample_factor=[2, 2],
        timestep_conditioning=True, decoder_causal=False,
        spatial_compression_ratio=8, temporal_compression_ratio=4,
    )
    enc = tv.Encoder3d(cfgd).eval()
    dec = tv.Decoder3d(cfgd).eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    z = rng.normal(size=(1, 4, 2, 2, 2)).astype(np.float32)
    temb = np.array([0.05], np.float32)
    with torch.no_grad():
        moments = enc(torch.from_numpy(x)).numpy()
        video = dec(torch.from_numpy(z), torch.from_numpy(temb)).numpy()
    tensors = {
        "enc_input": x, "enc_output": moments,
        "dec_input": z, "dec_temb": temb, "dec_output": video,
    }
    tensors.update(_sd(enc, "weights.encoder."))
    tensors.update(_sd(dec, "weights.decoder."))
    save_file(tensors, os.path.join(out_dir, "vae_parity.safetensors"))


def gen_t5(out_dir):
    from transformers import T5Config as HFT5Config, T5EncoderModel

    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=48, num_layers=3, num_heads=4,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        is_encoder_decoder=False, use_cache=False,
    )
    model = T5EncoderModel(hf_cfg).eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 17)).astype(np.int32)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids).long()).last_hidden_state.numpy()
    tensors = {"input_ids": ids, "output": out}
    tensors.update(_sd(model, "weights."))
    save_file(tensors, os.path.join(out_dir, "t5_parity.safetensors"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixtures")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    gen_dit(args.out)
    gen_vae(args.out)
    gen_t5(args.out)
    print(f"fixtures written to {args.out}/")


if __name__ == "__main__":
    main()
