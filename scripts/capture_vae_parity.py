"""Capture diffusers AutoencoderKLLTXVideo outputs (tiny + optional full).

Mirrors the reference's scripts/capture_vae_parity.py / gen_vae_ref.py
(consumed by tests/verify_vae_parity.rs, verify_vae_decode_parity.rs): a
tiny randomly-initialized REAL diffusers VAE runs encode + timestep-
conditioned decode on fixed inputs; weights + inputs + outputs are dumped
for the JAX side to assert MSE < 1e-3 (the reference's envelope,
docs/benchmark_results.md:103).

Emits fixtures/vae_diffusers.safetensors.  With a local VAE checkpoint
(env LTX_VAE_DIR) also emits fixtures/vae_full_diffusers.safetensors
incl. the in-file latents_mean/std statistics (vae.rs:1827-1838).
Skips cleanly when diffusers is absent.
"""

from __future__ import annotations

import inspect
import os

import numpy as np

from capture_common import require_diffusers, save, state_dict_numpy

require_diffusers("capture_vae_parity")

import torch  # noqa: E402
from diffusers import AutoencoderKLLTXVideo  # noqa: E402


# The JAX-side tiny config (tests/test_diffusers_fixtures.py), spelled in
# diffusers constructor names.  Filtered against the installed version's
# signature so minor renames across releases don't break the capture.
TINY = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=(8, 16, 32),
    decoder_block_out_channels=(8, 16),
    spatio_temporal_scaling=(True, True),
    decoder_spatio_temporal_scaling=(True, True),
    layers_per_block=(1, 1, 2),
    decoder_layers_per_block=(1, 1, 1),
    patch_size=2,
    patch_size_t=1,
    downsample_type=("spatiotemporal", "spatiotemporal"),
    upsample_residual=(True, True),
    upsample_factor=(2, 2),
    timestep_conditioning=True,
    encoder_causal=True,
    decoder_causal=False,
    resnet_norm_eps=1e-6,
    scaling_factor=1.0,
    spatial_compression_ratio=8,
    temporal_compression_ratio=4,
)


def build_tiny():
    sig = inspect.signature(AutoencoderKLLTXVideo.__init__)
    accepted = {k: v for k, v in TINY.items() if k in sig.parameters}
    dropped = sorted(set(TINY) - set(accepted))
    if dropped:
        print(f"note: installed diffusers does not accept {dropped} — "
              "needs diffusers>=0.33 for exact parity")
    return AutoencoderKLLTXVideo(**accepted)


def capture_tiny():
    torch.manual_seed(0)
    vae = build_tiny().eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    z = rng.normal(size=(1, 4, 2, 2, 2)).astype(np.float32)
    temb = np.array([0.05], np.float32)

    with torch.no_grad():
        moments = vae.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
        dec = vae.decode(torch.from_numpy(z), torch.from_numpy(temb),
                         return_dict=False)[0].numpy()

    tensors = {
        "enc_input": x, "enc_output": moments,
        "dec_input": z, "dec_temb": temb, "dec_output": dec,
    }
    tensors.update(state_dict_numpy(vae))
    save("vae_diffusers.safetensors", tensors)


def capture_full():
    """Real-checkpoint capture (reference Tier-4, vae_reference_test.rs)."""
    model_dir = os.environ.get("LTX_VAE_DIR", "")
    if not model_dir or not os.path.isdir(model_dir):
        print("LTX_VAE_DIR not set/found — skipping full-VAE capture")
        return
    vae = AutoencoderKLLTXVideo.from_pretrained(
        model_dir, torch_dtype=torch.float32
    ).eval()
    rng = np.random.default_rng(1)
    z = (rng.normal(size=(1, vae.config.latent_channels, 2, 4, 4)) * 0.3
         ).astype(np.float32)
    temb = np.array([0.05], np.float32)
    with torch.no_grad():
        dec = vae.decode(torch.from_numpy(z), torch.from_numpy(temb),
                         return_dict=False)[0].float().numpy()
    out = {"dec_input": z, "dec_temb": temb, "dec_output": dec}
    if getattr(vae, "latents_mean", None) is not None:
        out["latents_mean"] = vae.latents_mean.float().numpy()
        out["latents_std"] = vae.latents_std.float().numpy()
    save("vae_full_diffusers.safetensors", out)


if __name__ == "__main__":
    capture_tiny()
    capture_full()
