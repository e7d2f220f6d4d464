"""Capture diffusers LTXVideoTransformer3DModel outputs (tiny + optional full).

Mirrors the reference's scripts/capture_transformer_parity.py /
gen_dit_ref.py (consumed by tests/verify_dit_parity.rs and
verify_rope_parity.rs): a tiny randomly-initialized REAL diffusers
transformer is run on fixed inputs and its weights + inputs + outputs are
dumped.  The JAX side (tests/test_diffusers_fixtures.py) loads the weights
through the production diffusers-format loader and asserts
max-abs < 2e-3 (the reference's envelope, verify_dit_parity.rs:99).

Emits fixtures/dit_diffusers.safetensors.  With a local LTX checkpoint
(env LTX_TRANSFORMER_DIR) also emits fixtures/dit_full_diffusers.safetensors.
Skips cleanly when diffusers is absent.
"""

from __future__ import annotations

import os

import numpy as np

from capture_common import require_diffusers, save, state_dict_numpy

require_diffusers("capture_transformer_parity")

import torch  # noqa: E402
from diffusers.models.transformers.transformer_ltx import (  # noqa: E402
    LTXVideoTransformer3DModel,
)


def capture_tiny():
    torch.manual_seed(0)
    # Matches the JAX-side fixture config (tests/test_diffusers_fixtures.py):
    # 2 heads x 12, cross 24, 2 layers, caption 16 — same tiny shape as the
    # reference's gen_dit_ref.py model.
    model = LTXVideoTransformer3DModel(
        in_channels=8,
        out_channels=8,
        patch_size=1,
        patch_size_t=1,
        num_attention_heads=2,
        attention_head_dim=12,
        cross_attention_dim=24,
        num_layers=2,
        caption_channels=16,
        qk_norm="rms_norm_across_heads",
    ).eval()

    rng = np.random.default_rng(0)
    f, h, w = 2, 3, 4
    s = f * h * w
    hidden = rng.normal(size=(2, s, 8)).astype(np.float32)
    enc = rng.normal(size=(2, 5, 16)).astype(np.float32)
    t = np.full((2,), 500.0, np.float32)
    mask = np.ones((2, 5), np.float32)

    with torch.no_grad():
        out = model(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(enc),
            timestep=torch.from_numpy(t),
            encoder_attention_mask=torch.from_numpy(mask),
            num_frames=f,
            height=h,
            width=w,
            # scale (1,1,1): RoPE coords are the raw (f,h,w) grid indices,
            # which the JAX test reconstructs with video_coords_grid()
            rope_interpolation_scale=(1.0, 1.0, 1.0),
            return_dict=False,
        )[0].numpy()

    tensors = {
        "hidden_states": hidden,
        "encoder_hidden_states": enc,
        "timestep": t,
        "attention_mask": mask,
        "grid_fhw": np.asarray([f, h, w], np.int64),
        "output": out,
    }
    tensors.update(state_dict_numpy(model))
    save("dit_diffusers.safetensors", tensors)


def capture_full():
    """Real-checkpoint capture (reference Tier-4, dit_reference_test.rs)."""
    model_dir = os.environ.get("LTX_TRANSFORMER_DIR", "")
    if not model_dir or not os.path.isdir(model_dir):
        print("LTX_TRANSFORMER_DIR not set/found — skipping full-model capture")
        return
    model = LTXVideoTransformer3DModel.from_pretrained(
        model_dir, torch_dtype=torch.float32
    ).eval()
    rng = np.random.default_rng(1)
    f, h, w = 2, 8, 8
    s = f * h * w
    hidden = rng.normal(size=(1, s, model.config.in_channels)).astype(np.float32)
    enc = (rng.normal(size=(1, 16, model.config.caption_channels)) * 0.05
           ).astype(np.float32)
    t = np.full((1,), 500.0, np.float32)
    mask = np.ones((1, 16), np.float32)
    with torch.no_grad():
        out = model(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(enc),
            timestep=torch.from_numpy(t),
            encoder_attention_mask=torch.from_numpy(mask),
            num_frames=f, height=h, width=w,
            rope_interpolation_scale=(1.0, 1.0, 1.0),
            return_dict=False,
        )[0].numpy()
    save("dit_full_diffusers.safetensors", {
        "hidden_states": hidden, "encoder_hidden_states": enc,
        "timestep": t, "attention_mask": mask,
        "grid_fhw": np.asarray([f, h, w], np.int64), "output": out,
    })


if __name__ == "__main__":
    capture_tiny()
    capture_full()
