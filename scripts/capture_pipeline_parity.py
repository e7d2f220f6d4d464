"""Capture a full diffusers LTXPipeline run (real checkpoint, Tier-4).

Mirrors the reference's scripts/capture_pipeline_parity.py (consumed by
tests/verify_pipeline_parity.rs: final video PSNR > 35 dB, per-step latent
MSE < 1e-3).  Dumps the prompt embeddings, the initial latents, every
intermediate denoised latent, and the final video so the JAX pipeline can
replay the identical generation with injected embeddings + latents.

Requires diffusers AND a local LTX checkpoint:
    LTX_MODEL_DIR=.../Lightricks/LTX-Video-0.9.x python scripts/capture_pipeline_parity.py
Emits fixtures/pipeline_diffusers.safetensors; skips cleanly otherwise.
"""

from __future__ import annotations

import os

import numpy as np

from capture_common import require_diffusers, save

require_diffusers("capture_pipeline_parity")

import torch  # noqa: E402
from diffusers import LTXPipeline  # noqa: E402

HEIGHT = int(os.environ.get("LTX_CAP_HEIGHT", 256))
WIDTH = int(os.environ.get("LTX_CAP_WIDTH", 384))
FRAMES = int(os.environ.get("LTX_CAP_FRAMES", 25))
STEPS = int(os.environ.get("LTX_CAP_STEPS", 7))
PROMPT = os.environ.get("LTX_CAP_PROMPT", "a cat playing piano on stage")


def main():
    model_dir = os.environ.get("LTX_MODEL_DIR", "")
    if not model_dir or not os.path.isdir(model_dir):
        print("LTX_MODEL_DIR not set/found — skipping pipeline capture. "
              "Point it at a local Lightricks/LTX-Video checkout.")
        return

    pipe = LTXPipeline.from_pretrained(model_dir, torch_dtype=torch.float32)
    pipe.to("cuda" if torch.cuda.is_available() else "cpu")

    out = {}

    # prompt embeddings (so the JAX replay skips the tokenizer/T5 entirely)
    emb, mask, neg_emb, neg_mask = pipe.encode_prompt(
        prompt=PROMPT, negative_prompt="", do_classifier_free_guidance=True,
        num_videos_per_prompt=1, max_sequence_length=128,
        device=pipe._execution_device,
    )
    out["prompt_embeds"] = emb.float().cpu().numpy()
    out["prompt_attention_mask"] = mask.float().cpu().numpy()
    out["negative_prompt_embeds"] = neg_emb.float().cpu().numpy()
    out["negative_prompt_attention_mask"] = neg_mask.float().cpu().numpy()

    # fixed initial latents, saved in UNPACKED [B,C,F',H',W'] form —
    # pipeline.generate(latents=...) packs them itself
    tc = pipe.vae_temporal_compression_ratio
    sc = pipe.vae_spatial_compression_ratio
    lat_shape = (
        1, pipe.transformer.config.in_channels,
        (FRAMES - 1) // tc + 1, HEIGHT // sc, WIDTH // sc,
    )
    rng = np.random.default_rng(42)
    init_latents5 = rng.normal(size=lat_shape).astype(np.float32)
    out["initial_latents"] = init_latents5
    packed = pipe._pack_latents(
        torch.from_numpy(init_latents5),
        pipe.transformer_spatial_patch_size,
        pipe.transformer_temporal_patch_size,
    ).to(pipe._execution_device)

    step_latents = []

    def on_step(p, i, t, kwargs):
        step_latents.append(kwargs["latents"].float().cpu().numpy().copy())
        return kwargs

    result = pipe(
        prompt_embeds=emb,
        prompt_attention_mask=mask,
        negative_prompt_embeds=neg_emb,
        negative_prompt_attention_mask=neg_mask,
        height=HEIGHT, width=WIDTH, num_frames=FRAMES,
        num_inference_steps=STEPS,
        latents=packed,
        callback_on_step_end=on_step,
        callback_on_step_end_tensor_inputs=["latents"],
        output_type="np",
    ).frames[0]

    for i, lat in enumerate(step_latents):
        out[f"step_latents_{i}"] = lat
    out["video"] = np.asarray(result, np.float32)  # [F, H, W, 3] in [0,1]
    out["meta"] = np.asarray([HEIGHT, WIDTH, FRAMES, STEPS], np.int64)
    save("pipeline_diffusers.safetensors", out)


if __name__ == "__main__":
    main()
