"""SVD image-to-video pipeline.

Parity target: src/models/svd/pipeline.rs:105-340 — CLIP image conditioning,
noise-augmented VAE image latents concatenated on the channel axis (8-ch UNet
input), per-frame linear guidance-scale ramp, v-prediction Euler loop with
``scale_model_input``, chunked temporal-VAE decode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import clip as CLIP
from . import scheduler as ES
from . import unet as UNET
from . import vae as SV
from .configs import SvdConfig


@dataclasses.dataclass(frozen=True)
class SvdInferenceConfig:
    """pipeline.rs SvdInferenceConfig surface."""

    num_frames: int = 14
    num_inference_steps: int = 25
    fps: int = 7
    motion_bucket_id: int = 127
    noise_aug_strength: float = 0.02
    min_guidance_scale: float = 1.0
    max_guidance_scale: float = 3.0
    decode_chunk_size: Optional[int] = None
    seed: int = 42


@dataclasses.dataclass
class SvdPipeline:
    config: SvdConfig
    unet_params: Any
    vae_params: Any = None
    clip_params: Any = None


def generate(pipe: SvdPipeline, image, inference: Optional[SvdInferenceConfig] = None,
             image_embeddings=None, output_type: str = "tensor"):
    """image [B,3,H,W] in [-1,1] -> video [B*F, 3, H, W] in [-1,1]
    (or latents with output_type='latent')."""
    inf = inference or SvdInferenceConfig()
    cfg = pipe.config
    b, _, height, width = image.shape
    f = inf.num_frames
    key = jax.random.PRNGKey(inf.seed)

    # 1. CLIP image embeddings [B,1,1024] -> per-frame [B*F,1,D]
    if image_embeddings is None:
        clip_in = jax.image.resize(
            (image + 1.0) / 2.0,
            (b, 3, cfg.clip.image_size, cfg.clip.image_size),
            method="bilinear",
        )
        clip_in = CLIP.normalize_for_clip(clip_in)
        image_embeddings = CLIP.forward(pipe.clip_params, cfg.clip, clip_in)[:, None]
    emb = jnp.repeat(image_embeddings, f, axis=0)  # [B*F, 1, D]

    # 2. VAE-encode the (noise-augmented) conditioning image
    key, k1, k2 = jax.random.split(key, 3)
    image_aug = image + jax.random.normal(k1, image.shape, image.dtype) * inf.noise_aug_strength
    image_latents = SV.encode_to_latent(pipe.vae_params, cfg.vae, image_aug)
    # conditioning latents are NOT scaled in diffusers SVD: undo the scaling
    image_latents = image_latents / cfg.vae.scaling_factor
    image_cond = jnp.repeat(image_latents, f, axis=0)  # [B*F, 4, h, w]

    # 3. schedule + initial noise (latent size from the actual VAE output)
    schedule = ES.set_timesteps(cfg.scheduler, inf.num_inference_steps)
    lat_shape = (b * f, cfg.vae.latent_channels) + image_latents.shape[2:]
    latents = jax.random.normal(k2, lat_shape, jnp.float32) * schedule.init_noise_sigma

    # 4. added time ids (fps-1 conditioning, pipeline.rs:165-171)
    ids = jnp.asarray(
        [[inf.fps - 1, inf.motion_bucket_id, inf.noise_aug_strength]] * b, jnp.float32
    )

    # 5. per-frame guidance ramp (pipeline.rs:189-211)
    g = np.linspace(inf.min_guidance_scale, inf.max_guidance_scale, f, dtype=np.float32)
    guidance = jnp.asarray(np.tile(g, b)).reshape(b * f, 1, 1, 1)
    do_cfg = inf.max_guidance_scale > 1.0

    import functools

    unet = jax.jit(
        functools.partial(UNET.forward, cfg=cfg.unet, num_frames=f),
        static_argnames=(),
    )

    for i in range(len(schedule.timesteps)):
        sigma = float(schedule.sigmas[i])
        sigma_next = float(schedule.sigmas[i + 1])
        t = jnp.asarray([schedule.timesteps[i]], jnp.float32)

        scaled = ES.scale_model_input(latents, sigma)
        if do_cfg:
            lat_in = jnp.concatenate(
                [
                    jnp.concatenate([scaled, jnp.zeros_like(image_cond)], axis=1),
                    jnp.concatenate([scaled, image_cond], axis=1),
                ],
                axis=0,
            )
            emb_in = jnp.concatenate([jnp.zeros_like(emb), emb], axis=0)
            ids_in = jnp.concatenate([ids, ids], axis=0)
            pred = unet(pipe.unet_params, sample=lat_in, timestep=t,
                        encoder_hidden_states=emb_in, added_time_ids=ids_in)
            uncond, cond = jnp.split(pred, 2, axis=0)
            noise_pred = uncond + guidance * (cond - uncond)
        else:
            lat_in = jnp.concatenate([scaled, image_cond], axis=1)
            noise_pred = unet(pipe.unet_params, sample=lat_in, timestep=t,
                              encoder_hidden_states=emb, added_time_ids=ids)

        latents, _ = ES.step(latents, noise_pred, sigma, sigma_next,
                             cfg.scheduler.prediction_type)

    if output_type == "latent":
        return latents

    return SV.decode(pipe.vae_params, cfg.vae, latents, f,
                     chunk_size=inf.decode_chunk_size)
