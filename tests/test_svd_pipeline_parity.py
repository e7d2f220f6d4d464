"""SVD pipeline end-to-end parity vs a composed torch mirror.

Verifies the generate() wiring — conditioning concat order, per-frame
guidance ramp, scale_model_input, v-prediction Euler steps — against an
independent torch composition from identical noise (pipeline.rs:105-340
semantics)."""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import torch_svd  # noqa: E402
import torch_svd_vae as tvv  # noqa: E402

from candle_video_tpu.models.svd import pipeline as SP  # noqa: E402
from candle_video_tpu.models.svd import scheduler as ES  # noqa: E402
from candle_video_tpu.models.svd import vae as SV  # noqa: E402
from candle_video_tpu.models.svd.configs import (  # noqa: E402
    EulerSchedulerConfig,
    SvdConfig,
    SvdUnetConfig,
    SvdVaeConfig,
)
from candle_video_tpu.models.svd.loader import unet_params_from_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    unet_t = torch_svd.UNetSpatioTemporal(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        layers_per_block=1, cross_dim=16, heads=(2, 4), addition_time_embed_dim=8,
    ).eval()
    vae_t = tvv.AutoencoderKLTemporalDecoder(boc=(32, 64), latent=4, layers=1).eval()
    cfg = SvdConfig(
        unet=SvdUnetConfig(in_channels=8, out_channels=4,
                           block_out_channels=(32, 64), layers_per_block=1,
                           cross_attention_dim=16, num_attention_heads=(2, 4),
                           addition_time_embed_dim=8),
        vae=SvdVaeConfig(block_out_channels=(32, 64), latent_channels=4,
                         layers_per_block=1),
        scheduler=EulerSchedulerConfig(),
    )
    unet_params = unet_params_from_state_dict(
        {k: v.numpy() for k, v in unet_t.state_dict().items()}, jnp.float32
    )
    vae_params = SV.vae_params_from_state_dict(
        {k: v.numpy() for k, v in vae_t.state_dict().items()}, jnp.float32
    )
    return unet_t, vae_t, cfg, unet_params, vae_params


def test_svd_generate_matches_torch_composition(models, rng):
    unet_t, vae_t, cfg, unet_params, vae_params = models
    f = 3
    inf = SP.SvdInferenceConfig(
        num_frames=f, num_inference_steps=3, fps=7, motion_bucket_id=127,
        noise_aug_strength=0.02, min_guidance_scale=1.0, max_guidance_scale=2.5,
        seed=11,
    )
    image = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 16, 16)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 1, 16)) * 0.3, jnp.float32)

    # --- replicate the JAX pipeline's RNG stream exactly -------------------
    key = jax.random.PRNGKey(inf.seed)
    key, k1, k2 = jax.random.split(key, 3)
    image_aug = image + jax.random.normal(k1, image.shape) * inf.noise_aug_strength
    # conditioning latents: encode mode (deterministic), unscaled
    image_latents = SV.encode_to_latent(vae_params, cfg.vae, image_aug)
    image_latents = image_latents / cfg.vae.scaling_factor
    schedule = ES.set_timesteps(cfg.scheduler, inf.num_inference_steps)
    lat0 = jax.random.normal(
        k2, (f, 4) + image_latents.shape[2:], jnp.float32
    ) * schedule.init_noise_sigma

    # --- torch mirror loop ---------------------------------------------------
    lat_t = torch.from_numpy(np.asarray(lat0))
    cond_t = torch.from_numpy(np.asarray(jnp.repeat(image_latents, f, axis=0)))
    emb_t = torch.from_numpy(np.asarray(jnp.repeat(emb, f, axis=0)))
    ids_t = torch.tensor([[inf.fps - 1, inf.motion_bucket_id,
                           inf.noise_aug_strength]], dtype=torch.float32)
    g = np.linspace(inf.min_guidance_scale, inf.max_guidance_scale, f,
                    dtype=np.float32)
    g_t = torch.from_numpy(g).view(f, 1, 1, 1)

    with torch.no_grad():
        for i in range(3):
            sigma = float(schedule.sigmas[i])
            sigma_next = float(schedule.sigmas[i + 1])
            t = torch.full((1,), float(schedule.timesteps[i]))
            scaled = lat_t / float(np.sqrt(sigma**2 + 1.0))
            uncond = unet_t(torch.cat([scaled, torch.zeros_like(cond_t)], dim=1),
                            t, torch.zeros_like(emb_t), ids_t, f).float()
            cond = unet_t(torch.cat([scaled, cond_t], dim=1),
                          t, emb_t, ids_t, f).float()
            pred = uncond + g_t * (cond - uncond)
            # v-prediction Euler
            s2p1 = sigma**2 + 1.0
            x0 = pred * (-sigma / np.sqrt(s2p1)) + lat_t * (1.0 / s2p1)
            lat_t = lat_t + (sigma_next - sigma) * (lat_t - x0) / sigma

    ref = lat_t.numpy()

    pipe = SP.SvdPipeline(config=cfg, unet_params=unet_params,
                          vae_params=vae_params)
    got = np.asarray(
        SP.generate(pipe, image, inf, image_embeddings=emb, output_type="latent")
    )
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-3
    assert np.mean((got - ref) ** 2) < 1e-8
