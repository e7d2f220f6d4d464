"""Tiny end-to-end SVD image-to-video pipeline test."""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import torch_svd  # noqa: E402
import torch_svd_vae as tvv  # noqa: E402

from candle_video_tpu.models.svd import pipeline as SP  # noqa: E402
from candle_video_tpu.models.svd import vae as SV  # noqa: E402
from candle_video_tpu.models.svd.configs import (  # noqa: E402
    ClipEncoderConfig,
    EulerSchedulerConfig,
    SvdConfig,
    SvdUnetConfig,
    SvdVaeConfig,
)
from candle_video_tpu.models.svd.loader import unet_params_from_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def tiny_svd():
    torch.manual_seed(0)
    unet_t = torch_svd.UNetSpatioTemporal(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        layers_per_block=1, cross_dim=16, heads=(2, 4), addition_time_embed_dim=8,
    ).eval()
    vae_t = tvv.AutoencoderKLTemporalDecoder(boc=(32, 64), latent=4, layers=1).eval()

    cfg = SvdConfig(
        unet=SvdUnetConfig(
            in_channels=8, out_channels=4, block_out_channels=(32, 64),
            layers_per_block=1, cross_attention_dim=16,
            num_attention_heads=(2, 4), addition_time_embed_dim=8,
        ),
        vae=SvdVaeConfig(block_out_channels=(32, 64), latent_channels=4,
                         layers_per_block=1),
        scheduler=EulerSchedulerConfig(),
        clip=ClipEncoderConfig(),
    )
    unet_params = unet_params_from_state_dict(
        {k: v.numpy() for k, v in unet_t.state_dict().items()}, jnp.float32
    )
    vae_params = SV.vae_params_from_state_dict(
        {k: v.numpy() for k, v in vae_t.state_dict().items()}, jnp.float32
    )
    return SP.SvdPipeline(config=cfg, unet_params=unet_params, vae_params=vae_params)


def test_svd_e2e_latent(tiny_svd, rng):
    image = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 16, 16)), jnp.float32)
    # bypass CLIP with precomputed embeddings (cross_dim=16)
    emb = jnp.asarray(rng.normal(size=(1, 1, 16)) * 0.3, jnp.float32)
    inf = SP.SvdInferenceConfig(num_frames=3, num_inference_steps=2)
    lat = SP.generate(tiny_svd, image, inf, image_embeddings=emb,
                      output_type="latent")
    assert lat.shape == (3, 4, 8, 8)  # tiny VAE is 2x spatial
    assert np.isfinite(np.asarray(lat)).all()


def test_svd_e2e_video(tiny_svd, rng):
    image = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 16, 16)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 1, 16)) * 0.3, jnp.float32)
    inf = SP.SvdInferenceConfig(num_frames=3, num_inference_steps=2,
                                max_guidance_scale=1.0)  # no CFG branch
    video = SP.generate(tiny_svd, image, inf, image_embeddings=emb)
    assert video.shape == (3, 3, 16, 16)
    assert np.isfinite(np.asarray(video)).all()


def test_svd_guidance_ramp_changes_frames(tiny_svd, rng):
    image = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 16, 16)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 1, 16)) * 0.3, jnp.float32)
    a = SP.generate(tiny_svd, image,
                    SP.SvdInferenceConfig(num_frames=3, num_inference_steps=2,
                                          max_guidance_scale=1.0),
                    image_embeddings=emb, output_type="latent")
    b = SP.generate(tiny_svd, image,
                    SP.SvdInferenceConfig(num_frames=3, num_inference_steps=2,
                                          max_guidance_scale=3.0),
                    image_embeddings=emb, output_type="latent")
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5
