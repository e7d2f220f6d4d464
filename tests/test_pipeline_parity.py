"""End-to-end pipeline parity: JAX generate() vs a composed torch mirror.

The reference's verify_pipeline_parity targets (final video PSNR > 35 dB,
per-step latent MSE < 1e-3, tests/verify_pipeline_parity.rs header) — here
with tiny random-init models driven through BOTH stacks from identical
initial latents and prompt embeddings.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import torch_ltx  # noqa: E402
import torch_ltx_vae as tv  # noqa: E402

from candle_video_tpu.models.ltx_video import pipeline as P  # noqa: E402
from candle_video_tpu.models.ltx_video import scheduler as S  # noqa: E402
from candle_video_tpu.models.ltx_video import transformer as TF  # noqa: E402
from candle_video_tpu.models.ltx_video import vae as V  # noqa: E402
from candle_video_tpu.models.ltx_video.configs import (  # noqa: E402
    LtxFullConfig,
    LtxInferenceConfig,
)
from candle_video_tpu.models.ltx_video.loader import (  # noqa: E402
    torch_state_dict_to_numpy,
    transformer_params_from_state_dict,
    vae_params_from_state_dict,
)
from candle_video_tpu.models.ltx_video.scheduler import (  # noqa: E402
    FlowMatchEulerSchedulerConfig,
)
from candle_video_tpu.utils.rng import Pcg32  # noqa: E402


TINY_DIT = dict(
    in_channels=4,
    out_channels=4,
    heads=2,
    dim_head=12,
    cross_attention_dim=24,
    num_layers=2,
    caption_channels=16,
)

TINY_VAE = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=[8, 16],
    decoder_block_out_channels=[8, 16],
    spatiotemporal_scaling=[True],
    decoder_spatiotemporal_scaling=[True, True],
    layers_per_block=[1, 2],
    decoder_layers_per_block=[1, 1, 1],
    patch_size=2,
    patch_size_t=1,
    downsample_types=["spatiotemporal"],
    decoder_upsample_residual=[True, True],
    decoder_upsample_factor=[2, 2],
    timestep_conditioning=True,
    decoder_causal=False,
    spatial_compression_ratio=32,
    temporal_compression_ratio=4,
)


def _psnr(a, b, data_range=255.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    dit = torch_ltx.LtxTransformer3D(**TINY_DIT).eval()
    dec = tv.Decoder3d(TINY_VAE).eval()

    tcfg = TF.LtxTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=2,
        caption_channels=16,
    )
    vcfg = V.LtxVaeConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16), decoder_block_out_channels=(8, 16),
        spatiotemporal_scaling=(True,),
        decoder_spatiotemporal_scaling=(True, True),
        layers_per_block=(1, 2), decoder_layers_per_block=(1, 1, 1),
        patch_size=2, patch_size_t=1,
        downsample_types=("spatiotemporal",),
        decoder_upsample_residual=(True, True),
        decoder_upsample_factor=(2, 2),
        timestep_conditioning=True, decoder_causal=False,
        spatial_compression_ratio=32, temporal_compression_ratio=4,
    )

    tparams = transformer_params_from_state_dict(
        torch_state_dict_to_numpy(dit.state_dict()), tcfg, jnp.float32
    )
    vsd = {f"decoder.{k}": v for k, v in torch_state_dict_to_numpy(dec.state_dict()).items()}
    # encoder keys required by the loader are absent; build decoder-only params
    vparams = {
        "decoder": vae_params_from_state_dict(
            {**vsd, "encoder.conv_in.conv.weight": np.zeros((8, 12, 3, 3, 3), np.float32),
             "encoder.conv_in.conv.bias": np.zeros((8,), np.float32),
             "encoder.conv_out.conv.weight": np.zeros((5, 8, 3, 3, 3), np.float32),
             "encoder.conv_out.conv.bias": np.zeros((5,), np.float32)},
            jnp.float32,
        )["decoder"],
        "latents_mean": jnp.asarray(np.linspace(-0.1, 0.1, 4), jnp.float32),
        "latents_std": jnp.asarray(np.linspace(0.9, 1.1, 4), jnp.float32),
    }
    return dit, dec, tcfg, vcfg, tparams, vparams


def _torch_pipeline(dit, dec, schedule, latents5, embeds, mask, coords,
                    guidance_scale, mean, std, decode_t, decode_noise):
    """Composed torch mirror of the denoise + decode path."""
    b, c, f, h, w = latents5.shape
    lat = torch.from_numpy(latents5.reshape(b, c, -1).transpose(0, 2, 1).copy())
    # pack: [B,C,F,H,W] -> [B,S,C] (patch 1)
    emb = torch.from_numpy(embeds)
    msk = torch.from_numpy(mask)
    crd = torch.from_numpy(coords)

    do_cfg = guidance_scale > 1.0
    with torch.no_grad():
        for i in range(len(schedule.timesteps)):
            t = torch.full((b,), float(schedule.timesteps[i]))
            preds = []
            branches = ([torch.zeros_like(emb), emb] if do_cfg else [emb])
            masks = ([torch.ones_like(msk), msk] if do_cfg else [msk])
            for e, m in zip(branches, masks):
                preds.append(dit(lat.float(), e, t, crd, m).float())
            if do_cfg:
                uncond, text = preds
                pred = uncond + guidance_scale * (text - uncond)
            else:
                pred = preds[0]
            dt = float(schedule.sigmas[i + 1] - schedule.sigmas[i])
            lat = lat.float() + dt * pred

        # unpack + denormalize + decode-noise + decode
        lat5 = lat.permute(0, 2, 1).reshape(b, c, f, h, w)
        mean_t = torch.from_numpy(mean).view(1, c, 1, 1, 1)
        std_t = torch.from_numpy(std).view(1, c, 1, 1, 1)
        lat5 = lat5 * std_t + mean_t
        # deterministic: decode_noise = 0 in this test
        video = dec(lat5, torch.full((b,), decode_t))
        video = ((video.clamp(-1, 1) + 1) / 2 * 255.0).clamp(0, 255)
    return lat.numpy(), video.numpy()


def test_pipeline_parity_no_cfg(models):
    dit, dec, tcfg, vcfg, tparams, vparams = models
    _run_parity(models, guidance_scale=1.0)


def test_pipeline_parity_with_cfg(models):
    _run_parity(models, guidance_scale=3.0)


def _run_parity(models, guidance_scale):
    dit, dec, tcfg, vcfg, tparams, vparams = models
    rng = np.random.default_rng(0)

    f, h, w = 2, 2, 3
    lat5 = Pcg32(42, 0).randn((1, 4, f, h, w)).astype(np.float32)
    embeds = (rng.normal(size=(1, 6, 16)) * 0.3).astype(np.float32)
    mask = np.ones((1, 6), np.float32)

    schcfg = FlowMatchEulerSchedulerConfig(
        shift_terminal=0.1, base_shift=0.95, max_shift=2.05,
        base_image_seq_len=1024, max_image_seq_len=4096,
    )
    seq_len = f * h * w
    mu = S.calculate_shift(seq_len, 1024, 4096, 0.95, 2.05)
    # generate() defaults to the reference pipeline's sigma grid
    # linspace(1, 1/N, N) (t2v_pipeline.rs:752-758) — mirror it exactly
    schedule = S.set_timesteps(
        schcfg, num_inference_steps=4,
        sigmas=np.linspace(1.0, 0.25, 4).tolist(), mu=mu,
    )

    coords = P.build_video_coords(f, h, w, 25.0, 4, 32)
    coords_b = np.broadcast_to(coords[None], (1, seq_len, 3)).copy()

    mean = np.asarray(vparams["latents_mean"], np.float32)
    std = np.asarray(vparams["latents_std"], np.float32)

    ref_lat, ref_video = _torch_pipeline(
        dit, dec, schedule, lat5, embeds, mask, coords_b,
        guidance_scale, mean, std, decode_t=0.05, decode_noise=0.0,
    )

    full = LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=guidance_scale, num_inference_steps=4,
            stg_scale=0.0, rescaling_scale=0.0, skip_block_list=(),
            decode_timestep=(0.05,), decode_noise_scale=(0.0,),
        ),
        transformer=tcfg, vae=vcfg, scheduler=schcfg,
    )
    pipe = P.LtxPipeline(
        config=full, transformer_params=tparams, vae_params=vparams,
    )
    got_lat = P.generate(
        pipe,
        prompt_embeds=jnp.asarray(embeds),
        prompt_attention_mask=jnp.asarray(mask),
        negative_prompt_embeds=jnp.asarray(np.zeros_like(embeds)),
        negative_prompt_attention_mask=jnp.asarray(np.ones_like(mask)),
        height=h * 32, width=w * 32,
        num_frames=(f - 1) * 4 + 1,
        latents=jnp.asarray(lat5),
        num_inference_steps=4,
        output_type="latent",
        attn_impl="xla",
    )
    # per-step accumulated latent error (reference: MSE < 1e-3)
    assert np.mean((np.asarray(got_lat) - ref_lat) ** 2) < 1e-8

    got_video = P.generate(
        pipe,
        prompt_embeds=jnp.asarray(embeds),
        prompt_attention_mask=jnp.asarray(mask),
        negative_prompt_embeds=jnp.asarray(np.zeros_like(embeds)),
        negative_prompt_attention_mask=jnp.asarray(np.ones_like(mask)),
        height=h * 32, width=w * 32,
        num_frames=(f - 1) * 4 + 1,
        latents=jnp.asarray(lat5),
        num_inference_steps=4,
        output_type="tensor",
        attn_impl="xla",
    )
    psnr = _psnr(np.asarray(got_video), ref_video)
    assert psnr > 35.0, f"pipeline PSNR {psnr:.1f} dB < 35 dB"


def test_pipeline_parity_stg_and_rescale(models):
    """3-row guidance: CFG + rescale + STG perturbed pass
    (t2v_pipeline.rs:869-963 semantics, batched here)."""
    dit, dec, tcfg, vcfg, tparams, vparams = models
    rng = np.random.default_rng(5)

    f, h, w = 2, 2, 3
    seq_len = f * h * w
    lat5 = Pcg32(7, 0).randn((1, 4, f, h, w)).astype(np.float32)
    embeds = (rng.normal(size=(1, 6, 16)) * 0.3).astype(np.float32)
    mask = np.ones((1, 6), np.float32)
    guidance_scale, guidance_rescale, stg_scale = 3.0, 0.7, 1.5
    skip_blocks = [1]

    schcfg = FlowMatchEulerSchedulerConfig(
        shift_terminal=0.1, base_shift=0.95, max_shift=2.05,
        base_image_seq_len=1024, max_image_seq_len=4096,
    )
    mu = S.calculate_shift(seq_len, 1024, 4096, 0.95, 2.05)
    schedule = S.set_timesteps(
        schcfg, num_inference_steps=3,
        sigmas=np.linspace(1.0, 1.0 / 3.0, 3).tolist(), mu=mu,
    )
    coords = P.build_video_coords(f, h, w, 25.0, 4, 32)
    coords_b = np.broadcast_to(coords[None], (1, seq_len, 3)).copy()

    # torch mirror: sequential 3-pass guidance like the reference
    lat = torch.from_numpy(
        lat5.reshape(1, 4, -1).transpose(0, 2, 1).copy()
    )
    emb_t = torch.from_numpy(embeds)
    msk_t = torch.from_numpy(mask)
    crd_t = torch.from_numpy(coords_b)
    skip_mask = torch.zeros(2, 1)
    skip_mask[1, 0] = 1.0
    with torch.no_grad():
        for i in range(len(schedule.timesteps)):
            t = torch.full((1,), float(schedule.timesteps[i]))
            uncond = dit(lat.float(), torch.zeros_like(emb_t), t, crd_t,
                         torch.ones_like(msk_t)).float()
            text = dit(lat.float(), emb_t, t, crd_t, msk_t).float()
            perturbed = dit(lat.float(), emb_t, t, crd_t, msk_t,
                            skip_mask).float()
            combined = uncond + guidance_scale * (text - uncond)
            std_text = text.std(dim=list(range(1, text.ndim)), keepdim=True)
            std_cfg = combined.std(dim=list(range(1, combined.ndim)), keepdim=True)
            combined = (guidance_rescale * (combined * std_text / std_cfg)
                        + (1 - guidance_rescale) * combined)
            combined = combined + stg_scale * (text - perturbed)
            dt = float(schedule.sigmas[i + 1] - schedule.sigmas[i])
            lat = lat.float() + dt * combined
    ref_lat = lat.numpy()

    full = LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=guidance_scale, num_inference_steps=3,
            stg_scale=stg_scale, rescaling_scale=guidance_rescale,
            skip_block_list=tuple(skip_blocks),
        ),
        transformer=tcfg, vae=vcfg, scheduler=schcfg,
    )
    pipe = P.LtxPipeline(config=full, transformer_params=tparams,
                         vae_params=vparams)
    got = P.generate(
        pipe,
        prompt_embeds=jnp.asarray(embeds),
        prompt_attention_mask=jnp.asarray(mask),
        negative_prompt_embeds=jnp.asarray(np.zeros_like(embeds)),
        negative_prompt_attention_mask=jnp.asarray(np.ones_like(mask)),
        height=h * 32, width=w * 32, num_frames=(f - 1) * 4 + 1,
        latents=jnp.asarray(lat5), num_inference_steps=3,
        output_type="latent", attn_impl="xla",
    )
    assert np.mean((np.asarray(got) - ref_lat) ** 2) < 1e-9
    assert np.abs(np.asarray(got) - ref_lat).max() < 1e-3
