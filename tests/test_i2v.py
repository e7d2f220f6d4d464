"""Image-to-video conditioning: per-token timesteps + conditioned first frame.

The reference is t2v-only, but its scheduler ships the per-token-timestep
Euler path (scheduler.rs:511-542) — the substrate of image conditioning.
This suite validates the i2v extension (diffusers LTXImageToVideoPipeline
semantics) against the independent torch mirror:
- per-token AdaLN in the transformer ([B, S] timestep),
- conditioning-mask latent preparation (first latent frame = encoded image),
- per-token Euler steps that hold conditioned tokens exactly.
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
)
from candle_video_tpu.models.ltx_video.scheduler import (  # noqa: E402
    FlowMatchEulerSchedulerConfig,
)
from candle_video_tpu.models.ltx_video.vae_init import init_vae_params  # noqa: E402
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


@pytest.fixture(scope="module")
def dit_models():
    torch.manual_seed(3)
    dit = torch_ltx.LtxTransformer3D(**TINY_DIT).eval()
    tcfg = TF.LtxTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=2,
        caption_channels=16,
    )
    tparams = transformer_params_from_state_dict(
        torch_state_dict_to_numpy(dit.state_dict()), tcfg, jnp.float32
    )
    return dit, tcfg, tparams


def _coords(f, h, w):
    c = P.build_video_coords(f, h, w, 25.0, 4, 32)
    return np.broadcast_to(c[None], (1, f * h * w, 3)).copy()


def _rope(tcfg, coords):
    from candle_video_tpu.ops.rope import rope_cos_sin

    grid = jnp.asarray(coords) / jnp.asarray(
        [tcfg.rope_base_num_frames, tcfg.rope_base_height, tcfg.rope_base_width],
        jnp.float32,
    )
    return rope_cos_sin(grid, tcfg.inner_dim, tcfg.rope_theta)


def test_scalar_vs_per_token_constant(dit_models):
    """A [B, S] timestep with every token equal must reproduce the [B]
    scalar-timestep forward exactly (broadcast consistency)."""
    _, tcfg, tparams = dit_models
    rng = np.random.default_rng(0)
    f, h, w = 2, 2, 3
    s = f * h * w
    x = rng.normal(size=(1, s, 4)).astype(np.float32)
    emb = (rng.normal(size=(1, 5, 16)) * 0.3).astype(np.float32)
    coords = _coords(f, h, w)
    cos, sin = _rope(tcfg, coords)

    a = TF.forward(
        tparams, tcfg, jnp.asarray(x), jnp.asarray(emb),
        jnp.asarray([437.0], jnp.float32), cos, sin, attn_impl="xla",
    )
    b = TF.forward(
        tparams, tcfg, jnp.asarray(x), jnp.asarray(emb),
        jnp.full((1, s), 437.0, jnp.float32), cos, sin, attn_impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_token_timestep_torch_parity(dit_models):
    """Random per-token timesteps: JAX vs the torch mirror."""
    dit, tcfg, tparams = dit_models
    rng = np.random.default_rng(1)
    f, h, w = 2, 2, 3
    s = f * h * w
    x = rng.normal(size=(1, s, 4)).astype(np.float32)
    emb = (rng.normal(size=(1, 5, 16)) * 0.3).astype(np.float32)
    tok_t = (rng.uniform(0, 1000, size=(1, s))).astype(np.float32)
    coords = _coords(f, h, w)
    cos, sin = _rope(tcfg, coords)

    got = np.asarray(
        TF.forward(
            tparams, tcfg, jnp.asarray(x), jnp.asarray(emb),
            jnp.asarray(tok_t), cos, sin, attn_impl="xla",
        )
    )
    with torch.no_grad():
        ref = dit(
            torch.from_numpy(x), torch.from_numpy(emb),
            torch.from_numpy(tok_t), torch.from_numpy(coords),
        ).numpy()
    assert np.abs(got - ref).max() < 2e-4
    assert np.mean((got - ref) ** 2) < 1e-9


def _i2v_torch_loop(dit, schedule, mixed_packed, cond_mask, embeds, mask,
                    coords, guidance_scale, num_train=1000):
    """Torch mirror of the image-conditioned denoise loop: per-token
    timesteps, per-token Euler step, conditioned tokens held."""
    lat = torch.from_numpy(mixed_packed).float()
    emb = torch.from_numpy(embeds)
    msk = torch.from_numpy(mask)
    crd = torch.from_numpy(coords)
    cmask = torch.from_numpy(cond_mask).float()  # [B, S], 1 = conditioned
    inv = 1.0 - cmask
    sig = torch.from_numpy(np.asarray(schedule.sigmas, np.float32))  # [N+1]
    do_cfg = guidance_scale > 1.0

    with torch.no_grad():
        for i in range(len(schedule.timesteps)):
            t = float(schedule.timesteps[i])
            tok_t = t * inv  # [B, S]
            preds = []
            branches = [torch.zeros_like(emb), emb] if do_cfg else [emb]
            masks = [torch.ones_like(msk), msk] if do_cfg else [msk]
            for e, m in zip(branches, masks):
                preds.append(dit(lat, e, tok_t, crd, m).float())
            if do_cfg:
                uncond, text = preds
                pred = uncond + guidance_scale * (text - uncond)
            else:
                pred = preds[0]

            # per-token Euler (scheduler.rs:511-542)
            tok_sig = tok_t / num_train  # [B, S]
            lower_mask = sig[:, None, None] < (tok_sig[None] - 1e-6)
            lower = torch.where(lower_mask, sig[:, None, None],
                                torch.zeros(())).max(dim=0).values
            dt = (tok_sig - lower).unsqueeze(-1)
            denoised = lat - dt * pred
            denoise_tok = ((t / num_train - 1e-6) < inv).unsqueeze(-1)
            lat = torch.where(denoise_tok, denoised, lat)
    return lat.numpy()


def _mixed_latents(il_norm, cond5, f, h, w, seed=42):
    """noise everywhere except the (clean) first latent frame."""
    noise5 = Pcg32(seed, 0).randn((1, 4, f, h, w)).astype(np.float32)
    init5 = np.tile(il_norm, (1, 1, f, 1, 1))
    return init5 * cond5 + noise5 * (1.0 - cond5)


def _pack_np(x):
    b, c, f, h, w = x.shape
    return x.reshape(b, c, -1).transpose(0, 2, 1).copy()


@pytest.mark.parametrize("guidance_scale", [1.0, 3.0])
def test_i2v_pipeline_parity(dit_models, guidance_scale):
    dit, tcfg, tparams = dit_models
    rng = np.random.default_rng(2)

    f, h, w = 2, 2, 3
    s = f * h * w
    embeds = (rng.normal(size=(1, 5, 16)) * 0.3).astype(np.float32)
    mask = np.ones((1, 5), np.float32)

    mean = np.linspace(-0.1, 0.1, 4).astype(np.float32)
    std = np.linspace(0.9, 1.1, 4).astype(np.float32)
    vparams = {
        "latents_mean": jnp.asarray(mean),
        "latents_std": jnp.asarray(std),
    }
    # unnormalized single-frame conditioning latents (what the encoder emits)
    il = rng.normal(size=(1, 4, 1, h, w)).astype(np.float32)
    il_norm = (il - mean.reshape(1, 4, 1, 1, 1)) / std.reshape(1, 4, 1, 1, 1)

    cond5 = np.zeros((1, 1, f, h, w), np.float32)
    cond5[:, :, 0] = 1.0
    mixed5 = _mixed_latents(il_norm, cond5, f, h, w)
    cond_mask = _pack_np(cond5)[..., 0]  # [1, S]

    schcfg = FlowMatchEulerSchedulerConfig(
        shift_terminal=0.1, base_shift=0.95, max_shift=2.05,
        base_image_seq_len=1024, max_image_seq_len=4096,
    )
    mu = S.calculate_shift(s, 1024, 4096, 0.95, 2.05)
    schedule = S.set_timesteps(
        schcfg, num_inference_steps=4,
        sigmas=np.linspace(1.0, 0.25, 4).tolist(), mu=mu,
    )
    coords = _coords(f, h, w)

    ref = _i2v_torch_loop(
        dit, schedule, _pack_np(mixed5), cond_mask, embeds, mask, coords,
        guidance_scale,
    )

    vcfg = V.LtxVaeConfig(
        latent_channels=4, spatial_compression_ratio=32,
        temporal_compression_ratio=4, timestep_conditioning=False,
    )
    full = LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=guidance_scale, num_inference_steps=4,
            stg_scale=0.0, rescaling_scale=0.0, skip_block_list=(),
        ),
        transformer=tcfg, vae=vcfg, scheduler=schcfg,
    )
    pipe = P.LtxPipeline(
        config=full, transformer_params=tparams, vae_params=vparams,
    )
    got = P.generate(
        pipe,
        prompt_embeds=jnp.asarray(embeds),
        prompt_attention_mask=jnp.asarray(mask),
        negative_prompt_embeds=jnp.asarray(np.zeros_like(embeds)),
        negative_prompt_attention_mask=jnp.asarray(np.ones_like(mask)),
        height=h * 32, width=w * 32, num_frames=(f - 1) * 4 + 1,
        image_latents=jnp.asarray(il),
        num_inference_steps=4, seed=42, use_pcg_rng=True,
        output_type="latent", attn_impl="xla",
    )
    got = np.asarray(got)
    assert np.mean((got - ref) ** 2) < 1e-9
    assert np.abs(got - ref).max() < 1e-3

    # conditioned tokens must be held EXACTLY at the clean first-frame latents
    mixed_packed = _pack_np(mixed5)
    cond_idx = cond_mask[0].astype(bool)
    np.testing.assert_array_equal(
        got[0, cond_idx], mixed_packed[0, cond_idx]
    )
    # and the free tokens must have moved
    assert np.abs(got[0, ~cond_idx] - mixed_packed[0, ~cond_idx]).max() > 1e-3


def test_multi_anchor_conditioning_parity(dit_models):
    """Two anchors — hard first frame + strength-0.6 last frame (first+last
    interpolation) — vs the mask-generic torch mirror loop."""
    dit, tcfg, tparams = dit_models
    rng = np.random.default_rng(8)

    f, h, w = 3, 2, 3
    s = f * h * w
    embeds = (rng.normal(size=(1, 5, 16)) * 0.3).astype(np.float32)
    mask = np.ones((1, 5), np.float32)

    mean = np.linspace(-0.1, 0.1, 4).astype(np.float32)
    std = np.linspace(0.9, 1.1, 4).astype(np.float32)
    vparams = {"latents_mean": jnp.asarray(mean), "latents_std": jnp.asarray(std)}

    il0 = rng.normal(size=(1, 4, 1, h, w)).astype(np.float32)
    il2 = rng.normal(size=(1, 4, 1, h, w)).astype(np.float32)

    def norm(x):
        return (x - mean.reshape(1, 4, 1, 1, 1)) / std.reshape(1, 4, 1, 1, 1)

    cond5 = np.zeros((1, 1, f, h, w), np.float32)
    cond5[:, :, 0] = 1.0
    cond5[:, :, 2] = 0.6
    init5 = np.zeros((1, 4, f, h, w), np.float32)
    init5[:, :, 0:1] = norm(il0)
    init5[:, :, 2:3] = norm(il2)
    noise5 = Pcg32(42, 0).randn((1, 4, f, h, w)).astype(np.float32)
    mixed5 = init5 * cond5 + noise5 * (1.0 - cond5)
    cond_mask = _pack_np(cond5)[..., 0]

    schcfg = FlowMatchEulerSchedulerConfig(
        shift_terminal=0.1, base_shift=0.95, max_shift=2.05,
        base_image_seq_len=1024, max_image_seq_len=4096,
    )
    mu = S.calculate_shift(s, 1024, 4096, 0.95, 2.05)
    schedule = S.set_timesteps(
        schcfg, num_inference_steps=4,
        sigmas=np.linspace(1.0, 0.25, 4).tolist(), mu=mu,
    )
    coords = _coords(f, h, w)

    ref = _i2v_torch_loop(
        dit, schedule, _pack_np(mixed5), cond_mask, embeds, mask, coords,
        guidance_scale=1.0,
    )

    vcfg = V.LtxVaeConfig(
        latent_channels=4, spatial_compression_ratio=32,
        temporal_compression_ratio=4, timestep_conditioning=False,
    )
    full = LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=1.0, num_inference_steps=4,
            stg_scale=0.0, rescaling_scale=0.0, skip_block_list=(),
        ),
        transformer=tcfg, vae=vcfg, scheduler=schcfg,
    )
    pipe = P.LtxPipeline(
        config=full, transformer_params=tparams, vae_params=vparams,
    )
    got = np.asarray(P.generate(
        pipe,
        prompt_embeds=jnp.asarray(embeds),
        prompt_attention_mask=jnp.asarray(mask),
        height=h * 32, width=w * 32, num_frames=(f - 1) * 4 + 1,
        conditioning=[
            P.ConditioningItem(latents=jnp.asarray(il0), frame_index=0),
            P.ConditioningItem(latents=jnp.asarray(il2), frame_index=2,
                               strength=0.6),
        ],
        num_inference_steps=4, seed=42, use_pcg_rng=True,
        output_type="latent", attn_impl="xla",
    ))
    assert np.mean((got - ref) ** 2) < 1e-9

    mixed_packed = _pack_np(mixed5)
    hard = cond_mask[0] == 1.0
    soft = cond_mask[0] == 0.6
    free = cond_mask[0] == 0.0
    # hard anchors held exactly; soft anchors and free tokens both denoise
    # (the soft anchor enters the loop once sigma < 1 - strength)
    np.testing.assert_array_equal(got[0, hard], mixed_packed[0, hard])
    assert np.abs(got[0, soft] - mixed_packed[0, soft]).max() > 1e-4
    assert np.abs(got[0, free] - mixed_packed[0, free]).max() > 1e-3


def test_image_sugar_equals_conditioning_item(dit_models):
    """generate(image_latents=...) must equal the explicit single-item
    conditioning list (frame 0, strength 1)."""
    _, tcfg, tparams = dit_models
    rng = np.random.default_rng(9)
    f, h, w = 2, 2, 3
    embeds = (rng.normal(size=(1, 5, 16)) * 0.3).astype(np.float32)
    mask = np.ones((1, 5), np.float32)
    vparams = {
        "latents_mean": jnp.asarray(np.zeros(4), jnp.float32),
        "latents_std": jnp.asarray(np.ones(4), jnp.float32),
    }
    il = rng.normal(size=(1, 4, 1, h, w)).astype(np.float32)

    vcfg = V.LtxVaeConfig(
        latent_channels=4, spatial_compression_ratio=32,
        temporal_compression_ratio=4, timestep_conditioning=False,
    )
    full = LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=1.0, num_inference_steps=3,
            stg_scale=0.0, rescaling_scale=0.0, skip_block_list=(),
        ),
        transformer=tcfg, vae=vcfg,
        scheduler=FlowMatchEulerSchedulerConfig(shift_terminal=0.1),
    )
    pipe = P.LtxPipeline(
        config=full, transformer_params=tparams, vae_params=vparams,
    )
    kwargs = dict(
        prompt_embeds=jnp.asarray(embeds),
        prompt_attention_mask=jnp.asarray(mask),
        height=h * 32, width=w * 32, num_frames=(f - 1) * 4 + 1,
        num_inference_steps=3, seed=11, use_pcg_rng=True,
        output_type="latent", attn_impl="xla",
    )
    a = P.generate(pipe, image_latents=jnp.asarray(il), **kwargs)
    b = P.generate(
        pipe, conditioning=[P.ConditioningItem(latents=jnp.asarray(il))],
        **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_i2v_loop_split_rope_matches_standard():
    """The i2v denoise scan under the split-rope fast path (permuted params +
    compact tables + packed kernel, the production TPU dispatch) matches the
    standard XLA path — per-token temb does not interact with the kernel."""
    from candle_video_tpu.ops.rope import (
        normalize_video_coords,
        rope_cos_sin,
        rope_split_tables,
        video_coords_grid,
    )

    rng = np.random.default_rng(6)
    cfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=128, caption_channels=16,
        num_layers=2,
    )
    params = TF.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    f, h, w = 2, 2, 3
    s = f * h * w
    lat = jnp.asarray(rng.normal(size=(1, s, 8)), jnp.float32)
    cmask = np.zeros((1, s), np.float32)
    cmask[:, : h * w] = 1.0  # first latent frame conditioned
    enc = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    mask = jnp.ones((2, 5), jnp.float32)
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    sch = S.set_timesteps(S.FlowMatchEulerSchedulerConfig(), num_inference_steps=3)
    skip = jnp.zeros((cfg.num_layers, 2), jnp.float32)

    common = dict(num_conds=2, use_skip=False)
    ref = P.denoise_loop_i2v(
        params, cfg, lat, jnp.asarray(cmask), enc, mask,
        sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
        jnp.float32(3.0), jnp.float32(0.0), jnp.float32(0.0), skip,
        attn_impl="xla", **common,
    )
    got = P.denoise_loop_i2v(
        TF.permute_params_rope_split(params, cfg), cfg, lat,
        jnp.asarray(cmask), enc, mask,
        sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
        jnp.float32(3.0), jnp.float32(0.0), jnp.float32(0.0), skip,
        attn_impl="pallas", rope_split=rope_split_tables(cos, sin), **common,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-2, rtol=3e-2
    )
    # conditioned tokens identical (and exactly held) on both paths
    held = np.asarray(lat)[0, cmask[0].astype(bool)]
    np.testing.assert_array_equal(
        np.asarray(got)[0, cmask[0].astype(bool)], held
    )


def test_cli_image_spec_parsing():
    from candle_video_tpu.cli import parse_image_spec

    assert parse_image_spec("a.png") == ("a.png", 0, 1.0)
    assert parse_image_spec("a.png:12") == ("a.png", 12, 1.0)
    assert parse_image_spec("a.png:12:0.9") == ("a.png", 12, 0.9)
    assert parse_image_spec("C:/imgs/a.png") == ("C:/imgs/a.png", 0, 1.0)
    assert parse_image_spec("C:/imgs/a.png:3") == ("C:/imgs/a.png", 3, 1.0)
    assert parse_image_spec("C:/x/a.png:3:0.5") == ("C:/x/a.png", 3, 0.5)


def test_i2v_image_encode_consistency(dit_models):
    """generate(image=...) must equal the manual V.encode -> image_latents
    composition (argmax posterior, identical seeds)."""
    _, tcfg, tparams = dit_models
    rng = np.random.default_rng(4)

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
        timestep_conditioning=False,
        spatial_compression_ratio=4, temporal_compression_ratio=2,
    )
    vparams = init_vae_params(jax.random.PRNGKey(0), vcfg, jnp.float32)
    vparams["latents_mean"] = jnp.asarray(np.linspace(-0.1, 0.1, 4), jnp.float32)
    vparams["latents_std"] = jnp.asarray(np.linspace(0.9, 1.1, 4), jnp.float32)

    f, h, w = 2, 8, 16
    height, width = h * 4, w * 4  # %32-aligned (check_inputs), ratio 4
    embeds = (rng.normal(size=(1, 5, 16)) * 0.3).astype(np.float32)
    mask = np.ones((1, 5), np.float32)
    image = rng.uniform(-1, 1, size=(1, 3, height, width)).astype(np.float32)

    schcfg = FlowMatchEulerSchedulerConfig(shift_terminal=0.1)
    full = LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=1.0, num_inference_steps=3,
            stg_scale=0.0, rescaling_scale=0.0, skip_block_list=(),
        ),
        transformer=tcfg, vae=vcfg, scheduler=schcfg,
    )
    pipe = P.LtxPipeline(
        config=full, transformer_params=tparams, vae_params=vparams,
    )

    kwargs = dict(
        prompt_embeds=jnp.asarray(embeds),
        prompt_attention_mask=jnp.asarray(mask),
        negative_prompt_embeds=jnp.asarray(np.zeros_like(embeds)),
        negative_prompt_attention_mask=jnp.asarray(np.ones_like(mask)),
        height=height, width=width, num_frames=(f - 1) * 2 + 1,
        num_inference_steps=3, seed=7, use_pcg_rng=True,
        output_type="latent", attn_impl="xla",
    )
    via_image = P.generate(
        pipe, image=jnp.asarray(image),
        conditioning_sample_mode="argmax", **kwargs,
    )

    moments = V.encode(vparams, vcfg, jnp.asarray(image)[:, :, None],
                       use_tiling=False)
    il, _ = V.gaussian_split(moments)
    assert il.shape == (1, 4, 1, h, w)
    via_latents = P.generate(pipe, image_latents=il, **kwargs)

    np.testing.assert_allclose(
        np.asarray(via_image), np.asarray(via_latents), atol=1e-6
    )
