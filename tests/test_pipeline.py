"""Pipeline tests: pack/unpack, video-coords causal fix, CFG rescale, and a
tiny end-to-end text-to-video run (random-init models).

Covers verify_cfg_parity / verify_video_coords_parity / verify_pipeline
surfaces of the reference test suite.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from candle_video_tpu.models.ltx_video import pipeline as P  # noqa: E402
from candle_video_tpu.models.ltx_video import scheduler as S  # noqa: E402
from candle_video_tpu.models.ltx_video import transformer as TF  # noqa: E402
from candle_video_tpu.models.ltx_video import vae as V  # noqa: E402
from candle_video_tpu.models.ltx_video import t5 as T5  # noqa: E402
from candle_video_tpu.models.ltx_video.configs import (  # noqa: E402
    LtxFullConfig,
    LtxInferenceConfig,
    get_config_by_version,
)
from candle_video_tpu.models.ltx_video.scheduler import (  # noqa: E402
    FlowMatchEulerSchedulerConfig,
)
from candle_video_tpu.models.ltx_video.vae_init import init_vae_params  # noqa: E402
from candle_video_tpu.utils.tokenizer import MockTokenizer  # noqa: E402


def test_pack_unpack_roundtrip(rng):
    x = rng.normal(size=(2, 8, 4, 6, 6)).astype(np.float32)
    packed = P.pack_latents(jnp.asarray(x), 2, 2)
    assert packed.shape == (2, 2 * 3 * 3, 8 * 2 * 2 * 2)
    back = P.unpack_latents(packed, 2, 3, 3, 2, 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


def test_pack_identity_patch1(rng):
    x = rng.normal(size=(1, 4, 2, 3, 3)).astype(np.float32)
    packed = P.pack_latents(jnp.asarray(x), 1, 1)
    assert packed.shape == (1, 18, 4)
    # token order is (f, h, w) row-major; channels last
    np.testing.assert_allclose(np.asarray(packed)[0, 0], x[0, :, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(packed)[0, 1], x[0, :, 0, 0, 1])
    np.testing.assert_allclose(np.asarray(packed)[0, 3], x[0, :, 0, 1, 0])


def test_video_coords_causal_fix():
    coords = P.build_video_coords(3, 2, 2, frame_rate=25.0)
    assert coords.shape == (12, 3)
    # frame 0: (0*8+1-8).clamp(0)=0; frame 1: (8+1-8)=1; frame 2: (16+1-8)=9
    f = coords[:, 0].reshape(3, 4)
    np.testing.assert_allclose(f[0], 0.0)
    np.testing.assert_allclose(f[1], 1.0 / 25.0)
    np.testing.assert_allclose(f[2], 9.0 / 25.0)
    # spatial * 32
    np.testing.assert_allclose(coords[:, 1].reshape(3, 2, 2)[0, 1, 0], 32.0)
    np.testing.assert_allclose(coords[:, 2].reshape(3, 2, 2)[0, 0, 1], 32.0)


def test_rescale_noise_cfg_vs_torch(rng):
    cfgn = rng.normal(size=(2, 30, 8)).astype(np.float32) * 2.0
    text = rng.normal(size=(2, 30, 8)).astype(np.float32)
    got = np.asarray(
        P.rescale_noise_cfg(jnp.asarray(cfgn), jnp.asarray(text), 0.7)
    )
    tc, tt = torch.from_numpy(cfgn), torch.from_numpy(text)
    std_text = tt.std(dim=list(range(1, tt.ndim)), keepdim=True)
    std_cfg = tc.std(dim=list(range(1, tc.ndim)), keepdim=True)
    rescaled = tc * (std_text / std_cfg)
    ref = (0.7 * rescaled + 0.3 * tc).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_postprocess_video():
    v = jnp.asarray([[-1.0, 0.0, 1.0, 2.0]], jnp.float32)
    out = np.asarray(P.postprocess_video(v))
    np.testing.assert_allclose(out, [[0.0, 127.5, 255.0, 255.0]], atol=1e-4)


def test_config_presets():
    c = get_config_by_version("0.9.5")
    assert c.transformer.num_layers == 28
    assert c.inference.guidance_scale == 3.0
    assert c.inference.skip_block_list == (19,)

    c = get_config_by_version("0.9.8-2b-distilled")
    assert c.inference.num_inference_steps == 7
    assert c.inference.timesteps is not None and len(c.inference.timesteps) == 7
    assert c.inference.decode_timestep == (0.05,)

    c = get_config_by_version("0.9.8-13b-distilled")
    assert c.transformer.num_layers == 48
    assert c.transformer.attention_head_dim == 128
    assert c.inference.skip_block_list == (42,)

    assert get_config_by_version("bogus").transformer.num_layers == 28


# ---------------------------------------------------------------------------
# tiny end-to-end
# ---------------------------------------------------------------------------

TINY_VAE = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=8,  # == transformer in_channels
    block_out_channels=(8, 16, 32),
    decoder_block_out_channels=(8, 16),
    spatiotemporal_scaling=(True, True),
    decoder_spatiotemporal_scaling=(True, True),
    layers_per_block=(1, 1, 2),
    decoder_layers_per_block=(1, 1, 1),
    patch_size=2,
    patch_size_t=1,
    downsample_types=("spatiotemporal", "spatiotemporal"),
    decoder_upsample_residual=(True, True),
    decoder_upsample_factor=(2, 2),
    timestep_conditioning=True,
    decoder_causal=False,
    spatial_compression_ratio=32,  # match pipeline latent sizing for h/w%32
    temporal_compression_ratio=4,
)


@pytest.fixture(scope="module")
def tiny_pipeline():
    tcfg = TF.LtxTransformerConfig(
        in_channels=8,
        out_channels=8,
        num_attention_heads=2,
        attention_head_dim=12,
        cross_attention_dim=24,
        num_layers=2,
        caption_channels=16,
    )
    t5cfg = T5.T5Config(
        vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2, num_heads=4
    )
    vcfg = V.LtxVaeConfig(**TINY_VAE)
    full = LtxFullConfig(
        inference=LtxInferenceConfig(
            guidance_scale=2.0, num_inference_steps=3, stg_scale=1.0,
            rescaling_scale=0.7, skip_block_list=(1,),
        ),
        transformer=tcfg,
        vae=vcfg,
        scheduler=FlowMatchEulerSchedulerConfig(
            shift_terminal=0.1, base_shift=0.95, max_shift=2.05,
            base_image_seq_len=1024, max_image_seq_len=4096,
        ),
    )

    key = jax.random.PRNGKey(0)
    tparams = TF.init_params(key, tcfg, dtype=jnp.float32)
    vparams = init_vae_params(jax.random.PRNGKey(1), vcfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    blocks = []
    for i in range(2):
        blk = {
            "attn": {
                "q": {"weight": jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)},
                "k": {"weight": jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)},
                "v": {"weight": jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)},
                "o": {"weight": jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)},
            },
            "attn_norm": {"weight": jnp.ones((16,), jnp.float32)},
            "ffn": {
                "wi_0": {"weight": jnp.asarray(rng.normal(size=(16, 32)) * 0.05, jnp.float32)},
                "wi_1": {"weight": jnp.asarray(rng.normal(size=(16, 32)) * 0.05, jnp.float32)},
                "wo": {"weight": jnp.asarray(rng.normal(size=(32, 16)) * 0.05, jnp.float32)},
            },
            "ffn_norm": {"weight": jnp.ones((16,), jnp.float32)},
        }
        if i == 0:
            blk["attn"]["relative_attention_bias"] = jnp.asarray(
                rng.normal(size=(32, 4)), jnp.float32
            )
        blocks.append(blk)
    t5params = {
        "embedding": jnp.asarray(rng.normal(size=(64, 16)) * 0.05, jnp.float32),
        "blocks": blocks,
        "final_norm": {"weight": jnp.ones((16,), jnp.float32)},
    }
    # caption_channels=16 == t5 d_model

    return P.LtxPipeline(
        config=full,
        transformer_params=tparams,
        vae_params=vparams,
        t5_params=t5params,
        t5_config=t5cfg,
        tokenizer=MockTokenizer(vocab_size=64, model_max_length=8),
    )


def test_e2e_latent_output(tiny_pipeline):
    out = P.generate(
        tiny_pipeline,
        prompt="a cat playing piano",
        negative_prompt="blurry",
        height=64, width=64, num_frames=5,
        num_inference_steps=3,
        output_type="latent",
        max_sequence_length=8,
        attn_impl="xla",
    )
    # latent 64/32=2 x 2, frames (5-1)/4+1 = 2 -> S=8
    assert out.shape == (1, 8, 8)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


def test_e2e_w8_quantized_dit(tiny_pipeline):
    """generate() with the DiT block linears in weight-only int8 (W8A16 —
    the 13B-on-one-chip path, CLI --dit-int8): the full pipeline dispatch
    must run the quantized linears and land close to the dense output."""
    import dataclasses as _dc

    qpipe = _dc.replace(
        tiny_pipeline,
        transformer_params=TF.quantize_transformer_params_w8(
            tiny_pipeline.transformer_params, qblock=8
        ),
    )
    kw = dict(
        prompt="a cat playing piano", negative_prompt="blurry",
        height=64, width=64, num_frames=5, num_inference_steps=3,
        output_type="latent", max_sequence_length=8, attn_impl="xla",
        seed=11,
    )
    dense = np.asarray(P.generate(tiny_pipeline, **kw))
    quant = np.asarray(P.generate(qpipe, **kw))
    assert quant.shape == dense.shape
    assert np.isfinite(quant).all()
    rel = np.abs(quant - dense).max() / (np.abs(dense).max() + 1e-6)
    assert 0 < rel < 0.05, f"w8 e2e relative deviation {rel}"


def test_e2e_fullstream_decode_kwarg(tiny_pipeline):
    """generate(vae_full_stream_chunks=N) drives the fully streamed decode
    (streaming head AND tail) explicitly — the kwarg the 13B-W4 resident
    bench uses; output must equal the dense decode bit-for-bit-ish (the
    streaming decode is exact; only op-order noise)."""
    kw = dict(
        prompt="a cat playing piano",
        height=64, width=64, num_frames=61,  # latent t=16: first chunk >= fill
        num_inference_steps=2,
        output_type="tensor", max_sequence_length=8, attn_impl="xla",
        seed=3,
    )
    dense = np.asarray(P.generate(tiny_pipeline, **kw))
    streamed = np.asarray(
        P.generate(tiny_pipeline, vae_full_stream_chunks=2, **kw)
    )
    assert streamed.shape == dense.shape
    # exact modulo op-order noise (f32 video tensor scaled to [0, 255])
    np.testing.assert_allclose(
        streamed.astype(np.float32), dense.astype(np.float32),
        atol=1e-3, rtol=1e-5,
    )


def test_e2e_w4_quantized_dit(tiny_pipeline):
    """generate() with the DiT block linears in weight-only int4 (W4A16 —
    the 13B-plus-resident-T5 path, CLI --dit-int4): full pipeline dispatch
    runs the packed-nibble linears and lands close to the dense output
    (~2x the W8A16 envelope: 4-bit affine group quantization)."""
    import dataclasses as _dc

    qpipe = _dc.replace(
        tiny_pipeline,
        transformer_params=TF.quantize_transformer_params_w4(
            tiny_pipeline.transformer_params, qblock=4
        ),
    )
    kw = dict(
        prompt="a cat playing piano", negative_prompt="blurry",
        height=64, width=64, num_frames=5, num_inference_steps=3,
        output_type="latent", max_sequence_length=8, attn_impl="xla",
        seed=11,
    )
    dense = np.asarray(P.generate(tiny_pipeline, **kw))
    quant = np.asarray(P.generate(qpipe, **kw))
    assert quant.shape == dense.shape
    assert np.isfinite(quant).all()
    rel = np.abs(quant - dense).max() / (np.abs(dense).max() + 1e-6)
    assert 0 < rel < 0.10, f"w4 e2e relative deviation {rel}"


def test_materialize_split_rope_inplace():
    """In-place split-rope materialization (13B memory path): the permuted
    tree replaces transformer_params (no second copy), the cache is primed,
    and generate() REFUSES to run a config that would fall back to the
    interleaved rotation (the permuted q/k would be silently wrong)."""
    tcfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=32, num_layers=2,
        caption_channels=16,
    )  # inner_dim 128 — split-layout lane grouping holds
    full = LtxFullConfig(
        inference=LtxInferenceConfig(), transformer=tcfg,
        vae=V.LtxVaeConfig(**TINY_VAE),
        scheduler=FlowMatchEulerSchedulerConfig(),
    )
    params = TF.init_params(jax.random.PRNGKey(0), tcfg, dtype=jnp.float32)
    pipe = P.LtxPipeline(config=full, transformer_params=params)
    ref = TF.permute_params_rope_split(params, tcfg)
    pipe.materialize_split_rope()
    assert pipe._rope_permuted_inplace
    assert pipe.split_rope_params() is pipe.transformer_params
    np.testing.assert_array_equal(
        np.asarray(pipe.transformer_params["blocks"]["attn1"]["to_q"]["weight"]),
        np.asarray(ref["blocks"]["attn1"]["to_q"]["weight"]),
    )
    with pytest.raises(ValueError, match="split-rope layout"):
        P.generate(
            pipe,
            prompt_embeds=jnp.zeros((1, 8, 16), jnp.float32),
            prompt_attention_mask=jnp.ones((1, 8), jnp.float32),
            height=64, width=64, num_frames=5, num_inference_steps=2,
            guidance_scale=1.0, stg_scale=0.0, skip_block_list=[],
            output_type="latent", attn_impl="xla",
        )


def test_e2e_video_output(tiny_pipeline):
    out = P.generate(
        tiny_pipeline,
        prompt="a dog",
        height=64, width=64, num_frames=5,
        num_inference_steps=2,
        guidance_scale=1.0,  # no CFG
        stg_scale=0.0,       # no STG -> permanent skip of block 1
        output_type="tensor",
        max_sequence_length=8,
        attn_impl="xla",
    )
    # tiny VAE is structurally 8x while the pipeline sizes latents with the
    # declared 32x ratio -> 64px/32 = 2 latent -> decode 2*8 = 16px
    assert out.shape == (1, 3, 5, 16, 16)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 255.0


def test_e2e_deterministic(tiny_pipeline):
    kw = dict(
        prompt="same seed", height=64, width=64, num_frames=5,
        num_inference_steps=2, output_type="latent", max_sequence_length=8,
        attn_impl="xla", seed=7,
    )
    a = P.generate(tiny_pipeline, **kw)
    b = P.generate(tiny_pipeline, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_e2e_guidance_modes_differ(tiny_pipeline):
    base = dict(
        prompt="guidance probe", height=64, width=64, num_frames=5,
        num_inference_steps=2, output_type="latent", max_sequence_length=8,
        attn_impl="xla", seed=3,
    )
    no_g = P.generate(tiny_pipeline, guidance_scale=1.0, stg_scale=0.0,
                      skip_block_list=[], **base)
    cfg_g = P.generate(tiny_pipeline, guidance_scale=3.0, stg_scale=0.0,
                       skip_block_list=[], **base)
    stg_g = P.generate(tiny_pipeline, guidance_scale=3.0, stg_scale=1.0,
                       skip_block_list=[1], **base)
    assert np.abs(np.asarray(no_g) - np.asarray(cfg_g)).max() > 1e-5
    assert np.abs(np.asarray(cfg_g) - np.asarray(stg_g)).max() > 1e-5


def test_e2e_precomputed_embeds(tiny_pipeline, rng):
    embeds = rng.normal(size=(1, 8, 16)).astype(np.float32)
    mask = np.ones((1, 8), np.float32)
    out = P.generate(
        tiny_pipeline,
        prompt_embeds=jnp.asarray(embeds),
        prompt_attention_mask=jnp.asarray(mask),
        negative_prompt_embeds=jnp.asarray(np.zeros_like(embeds)),
        negative_prompt_attention_mask=jnp.asarray(mask),
        height=64, width=64, num_frames=5,
        num_inference_steps=2, output_type="latent", max_sequence_length=8,
        attn_impl="xla",
    )
    assert out.shape == (1, 8, 8)


def test_e2e_input_validation(tiny_pipeline):
    with pytest.raises(ValueError, match="divisible by 32"):
        P.generate(tiny_pipeline, prompt="x", height=50, width=64)
    with pytest.raises(ValueError, match="either `prompt`"):
        P.generate(tiny_pipeline, height=64, width=64)


def test_distilled_preset_schedule_used(tiny_pipeline):
    """0.9.8-style custom sigmas flow through the scheduler (mu=0 path)."""
    out = P.generate(
        tiny_pipeline,
        prompt="distilled",
        height=64, width=64, num_frames=5,
        sigmas=[1.0, 0.9937, 0.725],
        num_inference_steps=3,
        guidance_scale=1.0, stg_scale=0.0, skip_block_list=[],
        output_type="latent", max_sequence_length=8, attn_impl="xla",
    )
    assert out.shape == (1, 8, 8)


def test_frame_count_warning(tiny_pipeline):
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        P.generate(
            tiny_pipeline, prompt="x", height=64, width=64, num_frames=6,
            num_inference_steps=1, guidance_scale=1.0, stg_scale=0.0,
            skip_block_list=[], output_type="latent", max_sequence_length=8,
            attn_impl="xla",
        )
        assert any("4*n+1" in str(x.message) for x in w)


def test_e2e_batch_prompts_and_multi_video(tiny_pipeline):
    """PromptInput::Batch + num_videos_per_prompt repeats
    (t2v_pipeline.rs:384-398, 679-685)."""
    out = P.generate(
        tiny_pipeline,
        prompt=["a cat", "a dog"],
        negative_prompt=["blurry"],  # broadcast to batch
        height=64, width=64, num_frames=5,
        num_inference_steps=2,
        num_videos_per_prompt=2,
        output_type="latent", max_sequence_length=8, attn_impl="xla",
    )
    assert out.shape == (4, 8, 8)  # 2 prompts x 2 videos
    o = np.asarray(out)
    # same prompt repeated -> identical videos (same latent seed per row? no:
    # PCG noise differs per batch row, so all rows differ)
    for i in range(4):
        for j in range(i + 1, 4):
            assert np.abs(o[i] - o[j]).max() > 1e-5
