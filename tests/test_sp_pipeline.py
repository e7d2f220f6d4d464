"""Sequence-parallel (ring-attention) denoise path — the user-reachable
``--mesh sp=N`` mode (parallel/sequence.denoise_loop_sp).

The reference has NO sequence parallelism (SURVEY.md §2.3 — sequence length
is tamed by VAE tiling); this is the framework's new capability, and round-4
wires it into generate()/CLI.  Checks here:
- denoise scan under sp=4 (and dp=2 x sp=4) ≡ the single-device oracle,
- generate(sp_mesh=...) ≡ generate() end to end,
- the compiled HLO rotates K/V via collective-permute with ZERO all-gathers
  (the ring never materializes the full sequence on one chip),
- guardrails: i2v / stochastic / split-rope are rejected in SP mode.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from candle_video_tpu.models.ltx_video import pipeline as P
from candle_video_tpu.models.ltx_video import transformer as TF
from candle_video_tpu.models.ltx_video.pipeline import build_video_coords
from candle_video_tpu.ops.rope import rope_cos_sin
from candle_video_tpu.parallel import denoise_loop_sp, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _toy_cfg(**kw):
    return TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=4,
        attention_head_dim=8, cross_attention_dim=32, num_layers=2,
        caption_channels=16, **kw,
    )


def _setup(rng, b=2, f=2, h=2, w=4, num_conds=2):
    cfg = _toy_cfg()
    params = TF.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    s = f * h * w
    hidden = jnp.asarray(rng.normal(size=(b, s, cfg.in_channels)), jnp.float32)
    enc = jnp.asarray(
        rng.normal(size=(b, 8, cfg.caption_channels)) * 0.02, jnp.float32
    )
    coords = build_video_coords(f, h, w, 25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [cfg.rope_base_num_frames, cfg.rope_base_height, cfg.rope_base_width],
        jnp.float32,
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim, cfg.rope_theta)
    sigmas = jnp.asarray([1.0, 0.7, 0.3, 0.0], jnp.float32)
    ts = sigmas[:-1] * 1000.0
    if num_conds == 3:  # [uncond; cond; perturbed]
        enc_rows = jnp.concatenate([jnp.zeros_like(enc), enc, enc], axis=0)
    elif num_conds == 2:
        enc_rows = jnp.concatenate([jnp.zeros_like(enc), enc], axis=0)
    else:
        enc_rows = enc
    mask_rows = jnp.ones((num_conds * b, 8), jnp.float32)
    skip = jnp.zeros((cfg.num_layers, num_conds * b), jnp.float32)
    return cfg, params, hidden, enc_rows, mask_rows, sigmas, ts, cos, sin, skip


def test_denoise_loop_sp_matches_oracle(rng):
    (cfg, params, hidden, enc_rows, mask_rows, sigmas, ts, cos, sin,
     skip) = _setup(rng)
    ref = np.asarray(P.denoise_loop(
        params, cfg, hidden, enc_rows, mask_rows, sigmas, ts, cos, sin,
        jnp.float32(3.0), jnp.float32(0.7), jnp.float32(0.0), skip,
        jax.random.PRNGKey(0), num_conds=2, attn_impl="xla",
    ))
    for dp, sp in ((1, 4), (2, 4), (1, 8)):
        mesh = make_mesh(dp=dp, sp=sp)
        out = denoise_loop_sp(
            params, cfg, hidden, enc_rows, mask_rows, sigmas, ts, cos, sin,
            3.0, 0.7, 0.0, skip, mesh=mesh, num_conds=2, attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=2e-5, rtol=2e-5,
            err_msg=f"sp denoise (dp={dp}, sp={sp}) != oracle",
        )


def test_denoise_loop_sp_with_stg_skip(rng):
    """STG skip rows are per-batch (sequence-invariant) — they must survive
    the sequence sharding unchanged."""
    (cfg, params, hidden, enc_rows, mask_rows, sigmas, ts, cos, sin,
     skip) = _setup(rng, b=1, num_conds=3)
    skip = np.zeros((cfg.num_layers, 3), np.float32)
    skip[1, 2] = 1.0  # skip layer 1 on the perturbed row
    skip = jnp.asarray(skip)
    ref = np.asarray(P.denoise_loop(
        params, cfg, hidden, enc_rows, mask_rows, sigmas, ts, cos, sin,
        jnp.float32(3.0), jnp.float32(0.0), jnp.float32(1.5), skip,
        jax.random.PRNGKey(0), num_conds=3, attn_impl="xla", use_skip=True,
    ))
    out = denoise_loop_sp(
        params, cfg, hidden, enc_rows, mask_rows, sigmas, ts, cos, sin,
        3.0, 0.0, 1.5, skip, mesh=make_mesh(sp=4), num_conds=3,
        attn_impl="xla", use_skip=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_sp_hlo_ring_no_allgather(rng):
    """The compiled SP scan must rotate K/V via collective-permute and must
    NOT all-gather them (no chip ever holds the full sequence)."""
    (cfg, params, hidden, enc_rows, mask_rows, sigmas, ts, cos, sin,
     skip) = _setup(rng, b=1, num_conds=1)
    mesh = make_mesh(sp=4)

    def fn(p, lat):
        return denoise_loop_sp(
            p, cfg, lat, enc_rows, mask_rows, sigmas, ts, cos, sin,
            1.0, 0.0, 0.0, skip, mesh=mesh, num_conds=1, attn_impl="xla",
        )

    txt = jax.jit(fn).lower(params, hidden).compile().as_text()
    assert len(re.findall(r"collective-permute", txt)) >= 1
    assert len(re.findall(r"all-gather", txt)) == 0


def _toy_full_cfg(**inf_kw):
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import (
        LtxFullConfig,
        LtxInferenceConfig,
    )
    from candle_video_tpu.models.ltx_video.scheduler import (
        FlowMatchEulerSchedulerConfig,
    )

    sched_kw = {}
    if "stochastic_sampling" in inf_kw:
        sched_kw["stochastic_sampling"] = inf_kw["stochastic_sampling"]
    return LtxFullConfig(
        inference=LtxInferenceConfig(**inf_kw),
        transformer=_toy_cfg(),
        vae=V.LtxVaeConfig(),  # only the compression ratios are read
        scheduler=FlowMatchEulerSchedulerConfig(**sched_kw),
    )


def test_generate_sp_matches_dense(rng):
    """End-to-end generate() under --mesh sp=4 semantics ≡ plain generate()."""
    full = _toy_full_cfg(
        num_inference_steps=3, guidance_scale=3.0, rescaling_scale=0.7,
        stg_scale=0.0, skip_block_list=(),
    )
    params = TF.init_params(jax.random.PRNGKey(0), full.transformer,
                            dtype=jnp.float32)
    pipe = P.LtxPipeline(config=full, transformer_params=params)
    emb = jnp.asarray(
        rng.normal(size=(1, 8, full.transformer.caption_channels)) * 0.02,
        jnp.float32,
    )
    nmb = jnp.zeros_like(emb)
    mask = jnp.ones((1, 8), jnp.float32)
    kw = dict(
        prompt_embeds=emb, prompt_attention_mask=mask,
        negative_prompt_embeds=nmb, negative_prompt_attention_mask=mask,
        height=64, width=128, num_frames=9, num_inference_steps=3,
        output_type="latent", use_pcg_rng=True, attn_impl="xla",
    )
    ref = np.asarray(P.generate(pipe, **kw))
    out = np.asarray(P.generate(pipe, sp_mesh=make_mesh(sp=4), **kw))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_sp_mode_guardrails(rng):
    full = _toy_full_cfg(
        num_inference_steps=2, guidance_scale=1.0, rescaling_scale=0.0,
        stg_scale=0.0, skip_block_list=(), stochastic_sampling=True,
    )
    params = TF.init_params(jax.random.PRNGKey(0), full.transformer,
                            dtype=jnp.float32)
    pipe = P.LtxPipeline(config=full, transformer_params=params)
    emb = jnp.zeros((1, 8, full.transformer.caption_channels), jnp.float32)
    mask = jnp.ones((1, 8), jnp.float32)
    with pytest.raises(ValueError, match="stochastic"):
        P.generate(
            pipe, prompt_embeds=emb, prompt_attention_mask=mask,
            height=64, width=128, num_frames=9, num_inference_steps=2,
            output_type="latent", sp_mesh=make_mesh(sp=4), attn_impl="xla",
        )
    with pytest.raises(ValueError, match="at most one"):
        P.generate(
            pipe, prompt_embeds=emb, prompt_attention_mask=mask,
            height=64, width=128, num_frames=9,
            output_type="latent", sp_mesh=make_mesh(sp=4),
            pp_mesh=make_mesh(sp=4), attn_impl="xla",
        )
    with pytest.raises(ValueError, match="tp and sp"):
        make_mesh(tp=2, sp=2)
