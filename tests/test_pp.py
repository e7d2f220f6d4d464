"""Pipeline-parallel (GPipe microbatch) tests on the virtual 8-device mesh.

The reference has no inter-device parallelism (SURVEY.md §2.3); PP here is
validated against the single-device ``transformer.forward`` oracle: the
pipelined stack reuses the exact same block math, so parity must be exact up
to f32 reduction order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from candle_video_tpu.models.ltx_video import transformer as TF
from candle_video_tpu.ops.rope import (
    normalize_video_coords,
    rope_cos_sin,
    video_coords_grid,
)
from candle_video_tpu.parallel import (
    make_pipeline_mesh,
    pipeline_transformer_forward,
    shard_transformer_params_pp,
)


def _cfg(num_layers=4):
    return TF.LtxTransformerConfig(
        in_channels=8,
        out_channels=8,
        num_attention_heads=2,
        attention_head_dim=12,
        cross_attention_dim=24,
        num_layers=num_layers,
        caption_channels=16,
    )


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "tests require 8 virtual CPU devices"
    cfg = _cfg(num_layers=8)
    params = TF.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    f, h, w = 2, 2, 3
    s = f * h * w
    b = 4
    hidden = jnp.asarray(rng.normal(size=(b, s, 8)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(b, 5, 16)), jnp.float32)
    # per-sample timesteps exercise per-microbatch AdaLN rows
    t = jnp.asarray([993.0, 500.0, 250.0, 31.0], jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(b, 5)), jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    skip = np.zeros((cfg.num_layers, b), np.float32)
    skip[2, 3] = 1.0  # STG row on the last sample
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    ref = np.asarray(
        TF.forward(
            params, cfg, hidden, enc, t, cos, sin,
            encoder_attention_mask=mask,
            skip_layer_mask=jnp.asarray(skip),
            attn_impl="xla",
        )
    )
    return cfg, params, hidden, enc, t, mask, skip, cos, sin, ref


@pytest.mark.parametrize("pp,m", [(4, 4), (4, 2), (2, 4), (8, 1)])
def test_pp_matches_unsharded(setup, pp, m):
    cfg, params, hidden, enc, t, mask, skip, cos, sin, ref = setup
    if cfg.num_layers % pp:
        pytest.skip("layers not divisible")
    mesh = make_pipeline_mesh(pp)
    sharded = shard_transformer_params_pp(params, mesh)
    out = pipeline_transformer_forward(
        sharded, cfg, hidden, enc, t, cos, sin,
        mesh=mesh, num_microbatches=m,
        encoder_attention_mask=mask,
        skip_layer_mask=jnp.asarray(skip),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_pp_no_mask_no_skip(setup):
    cfg, params, hidden, enc, t, mask, skip, cos, sin, _ = setup
    ref = np.asarray(
        TF.forward(params, cfg, hidden, enc, t, cos, sin, attn_impl="xla")
    )
    mesh = make_pipeline_mesh(4)
    out = pipeline_transformer_forward(
        shard_transformer_params_pp(params, mesh),
        cfg, hidden, enc, t, cos, sin, mesh=mesh,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_pp_lowering_has_collective_permute(setup):
    cfg, params, hidden, enc, t, mask, skip, cos, sin, _ = setup
    mesh = make_pipeline_mesh(4)

    def fn(p):
        return pipeline_transformer_forward(
            p, cfg, hidden, enc, t, cos, sin, mesh=mesh, num_microbatches=2
        )

    hlo = jax.jit(fn).lower(params).compile().as_text()
    assert "collective-permute" in hlo


def test_pp_validation_errors(setup):
    cfg, params, hidden, enc, t, mask, skip, cos, sin, _ = setup
    mesh = make_pipeline_mesh(3)  # 4 layers % 3 != 0
    with pytest.raises(ValueError, match="not divisible by pp"):
        pipeline_transformer_forward(
            params, cfg, hidden, enc, t, cos, sin, mesh=mesh
        )
    mesh = make_pipeline_mesh(4)
    with pytest.raises(ValueError, match="num_microbatches"):
        pipeline_transformer_forward(
            params, cfg, hidden, enc, t, cos, sin, mesh=mesh,
            num_microbatches=3,
        )
    with pytest.raises(ValueError, match="batch-shared rope"):
        pipeline_transformer_forward(
            params, cfg, hidden, enc, t,
            jnp.tile(cos, (4, 1, 1)), jnp.tile(sin, (4, 1, 1)),
            mesh=mesh, num_microbatches=2,
        )
    with pytest.raises(ValueError, match="need 16 devices"):
        make_pipeline_mesh(16)


def test_pp_tp_composition(setup):
    """PP (manual shard_map) x TP (GSPMD auto): block params tp-sharded on
    a ('pp','tp') mesh; tp all-reduces appear inside the stages, the pp
    ring stays collective-permute, and there is NO all-gather of the
    tp-sharded weights."""
    import numpy as np
    from jax.sharding import Mesh

    cfg, params, hidden, enc, t, mask, skip, cos, sin, ref = setup
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("pp", "tp"))
    sharded = shard_transformer_params_pp(params, mesh, tp_axis="tp")

    def fn(p):
        return pipeline_transformer_forward(
            p, cfg, hidden, enc, t, cos, sin,
            mesh=mesh, num_microbatches=2,
            encoder_attention_mask=mask, skip_layer_mask=jnp.asarray(skip),
        )

    lowered = jax.jit(fn).lower(sharded)
    hlo = lowered.compile().as_text()
    assert "collective-permute" in hlo
    assert "all-reduce" in hlo  # tp collectives inside the stages
    out = np.asarray(jax.jit(fn)(sharded))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("pp,m,v", [(2, 2, 2), (4, 2, 2), (2, 1, 4), (4, 4, 2)])
def test_pp_interleaved_matches_unsharded(setup, pp, m, v):
    """Interleaved virtual-stage schedule ≡ oracle (params layer-permuted
    via shard_transformer_params_pp(interleave=v))."""
    cfg, params, hidden, enc, t, mask, skip, cos, sin, ref = setup
    if cfg.num_layers % (pp * v):
        pytest.skip("layers not divisible by pp*v")
    mesh = make_pipeline_mesh(pp)
    sharded = shard_transformer_params_pp(params, mesh, interleave=v)
    out = pipeline_transformer_forward(
        sharded, cfg, hidden, enc, t, cos, sin,
        mesh=mesh, num_microbatches=m,
        encoder_attention_mask=mask,
        skip_layer_mask=jnp.asarray(skip),
        interleave=v,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_interleave_layer_order_is_permutation():
    from candle_video_tpu.parallel import interleave_layer_order

    order = interleave_layer_order(48, 4, 2)
    assert sorted(order.tolist()) == list(range(48))
    # device 0 owns chunks vs=0 (layers 0-5) and vs=4 (layers 24-29)
    assert order[:12].tolist() == list(range(0, 6)) + list(range(24, 30))


def test_interleaved_beats_gpipe_bubble():
    """Bubble accounting: the interleaved schedule's fill/drain cost is 1/v
    of GPipe's at every M in 2..4 (pp=4)."""
    from candle_video_tpu.parallel import schedule_ticks

    for m in (2, 3, 4):
        g = schedule_ticks(4, m, interleave=1)
        i2 = schedule_ticks(4, m, interleave=2)
        assert i2["time_stage_units"] < g["time_stage_units"], (m, g, i2)
        assert i2["bubble_fraction"] < g["bubble_fraction"], (m, g, i2)
    # exact accounting: GPipe time (M + pp - 1), interleaved (M + v*pp - 1)/v
    assert schedule_ticks(4, 2)["time_stage_units"] == 5
    assert schedule_ticks(4, 2, 2)["time_stage_units"] == 4.5


def test_denoise_loop_pp_matches_single_device(setup):
    """The FULL denoise scan under PP ≡ models.pipeline.denoise_loop."""
    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.parallel import denoise_loop_pp

    cfg, params, hidden, enc, t, mask, skip, cos, sin, _ = setup
    b = 2
    latents = hidden[:b]
    # CFG rows: [uncond; cond] -> 2*b = 4 microbatches
    enc_rows = jnp.concatenate([jnp.zeros_like(enc[:b]), enc[:b]], axis=0)
    mask_rows = jnp.ones((2 * b, enc.shape[1]), jnp.float32)
    skip_rows = jnp.zeros((cfg.num_layers, 2 * b), jnp.float32)
    sigmas = jnp.asarray([1.0, 0.7, 0.3, 0.0], jnp.float32)
    timesteps = sigmas[:-1] * 1000.0
    key = jax.random.PRNGKey(0)

    ref = np.asarray(P.denoise_loop(
        params, cfg, latents, enc_rows, mask_rows, sigmas, timesteps,
        cos, sin, jnp.float32(3.0), jnp.float32(0.7), jnp.float32(0.0),
        skip_rows, key, num_conds=2, attn_impl="xla",
    ))

    for v in (1, 2):
        mesh = make_pipeline_mesh(4)
        sharded = shard_transformer_params_pp(params, mesh, interleave=v)
        out = denoise_loop_pp(
            sharded, cfg, latents, enc_rows, mask_rows, sigmas, timesteps,
            cos, sin, 3.0, 0.7, 0.0, skip_rows, key,
            mesh=mesh, num_conds=2, attn_impl="xla", interleave=v,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5,
                                   err_msg=f"interleave={v}")


def test_generate_pp_mode_matches_default():
    """generate(pp_mesh=...) produces the same latents as plain generate."""
    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import (
        LtxFullConfig,
        LtxInferenceConfig,
    )
    from candle_video_tpu.models.ltx_video.scheduler import (
        FlowMatchEulerSchedulerConfig,
    )

    cfg = _cfg(num_layers=4)
    full = LtxFullConfig(
        inference=LtxInferenceConfig(guidance_scale=2.0, num_inference_steps=2,
                                     stg_scale=0.0, skip_block_list=()),
        transformer=cfg,
        vae=V.LtxVaeConfig(),
        scheduler=FlowMatchEulerSchedulerConfig(shift_terminal=0.1),
    )
    params = TF.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    pipe = P.LtxPipeline(config=full, transformer_params=params)
    rng = np.random.default_rng(7)
    emb = jnp.asarray(rng.normal(size=(1, 8, 16)) * 0.3, jnp.float32)
    m = jnp.ones((1, 8), jnp.float32)
    common = dict(
        prompt_embeds=emb, prompt_attention_mask=m,
        negative_prompt_embeds=jnp.zeros_like(emb),
        negative_prompt_attention_mask=m,
        height=64, width=64, num_frames=9, num_inference_steps=2,
        output_type="latent", seed=5, attn_impl="xla",
    )
    ref = np.asarray(P.generate(pipe, **common))
    for v in (1, 2):
        out = np.asarray(P.generate(
            pipe, pp_mesh=make_pipeline_mesh(2), pp_interleave=v, **common
        ))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5,
                                   err_msg=f"interleave={v}")
