"""Step-wise denoise (interrupt/callback) and embedding-cache tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from candle_video_tpu.models.ltx_video import pipeline as P
from candle_video_tpu.models.ltx_video import scheduler as S
from candle_video_tpu.models.ltx_video import transformer as TF
from candle_video_tpu.ops.rope import (
    normalize_video_coords,
    rope_cos_sin,
    video_coords_grid,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=2,
        caption_channels=16,
    )
    params = TF.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    f, h, w = 2, 2, 3
    lat = jnp.asarray(rng.normal(size=(1, f * h * w, 8)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 5, 16)), jnp.float32)
    mask = jnp.ones((1, 5), jnp.float32)
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    sch = S.set_timesteps(
        S.FlowMatchEulerSchedulerConfig(), num_inference_steps=4
    )
    return cfg, params, lat, enc, mask, cos, sin, sch


def test_stepwise_matches_scan(tiny):
    cfg, params, lat, enc, mask, cos, sin, sch = tiny
    skip = jnp.zeros((cfg.num_layers, 1), jnp.float32)
    key = jax.random.PRNGKey(1)

    scan_out = P.denoise_loop(
        params, cfg, lat, enc, mask, sch.sigmas_jnp, sch.timesteps_jnp,
        cos, sin, jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        skip, key, num_conds=1, attn_impl="xla",
    )
    step_out = P.denoise_stepwise(
        None, params, cfg, lat, enc, mask, sch, cos, sin,
        1.0, 0.0, 0.0, skip, key, num_conds=1, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(step_out), np.asarray(scan_out), atol=1e-5
    )


def test_stepwise_callback_and_interrupt(tiny):
    cfg, params, lat, enc, mask, cos, sin, sch = tiny
    skip = jnp.zeros((cfg.num_layers, 1), jnp.float32)
    seen = []

    class FakePipe:
        interrupt = False

    pipe = FakePipe()

    def cb(i, n, lat):
        seen.append(i)
        if i == 1:
            pipe.interrupt = True  # cooperative interrupt after step 2

    P.denoise_stepwise(
        pipe, params, cfg, lat, enc, mask, sch, cos, sin,
        1.0, 0.0, 0.0, skip, jax.random.PRNGKey(1),
        num_conds=1, attn_impl="xla", step_callback=cb,
    )
    assert seen == [0, 1]  # interrupted before steps 2, 3


def test_embedding_cache():
    from candle_video_tpu.models.ltx_video import t5 as T5
    from candle_video_tpu.utils.tokenizer import MockTokenizer
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version

    calls = {"n": 0}

    class CountingTokenizer(MockTokenizer):
        def encode_batch(self, prompts, max_length=None):
            calls["n"] += 1
            return super().encode_batch(prompts, max_length)

    cfg5 = T5.T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32,
                       num_layers=1, num_heads=4)
    rng = np.random.default_rng(0)
    blk = {
        "attn": {
            "q": {"weight": jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)},
            "k": {"weight": jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)},
            "v": {"weight": jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)},
            "o": {"weight": jnp.asarray(rng.normal(size=(16, 16)) * 0.05, jnp.float32)},
            "relative_attention_bias": jnp.asarray(rng.normal(size=(32, 4)), jnp.float32),
        },
        "attn_norm": {"weight": jnp.ones((16,), jnp.float32)},
        "ffn": {
            "wi_0": {"weight": jnp.asarray(rng.normal(size=(16, 32)) * 0.05, jnp.float32)},
            "wi_1": {"weight": jnp.asarray(rng.normal(size=(16, 32)) * 0.05, jnp.float32)},
            "wo": {"weight": jnp.asarray(rng.normal(size=(32, 16)) * 0.05, jnp.float32)},
        },
        "ffn_norm": {"weight": jnp.ones((16,), jnp.float32)},
    }
    t5p = {
        "embedding": jnp.asarray(rng.normal(size=(64, 16)) * 0.05, jnp.float32),
        "blocks": [blk],
        "final_norm": {"weight": jnp.ones((16,), jnp.float32)},
    }

    pipe = P.LtxPipeline(
        config=get_config_by_version("0.9.5"),
        transformer_params=None,
        t5_params=t5p,
        t5_config=cfg5,
        tokenizer=CountingTokenizer(vocab_size=64, model_max_length=8),
    )
    e1, m1 = pipe.encode_prompt(["hello"], 8)
    e2, m2 = pipe.encode_prompt(["hello"], 8)
    assert calls["n"] == 1  # second call served from cache
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    pipe.encode_prompt(["other"], 8)
    assert calls["n"] == 2


# ---------------------------------------------------------------------------
# check_inputs: the reference's full rejection surface (t2v_pipeline.rs:313-365)
# ---------------------------------------------------------------------------


def test_check_inputs_rejections():
    import numpy as np
    import pytest

    from candle_video_tpu.models.ltx_video.pipeline import check_inputs

    emb = np.zeros((1, 128, 4096), np.float32)
    mask = np.ones((1, 128), np.float32)

    with pytest.raises(ValueError, match="divisible by 32"):
        check_inputs(500, 768, ["p"], None)
    with pytest.raises(ValueError, match="both `prompt` and `prompt_embeds`"):
        check_inputs(512, 768, ["p"], emb, prompt_attention_mask=mask)
    with pytest.raises(ValueError, match="either `prompt` or `prompt_embeds`"):
        check_inputs(512, 768, None, None)
    with pytest.raises(ValueError, match="Must provide `prompt_attention_mask`"):
        check_inputs(512, 768, None, emb)
    with pytest.raises(
        ValueError, match="Must provide `negative_prompt_attention_mask`"
    ):
        check_inputs(
            512, 768, None, emb,
            negative_prompt_embeds=emb, prompt_attention_mask=mask,
        )
    with pytest.raises(ValueError, match="must have the same shape"):
        check_inputs(
            512, 768, None, emb,
            negative_prompt_embeds=emb[:, :64],
            prompt_attention_mask=mask,
            negative_prompt_attention_mask=mask,
        )
    with pytest.raises(
        ValueError, match="`prompt_attention_mask` and `negative_prompt_attention_mask`"
    ):
        check_inputs(
            512, 768, None, emb,
            negative_prompt_embeds=emb,
            prompt_attention_mask=mask,
            negative_prompt_attention_mask=mask[:, :64],
        )
    # valid combinations pass
    check_inputs(512, 768, ["p"], None)
    check_inputs(
        512, 768, None, emb,
        negative_prompt_embeds=emb,
        prompt_attention_mask=mask,
        negative_prompt_attention_mask=mask,
    )
