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
