"""13B-shaped tensor-parallel validation on the virtual 8-device CPU mesh.

The 13B preset (reference configs.rs:151-160): 48 layers, 32 heads x 128,
cross_attention_dim 4096.  Full 13B params don't fit a CPU test, so this
covers the two dimensions separately, as real compute:

- a FULL-WIDTH block stack (inner_dim 4096, head_dim 128, 4D FF) at depth 2,
  sharded tp=8, parity vs replicated;
- a DEPTH-48 scan (the real layer count) at reduced width, sharded tp=8,
  parity vs replicated;
- the lowered HLO of the tp=8 full-width forward must contain the expected
  GSPMD collectives (all-gather / reduce-scatter or all-reduce) — i.e. the
  sharding annotations actually produce a distributed program, not a
  replicated one.
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
    make_mesh,
    shard_batch,
    shard_transformer_params,
)


def _inputs(cfg, batch, f, h, w, rng):
    s = f * h * w
    hidden = jnp.asarray(rng.normal(size=(batch, s, cfg.in_channels)), jnp.float32)
    enc = jnp.asarray(
        rng.normal(size=(batch, 6, cfg.caption_channels)) * 0.05, jnp.float32
    )
    t = jnp.full((batch,), 500.0, jnp.float32)
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    return hidden, enc, t, cos, sin


def _run(cfg, params, inputs, mesh=None):
    hidden, enc, t, cos, sin = inputs

    def fwd(p, x):
        return TF.forward(p, cfg, x, enc, t, cos, sin, attn_impl="xla")

    if mesh is None:
        return np.asarray(fwd(params, hidden))
    with mesh:
        sharded = shard_transformer_params(params, mesh)
        x = shard_batch(hidden, mesh)
        return np.asarray(fwd(sharded, x))


def _cfg_full_width(num_layers=2):
    """True 13B width: 32 heads x 128, cross 4096 (configs.rs:151-160)."""
    return TF.LtxTransformerConfig(
        in_channels=128,
        out_channels=128,
        num_attention_heads=32,
        attention_head_dim=128,
        cross_attention_dim=4096,
        num_layers=num_layers,
        caption_channels=4096,
    )


def _cfg_depth48():
    """Real 13B depth (48 layers) at reduced width (8 heads x 24)."""
    return TF.LtxTransformerConfig(
        in_channels=16,
        out_channels=16,
        num_attention_heads=8,
        attention_head_dim=24,
        cross_attention_dim=192,
        num_layers=48,
        caption_channels=32,
    )


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "tests require 8 virtual CPU devices"
    return make_mesh(dp=1, tp=8)


def test_13b_full_width_block_tp8(mesh8):
    cfg = _cfg_full_width()
    params = TF.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    inputs = _inputs(cfg, batch=1, f=2, h=3, w=4, rng=rng)
    ref = _run(cfg, params, inputs)
    got = _run(cfg, params, inputs, mesh=mesh8)
    assert ref.shape == (1, 24, 128)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_13b_depth48_scan_tp8(mesh8):
    cfg = _cfg_depth48()
    params = TF.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    inputs = _inputs(cfg, batch=2, f=2, h=2, w=3, rng=rng)
    ref = _run(cfg, params, inputs)
    got = _run(cfg, params, inputs, mesh=mesh8)
    assert ref.shape == (2, 12, 16)
    assert np.isfinite(ref).all()
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-4)


def test_13b_tp8_hlo_contains_collectives(mesh8):
    """The sharded lowering must be a genuinely distributed program."""
    cfg = _cfg_full_width()
    params = TF.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    hidden, enc, t, cos, sin = _inputs(cfg, batch=1, f=2, h=3, w=4, rng=rng)

    with mesh8:
        sharded = shard_transformer_params(params, mesh8)
        x = shard_batch(hidden, mesh8)
        lowered = jax.jit(
            lambda p, xx: TF.forward(p, cfg, xx, enc, t, cos, sin, attn_impl="xla")
        ).lower(sharded, x)
        hlo = lowered.compile().as_text()
    assert any(
        op in hlo for op in ("all-gather", "all-reduce", "reduce-scatter")
    ), "tp=8 lowering contains no cross-device collectives"
