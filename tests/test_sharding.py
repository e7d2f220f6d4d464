"""Mesh/TP sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from candle_video_tpu.models.ltx_video import transformer as TF
from candle_video_tpu.models.ltx_video import pipeline as P
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


def _tiny_cfg():
    # heads divisible by tp=4; inner 48 % 6 == 0
    return TF.LtxTransformerConfig(
        in_channels=8,
        out_channels=8,
        num_attention_heads=4,
        attention_head_dim=12,
        cross_attention_dim=48,
        num_layers=2,
        caption_channels=16,
    )


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "tests require 8 virtual CPU devices"
    cfg = _tiny_cfg()
    params = TF.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    f, h, w = 2, 2, 3
    s = f * h * w
    hidden = jnp.asarray(rng.normal(size=(2, s, 8)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    return cfg, params, hidden, enc, t, cos, sin


def test_make_mesh_shapes():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh(dp=4, tp=4)


def test_shard_w8_params_rejected(setup):
    """Weight-only int8 trees are a single-chip capacity path; sharding one
    must fail LOUDLY (GSPMD cannot partition the Pallas dequant matmul and
    would silently gather) with guidance toward the BF16 TP path."""
    cfg, params, *_ = setup
    from candle_video_tpu.parallel import shard_transformer_params

    qparams = TF.quantize_transformer_params_w8(params, qblock=4)
    mesh = make_mesh(dp=2, tp=4)
    with pytest.raises(ValueError, match="SINGLE-CHIP capacity path"):
        shard_transformer_params(qparams, mesh)


def test_tp_sharded_forward_matches_replicated(setup):
    cfg, params, hidden, enc, t, cos, sin = setup
    ref = np.asarray(
        TF.forward(params, cfg, hidden, enc, t, cos, sin, attn_impl="xla")
    )

    mesh = make_mesh(dp=2, tp=4)
    with mesh:
        sharded = shard_transformer_params(params, mesh)
        h_sh = shard_batch(hidden, mesh)
        got = np.asarray(
            TF.forward(sharded, cfg, h_sh, enc, t, cos, sin, attn_impl="xla")
        )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_sharding_placement(setup):
    cfg, params, *_ = setup
    mesh = make_mesh(dp=1, tp=8)
    sharded = shard_transformer_params(params, mesh)
    # to_q output dim is sharded over tp
    q = sharded["blocks"]["attn1"]["to_q"]["weight"]
    assert q.sharding.spec == jax.sharding.PartitionSpec(None, None, "tp")
    # each shard holds 1/8 of the output dim
    shard_shape = q.sharding.shard_shape(q.shape)
    assert shard_shape[2] == q.shape[2] // 8
    # norms replicated
    nq = sharded["blocks"]["attn1"]["norm_q"]["weight"]
    assert nq.sharding.shard_shape(nq.shape) == nq.shape


def test_denoise_loop_on_mesh(setup):
    """Full jitted denoise scan over the mesh — the multi-chip dry-run path."""
    cfg, params, hidden, enc, t, cos, sin = setup
    mesh = make_mesh(dp=2, tp=4)
    sigmas = jnp.asarray([1.0, 0.55, 0.1, 0.0], jnp.float32)
    timesteps = sigmas[:-1] * 1000.0
    skip = jnp.zeros((cfg.num_layers, 2), jnp.float32)
    with mesh:
        sharded = shard_transformer_params(params, mesh)
        lat = shard_batch(hidden, mesh)
        out = P.denoise_loop(
            sharded, cfg, lat, enc,
            jnp.ones((2, 5), jnp.float32),
            sigmas, timesteps, cos, sin,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            skip, jax.random.PRNGKey(0),
            num_conds=1, attn_impl="xla",
        )
    assert out.shape == hidden.shape
    assert np.isfinite(np.asarray(out)).all()

    # matches the unsharded loop
    ref = P.denoise_loop(
        params, cfg, hidden, enc,
        jnp.ones((2, 5), jnp.float32),
        sigmas, timesteps, cos, sin,
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        skip, jax.random.PRNGKey(0),
        num_conds=1, attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_i2v_denoise_loop_on_mesh(setup):
    """The image-conditioned denoise scan (per-token timesteps + conditioned
    first latent frame) sharded dp=2 x tp=4 matches the unsharded loop —
    conditioning composes with GSPMD like the t2v scan."""
    cfg, params, hidden, enc, t, cos, sin = setup
    mesh = make_mesh(dp=2, tp=4)
    sigmas = jnp.asarray([1.0, 0.55, 0.1, 0.0], jnp.float32)
    timesteps = sigmas[:-1] * 1000.0
    skip = jnp.zeros((cfg.num_layers, 2), jnp.float32)
    s = hidden.shape[1]
    cmask = np.zeros((2, s), np.float32)
    cmask[:, : s // 2] = 1.0  # first latent frame conditioned

    common = dict(num_conds=1, attn_impl="xla")
    ref = P.denoise_loop_i2v(
        params, cfg, hidden, jnp.asarray(cmask), enc,
        jnp.ones((2, 5), jnp.float32), sigmas, timesteps, cos, sin,
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0), skip, **common,
    )
    with mesh:
        sharded = shard_transformer_params(params, mesh)
        lat = shard_batch(hidden, mesh)
        out = P.denoise_loop_i2v(
            sharded, cfg, lat, shard_batch(jnp.asarray(cmask), mesh), enc,
            jnp.ones((2, 5), jnp.float32), sigmas, timesteps, cos, sin,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0), skip,
            **common,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
    # conditioned tokens held exactly on BOTH paths
    held = np.asarray(hidden)[:, : s // 2]
    np.testing.assert_array_equal(np.asarray(out)[:, : s // 2], held)
    np.testing.assert_array_equal(np.asarray(ref)[:, : s // 2], held)


def test_13b_structure_depth48_tp(setup):
    """48-layer 13B-structure config (scaled head_dim) through the sharded
    denoise scan — validates depth + TP at the real layer count."""
    cfg = TF.LtxTransformerConfig(
        in_channels=8,
        out_channels=8,
        num_attention_heads=32,   # real 13B head count
        attention_head_dim=6,     # scaled down (real: 128)
        cross_attention_dim=192,
        num_layers=48,            # real 13B depth
        caption_channels=16,
    )
    params = TF.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    f, h, w = 2, 2, 3
    s = f * h * w
    hidden = jnp.asarray(rng.normal(size=(1, s, 8)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 5, 16)), jnp.float32)
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    sigmas = jnp.asarray([1.0, 0.5, 0.0], jnp.float32)
    timesteps = sigmas[:-1] * 1000.0
    skip = np.zeros((48, 1), np.float32)
    skip[42, 0] = 1.0  # the 13B-distilled permanent skip block

    ref = P.denoise_loop(
        params, cfg, hidden, enc, jnp.ones((1, 5), jnp.float32),
        sigmas, timesteps, cos, sin,
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.asarray(skip), jax.random.PRNGKey(0),
        num_conds=1, attn_impl="xla", use_skip=True,
    )

    mesh = make_mesh(dp=1, tp=8)
    with mesh:
        sharded = shard_transformer_params(params, mesh)
        got = P.denoise_loop(
            sharded, cfg, hidden, enc, jnp.ones((1, 5), jnp.float32),
            sigmas, timesteps, cos, sin,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.asarray(skip), jax.random.PRNGKey(0),
            num_conds=1, attn_impl="xla", use_skip=True,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_sequence_parallel_attention(setup):
    """SP attention (q sharded over the mesh, K/V all-gathered) matches the
    unsharded oracle."""
    from candle_video_tpu.ops.attention import attention_xla
    from candle_video_tpu.parallel.sequence import sequence_parallel_attention

    rng = np.random.default_rng(0)
    b, s, hh, d = 1, 64, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, hh, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hh, d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    ref = np.asarray(attention_xla(q, k, v, scale))

    mesh = make_mesh(dp=1, tp=8)
    with mesh:
        got = np.asarray(
            sequence_parallel_attention(q, k, v, scale, mesh, impl="xla")
        )
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # with a key-padding bias
    mask01 = (rng.random((b, s)) > 0.3).astype(np.float32)
    bias = jnp.asarray(((1.0 - mask01) * -10000.0)[:, None, None, :])
    ref_b = np.asarray(attention_xla(q, k, v, scale, bias))
    with mesh:
        got_b = np.asarray(
            sequence_parallel_attention(q, k, v, scale, mesh, bias=bias,
                                        impl="xla")
        )
    np.testing.assert_allclose(got_b, ref_b, atol=2e-5)

    with pytest.raises(ValueError, match="not divisible"):
        sequence_parallel_attention(q[:, :63], k, v, scale, mesh)


def test_ring_attention_matches_all_gather_and_oracle():
    """Streaming ring attention == all-gather SP == single-device oracle."""
    from candle_video_tpu.ops.attention import attention_xla_bf16
    from candle_video_tpu.parallel.sequence import (
        ring_attention,
        sequence_parallel_attention,
    )

    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(7)
    B, S, H, D = 2, 64, 4, 16
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    scale = 0.25

    oracle = np.asarray(attention_xla_bf16(q, k, v, scale))
    ring = np.asarray(ring_attention(q, k, v, scale, mesh))
    gather = np.asarray(
        sequence_parallel_attention(q, k, v, scale, mesh, impl="xla_bf16")
    )
    np.testing.assert_allclose(ring, oracle, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(ring, gather, atol=2e-5, rtol=2e-5)


def test_ring_attention_rejects_indivisible_seq():
    from candle_video_tpu.parallel.sequence import ring_attention

    mesh = make_mesh(dp=1, tp=8)
    q = jnp.zeros((1, 63, 2, 8), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, q, q, 0.3, mesh)


def test_ring_attention_hlo_has_collective_permute():
    """The lowering must stream chunks via collective-permute (a ring), not
    gather the full sequence."""
    from candle_video_tpu.parallel.sequence import ring_attention

    mesh = make_mesh(dp=1, tp=8)
    q = jnp.zeros((1, 64, 2, 8), jnp.float32)
    hlo = (
        jax.jit(lambda a: ring_attention(a, a, a, 0.3, mesh))
        .lower(q)
        .compile()
        .as_text()
    )
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_ring_attention_pallas_chunk_matches_oracle():
    """The fused Pallas chunk-update ring (scores never materialized to
    HBM) matches the XLA ring and the single-device oracle."""
    from candle_video_tpu.ops.attention import attention_xla
    from candle_video_tpu.parallel.sequence import ring_attention

    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(11)
    for h, d in ((4, 64), (2, 128)):
        q = jnp.asarray(rng.normal(size=(2, 64, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, 64, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, 64, h, d)), jnp.float32)
        ref = np.asarray(attention_xla(q, k, v, 0.125))
        got_xla = np.asarray(ring_attention(q, k, v, 0.125, mesh,
                                            chunk_impl="xla"))
        got_pl = np.asarray(ring_attention(q, k, v, 0.125, mesh,
                                           chunk_impl="pallas"))
        np.testing.assert_allclose(got_xla, ref, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(got_pl, ref, atol=2e-5, rtol=2e-5)
