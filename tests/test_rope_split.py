"""Split rope layout: compact-table in-kernel q+k rotation (exact).

The split layout folds a lane permutation into the attn1 q/k projections
(attention scores are invariant under a shared q/k lane permutation), which
turns the interleaved rotation into a single half-group roll with compact
half-width tables — rotated entirely inside the packed kernel.  Parity
oracle: the standard interleaved path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from candle_video_tpu.models.ltx_video import transformer as TF
from candle_video_tpu.ops.attention import attention_xla
from candle_video_tpu.ops.pallas.flash_attention_packed import (
    flash_attention_packed,
)
from candle_video_tpu.ops.rope import (
    apply_rotary_emb,
    apply_rotary_emb_split,
    normalize_video_coords,
    rope_cos_sin,
    rope_split_permutation,
    rope_split_tables,
    video_coords_grid,
)


def _tables(f, h, w, dim):
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    return rope_cos_sin(grid, dim)


@pytest.mark.parametrize("heads,head_dim", [(4, 64), (2, 128)])
def test_split_rotation_equals_permuted_interleaved(rng, heads, head_dim):
    dim = heads * head_dim
    cos, sin = _tables(2, 3, 4, dim)
    x = jnp.asarray(rng.normal(size=(2, 24, dim)), jnp.float32)
    perm = rope_split_permutation(dim)
    cs = rope_split_tables(cos, sin)
    a = np.asarray(apply_rotary_emb_split(x[..., perm], cs))
    b = np.asarray(apply_rotary_emb(x, cos, sin)[..., perm])
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("heads,head_dim", [(4, 64), (2, 128)])
def test_packed_kernel_split_vs_oracle(rng, heads, head_dim):
    dim = heads * head_dim
    b, s = 2, 24
    cos, sin = _tables(2, 3, 4, dim)
    q = jnp.asarray(rng.normal(size=(b, s, dim)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, dim)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, dim)), jnp.float32)
    def oracle(kcos, ksin):
        qr = apply_rotary_emb(q, cos, sin)
        kr = apply_rotary_emb(k, kcos, ksin)
        return attention_xla(
            qr.reshape(b, s, heads, head_dim),
            kr.reshape(b, s, heads, head_dim),
            v.reshape(b, s, heads, head_dim),
            0.3,
        ).reshape(b, s, dim)

    perm = rope_split_permutation(dim)
    out = np.asarray(
        flash_attention_packed(
            q[..., perm],
            k[..., perm],
            v,
            num_heads=heads,
            scale=0.3,
            rope_split=rope_split_tables(cos, sin),
            interpret=True,
        )
    )
    # exact vs an oracle that models the kernel's bf16 k-side tables
    f32 = jnp.float32
    ref_b16 = oracle(cos.astype(jnp.bfloat16).astype(f32),
                     sin.astype(jnp.bfloat16).astype(f32))
    np.testing.assert_allclose(out, np.asarray(ref_b16), atol=2e-5, rtol=2e-5)
    # bf16-table rounding keeps the full-f32 oracle within bf16-level error
    # (~2^-8 relative on the rotated k, same class as the reference's BF16
    # CUDA attention path)
    np.testing.assert_allclose(out, np.asarray(oracle(cos, sin)),
                               atol=2.5e-2, rtol=2.5e-2)


def test_forward_split_rope_matches_standard(rng):
    cfg = TF.LtxTransformerConfig(
        in_channels=8,
        out_channels=8,
        num_attention_heads=2,
        attention_head_dim=64,
        cross_attention_dim=128,
        num_layers=2,
        caption_channels=16,
    )
    params = TF.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    f, h, w = 2, 2, 3
    s = f * h * w
    b = 2
    hidden = jnp.asarray(rng.normal(size=(b, s, 8)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(b, 5, 16)), jnp.float32)
    t = jnp.asarray([993.0, 31.0], jnp.float32)
    mask = jnp.ones((b, 5), jnp.float32).at[:, 3:].set(0.0)
    skip = jnp.asarray(np.eye(2, b, dtype=np.float32))
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)

    ref = TF.forward(
        params, cfg, hidden, enc, t, cos, sin,
        encoder_attention_mask=mask, skip_layer_mask=skip, attn_impl="xla",
    )
    out = TF.forward(
        TF.permute_params_rope_split(params, cfg),
        cfg, hidden, enc, t, cos, sin,
        encoder_attention_mask=mask, skip_layer_mask=skip,
        attn_impl="pallas", rope_split=rope_split_tables(cos, sin),
    )
    # both paths are f32; the residual is accumulation-order noise between
    # the packed kernel and XLA (measured ~2.6e-5 max at these magnitudes)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5
    )


def test_split_rope_requires_packed_kernel(rng):
    from candle_video_tpu.ops.attention import attention

    q = jnp.asarray(rng.normal(size=(1, 8, 2, 64)), jnp.float32)
    cs = jnp.zeros((1, 8, 128), jnp.float32)
    with pytest.raises(ValueError, match="split rope layout requires"):
        attention(q, q, q, 0.3, impl="xla", rope=("split", cs))


def test_permute_params_rejects_w8a8():
    cfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=128, num_layers=1,
        caption_channels=16,
    )
    params = TF.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = TF.quantize_transformer_params(params)
    with pytest.raises(ValueError, match="W8A8"):
        TF.permute_params_rope_split(qparams, cfg)


def test_denoise_loop_split_matches_standard(rng):
    """The full denoise scan with the split-rope fast path (permuted
    params + compact tables + packed kernel) matches the standard path —
    guards the generate()-level wiring end to end."""
    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S

    cfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=128, caption_channels=16,
        num_layers=2,
    )
    params = TF.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    f, h, w = 2, 2, 3
    lat = jnp.asarray(rng.normal(size=(1, f * h * w, 8)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    mask = jnp.ones((2, 5), jnp.float32)
    grid = normalize_video_coords(
        jnp.asarray(video_coords_grid(f, h, w))[None], 20, 2048, 2048
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    sch = S.set_timesteps(S.FlowMatchEulerSchedulerConfig(), num_inference_steps=3)
    skip = jnp.zeros((cfg.num_layers, 2), jnp.float32)
    key = jax.random.PRNGKey(5)

    ref = P.denoise_loop(
        params, cfg, lat, enc, mask, sch.sigmas_jnp, sch.timesteps_jnp,
        cos, sin, jnp.float32(3.0), jnp.float32(0.0), jnp.float32(0.0),
        skip, key, num_conds=2, attn_impl="xla",
    )
    got = P.denoise_loop(
        TF.permute_params_rope_split(params, cfg), cfg, lat, enc, mask,
        sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
        jnp.float32(3.0), jnp.float32(0.0), jnp.float32(0.0),
        skip, key, num_conds=2, attn_impl="pallas",
        rope_split=rope_split_tables(cos, sin),
    )
    # bf16-level: the packed kernel runs bf16 k tables + bf16 p matmuls
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-2, rtol=3e-2
    )
