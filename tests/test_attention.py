"""Attention tests: XLA reference path vs torch SDPA, Pallas kernel (interpret
mode on CPU) vs the XLA path — the reference's flash-vs-manual equivalence
(ltx_transformer.rs:689-741)."""

import numpy as np
import torch

import jax.numpy as jnp

from candle_video_tpu.ops.attention import attention_xla
from candle_video_tpu.ops.pallas.flash_attention import flash_attention


def _torch_sdpa(q, k, v, scale, bias=None):
    qt = torch.from_numpy(q).permute(0, 2, 1, 3)
    kt = torch.from_numpy(k).permute(0, 2, 1, 3)
    vt = torch.from_numpy(v).permute(0, 2, 1, 3)
    mask = torch.from_numpy(bias) if bias is not None else None
    out = torch.nn.functional.scaled_dot_product_attention(
        qt, kt, vt, attn_mask=mask, scale=scale
    )
    return out.permute(0, 2, 1, 3).numpy()


def test_attention_xla_vs_torch(rng):
    b, s, h, d = 2, 33, 4, 16
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    got = np.asarray(attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    np.testing.assert_allclose(got, _torch_sdpa(q, k, v, scale), atol=2e-5)


def test_attention_xla_cross_with_key_bias(rng):
    b, s, kk, h, d = 2, 17, 9, 4, 16
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, kk, h, d)).astype(np.float32)
    v = rng.normal(size=(b, kk, h, d)).astype(np.float32)
    # -10000-style additive padding bias (1 valid, 0 pad), [B,1,1,K]
    mask01 = (rng.random((b, kk)) > 0.3).astype(np.float32)
    bias = ((1.0 - mask01) * -10000.0)[:, None, None, :].astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    got = np.asarray(
        attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, jnp.asarray(bias))
    )
    np.testing.assert_allclose(got, _torch_sdpa(q, k, v, scale, bias), atol=2e-5)


def _flash_tol():
    # CPU interpreter does true-f32 matmuls; on TPU f32 matmuls are
    # bf16-reduced by default (MXU), so parity vs the HIGHEST-precision
    # oracle is looser for f32 inputs
    import jax

    return 2e-4 if jax.devices()[0].platform == "cpu" else 8e-3


def test_flash_attention_matches_xla(rng):
    b, s, h, d = 1, 300, 2, 64  # non-multiple of block sizes
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    ref = np.asarray(attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            scale=scale, block_q=128, block_k=128,
        )
    )
    np.testing.assert_allclose(got, ref, atol=_flash_tol())


def test_flash_attention_with_key_bias(rng):
    b, s, h, d = 1, 130, 2, 32
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    mask01 = (rng.random((b, s)) > 0.2).astype(np.float32)
    bias = ((1.0 - mask01) * -10000.0)[:, None, None, :].astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    ref = np.asarray(
        attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, jnp.asarray(bias))
    )
    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            scale=scale, bias=jnp.asarray(bias),
            block_q=128, block_k=128,
        )
    )
    np.testing.assert_allclose(got, ref, atol=_flash_tol())


def test_flash_attention_bf16(rng):
    b, s, h, d = 1, 256, 2, 64
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    ref = np.asarray(attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    got = np.asarray(
        flash_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), scale=scale,
            block_q=128, block_k=128,
        ).astype(jnp.float32)
    )
    assert np.mean((got - ref) ** 2) < 1e-4


def test_attention_xla_bf16_matches_oracle(rng):
    from candle_video_tpu.ops.attention import attention_xla_bf16

    b, s, kk, h, d = 1, 64, 9, 4, 16
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, kk, h, d)).astype(np.float32)
    v = rng.normal(size=(b, kk, h, d)).astype(np.float32)
    mask01 = (rng.random((b, kk)) > 0.3).astype(np.float32)
    bias = ((1.0 - mask01) * -10000.0)[:, None, None, :].astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    ref = np.asarray(attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                   scale, jnp.asarray(bias)))
    got = np.asarray(attention_xla_bf16(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), scale, jnp.asarray(bias),
    ).astype(jnp.float32))
    assert np.mean((got - ref) ** 2) < 1e-4


def test_w8a8_matmul_kernel(rng):
    from candle_video_tpu.ops.pallas.int8_matmul import (
        quantize_activations,
        w8a8_matmul,
    )

    m, k, n = 96, 256, 384
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.1
    s_w = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
    w_q = jnp.asarray(np.clip(np.round(w / s_w), -127, 127).astype(np.int8))
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    x_q, s_x = quantize_activations(x)
    assert x_q.dtype == jnp.int8
    got = np.asarray(
        w8a8_matmul(x_q, s_x, w_q, jnp.asarray(s_w), bias=bias,
                    block_m=32, block_n=128, block_k=128,
                    out_dtype=jnp.float32)
    )
    ref = np.asarray(x) @ w + np.asarray(bias)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, f"w8a8 kernel rel err {rel}"


def test_packed_auto_bound_matches_rowmax(rng):
    """softmax_bound="auto" (in-kernel per-row Cauchy-Schwarz bound) equals
    the row-max pass EXACTLY (shift invariance), natural and split layouts,
    at stressed score magnitudes, with and without bias."""
    from candle_video_tpu.ops.pallas.flash_attention_packed import (
        flash_attention_packed,
    )
    from candle_video_tpu.ops.rope import (
        rope_cos_sin,
        rope_split_permutation,
        rope_split_tables,
    )

    b, s, h, d = 1, 256, 4, 64
    scale = 1.0 / np.sqrt(d)
    # x3 amplitudes: realized |scores| up to ~25 — stresses the headroom
    q = jnp.asarray(rng.normal(size=(b, s, h * d)) * 3.0, jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h * d)) * 3.0, jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)

    ref = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                 interpret=True)
    got = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                 interpret=True, softmax_bound="auto")
    assert float(jnp.abs(ref - got).max()) < 1e-5

    # additive key bias (the masked cross-attention form)
    bias = jnp.asarray(
        np.where(rng.random((b, 1, 1, s)) > 0.3, 0.0, -10000.0), jnp.float32
    )
    ref_b = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                   bias=bias, interpret=True)
    got_b = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                   bias=bias, interpret=True,
                                   softmax_bound="auto")
    assert float(jnp.abs(ref_b - got_b).max()) < 1e-5

    # split layout: permuted q/k, in-kernel q+k rotation
    grid = jnp.asarray(rng.uniform(size=(1, s, 3)), jnp.float32)
    cos, sin = rope_cos_sin(grid, h * d)
    cs = rope_split_tables(cos, sin)
    perm = rope_split_permutation(h * d)
    qs, ks = q[:, :, perm], k[:, :, perm]
    ref_s = flash_attention_packed(qs, ks, v, num_heads=h, scale=scale,
                                   rope_split=cs, interpret=True)
    got_s = flash_attention_packed(qs, ks, v, num_heads=h, scale=scale,
                                   rope_split=cs, interpret=True,
                                   softmax_bound="auto")
    assert float(jnp.abs(ref_s - got_s).max()) < 1e-5


def test_packed_k_chunks_matches_one_block(rng):
    """k_chunks>1 (fixed-shift softmax decomposed over key chunks — the
    MXU/VPU-overlap A/B hook) equals the one-block kernel bit-for-bit up to
    f32 re-association: l and pv are plain sums under a fixed shift, so
    chunking only reorders the accumulation.  Measured SLOWER than the
    one-block kernel at S=4992 (benches/attn_trim_exp.py: kc3 ~1.1x auto —
    Mosaic already overlaps the one-block pipeline) so it is NOT
    dispatched, but the decomposition stays correct for other shapes."""
    from candle_video_tpu.ops.pallas.flash_attention_packed import (
        flash_attention_packed,
    )

    b, s, h, d = 1, 256, 4, 64
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, s, h * d)) * 3.0, jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h * d)) * 3.0, jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)

    ref = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                 interpret=True, softmax_bound="auto")
    got = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                 interpret=True, softmax_bound="auto",
                                 k_chunks=2)
    assert float(jnp.abs(ref - got).max()) < 1e-5

    # with key bias and a kv_len that pads (mask straddles a chunk edge)
    bias = jnp.asarray(
        np.where(rng.random((b, 1, 1, s)) > 0.3, 0.0, -10000.0), jnp.float32
    )
    ref_b = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                   bias=bias, interpret=True,
                                   softmax_bound="auto")
    got_b = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                   bias=bias, interpret=True,
                                   softmax_bound="auto", k_chunks=2)
    assert float(jnp.abs(ref_b - got_b).max()) < 1e-5

    # k_chunks without a fixed shift is rejected (row max is a two-pass)
    import pytest
    with pytest.raises(ValueError):
        flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                               interpret=True, k_chunks=2)


def test_score_head_map_covers_lane_layouts(rng):
    """The lane->head map used by the in-kernel bound matches the true head
    feature sets in both the natural and split lane layouts."""
    from candle_video_tpu.ops.pallas.flash_attention_packed import (
        score_head_map,
    )
    from candle_video_tpu.ops.rope import rope_split_permutation

    h, d = 4, 64
    q = rng.normal(size=(2, 8, h * d)).astype(np.float32)
    qh = q.reshape(2, 8, h, d)
    en_nat = (qh ** 2).sum(-1)

    hm = score_head_map(h * d, d, False)
    got = np.stack([(q[..., hm == i] ** 2).sum(-1) for i in range(h)], -1)
    np.testing.assert_allclose(got, en_nat, rtol=1e-5)

    perm = rope_split_permutation(h * d)
    qs = q[:, :, perm]
    hms = score_head_map(h * d, d, True)
    gots = np.stack([(qs[..., hms == i] ** 2).sum(-1) for i in range(h)], -1)
    np.testing.assert_allclose(gots, en_nat, rtol=1e-5)
    assert sorted(np.bincount(hms)) == [d] * h


def test_packed_full_lanes_grouping_matches_oracle():
    """lane_group_heads=H (the short-K cross-attention blocking experiment):
    all heads in one program, k/v resident once per batch.  Measured slower
    than the unfused XLA bf16 path at K=128 (benches/cross_attn_exp.py:
    1.42 vs 1.24 ms/layer) so it is NOT dispatched, but the blocking is kept
    correct for other shapes."""
    import numpy as np

    import jax.numpy as jnp

    from candle_video_tpu.ops.attention import attention_xla
    from candle_video_tpu.ops.pallas.flash_attention_packed import (
        flash_attention_packed,
    )

    rng = np.random.default_rng(0)
    b, s, k_len, h, d = 2, 40, 24, 4, 64
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, k_len, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, k_len, h, d)), jnp.float32)
    mask = np.ones((b, k_len), np.float32)
    mask[:, 20:] = 0.0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :], jnp.float32)
    scale = 1.0 / d**0.5

    ref = attention_xla(q, k, v, scale, bias=bias)
    got = flash_attention_packed(
        q.reshape(b, s, h * d), k.reshape(b, k_len, h * d),
        v.reshape(b, k_len, h * d), num_heads=h, scale=scale, bias=bias,
        lane_group_heads=h, interpret=True,
    ).reshape(b, s, h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)


def test_packed_long_kernel_matches_oracle(rng):
    """The multi-k-block long-sequence kernel (_packed_long / _kernel_long):
    K/V stream through in block_k tiles with fixed-shift partial-sum
    softmax — must match the XLA oracle at one-pass accuracy on every
    variant (plain, key bias with padding, in-kernel q rope, split rope).

    This is the kernel the dispatcher routes to beyond the one-pass VMEM
    envelope (S ~ 8-10k; long clips like 512x768x257f run S=12672)."""
    from candle_video_tpu.ops import attention_xla
    from candle_video_tpu.ops.pallas.flash_attention_packed import (
        _packed_long,
    )
    from candle_video_tpu.ops.rope import (
        apply_rotary_emb,
        rope_cos_sin,
        rope_split_permutation,
        rope_split_tables,
    )

    b, s, h, d = 1, 1000, 4, 64  # s % block_k != 0: last block is padded
    scale = 1.0 / np.sqrt(d)
    q4 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k4 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v4 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    q, k, v = (x.reshape(b, s, h * d) for x in (q4, k4, v4))

    ref = np.asarray(attention_xla(q4, k4, v4, scale), np.float32)
    got = np.asarray(
        _packed_long(q, k, v, num_heads=h, scale=scale, block_q=128,
                     block_k=256, interpret=True).reshape(b, s, h, d),
        np.float32,
    )
    assert ((got - ref) ** 2).mean() < 1e-6

    # short-K cross-attention with a -1e4 key mask (padding + bias fold)
    kv = 300
    k4c = jnp.asarray(rng.normal(size=(b, kv, h, d)), jnp.bfloat16)
    v4c = jnp.asarray(rng.normal(size=(b, kv, h, d)), jnp.bfloat16)
    bias = jnp.asarray(
        np.where(rng.random((b, 1, 1, kv)) > 0.3, 0.0, -10000.0), jnp.float32
    )
    ref_c = np.asarray(attention_xla(q4, k4c, v4c, scale, bias=bias),
                       np.float32)
    got_c = np.asarray(
        _packed_long(q, k4c.reshape(b, kv, h * d), v4c.reshape(b, kv, h * d),
                     num_heads=h, scale=scale, bias=bias, block_q=128,
                     block_k=128, interpret=True).reshape(b, s, h, d),
        np.float32,
    )
    assert ((got_c - ref_c) ** 2).mean() < 1e-6

    # in-kernel q rotation (k pre-rotated outside)
    grid = jnp.asarray(rng.uniform(size=(1, s, 3)), jnp.float32)
    cos, sin = rope_cos_sin(grid, h * d)
    qr = apply_rotary_emb(q4, cos.reshape(1, s, h, d), sin.reshape(1, s, h, d))
    kr = apply_rotary_emb(k4, cos.reshape(1, s, h, d), sin.reshape(1, s, h, d))
    ref_r = np.asarray(attention_xla(qr, kr, v4, scale), np.float32)
    got_r = np.asarray(
        _packed_long(q, kr.reshape(b, s, h * d), v, num_heads=h, scale=scale,
                     rope_q=(cos, sin), block_q=128, block_k=256,
                     interpret=True).reshape(b, s, h, d),
        np.float32,
    )
    assert ((got_r - ref_r) ** 2).mean() < 1e-6

    # split lane layout: q AND k rotate inside the kernel per key block
    cs = rope_split_tables(cos, sin)
    perm = rope_split_permutation(h * d)
    got_s = np.asarray(
        _packed_long(q[..., perm], k[..., perm], v, num_heads=h, scale=scale,
                     rope_split=cs, block_q=128, block_k=256,
                     interpret=True).reshape(b, s, h, d),
        np.float32,
    )
    assert ((got_s - ref_r) ** 2).mean() < 1e-6


def test_packed_wrapper_routes_long_sequences(rng, monkeypatch):
    """flash_attention_packed silently delegates to the long kernel when
    K_pad exceeds the one-pass envelope — same answer either side of the
    threshold (threshold lowered here so the test stays CPU-sized)."""
    from candle_video_tpu.ops.pallas import flash_attention_packed as fap

    b, s, h, d = 1, 648, 2, 64  # distinct shape: forces a fresh jit trace
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)

    ref = fap.flash_attention_packed(
        q, k, v, num_heads=h, scale=scale, interpret=True,
        softmax_bound="auto",
    )
    monkeypatch.setattr(fap, "_ONEPASS_KP_MAX", 256)
    got = fap.flash_attention_packed(
        q + 0, k, v, num_heads=h, scale=scale, interpret=True,
        softmax_bound="auto", block_q=128,
    )
    assert float(jnp.abs(ref - got).max()) < 1e-5
    # viability no longer caps sequence length (only the lane grouping)
    assert fap.packed_viable(100_000, 100_000, h, d)
    assert not fap.packed_viable(256, 256, 3, 64)  # 3 heads % 2 per group


def test_transformer_forward_long_kernel_gate(rng, monkeypatch):
    """Model-level gate for the long-sequence regime: a DiT forward whose
    self-attention routes through the LONG multi-k-block kernel (threshold
    lowered to stay CPU-sized; production hits it at S=12672 for
    512x768x257f) must match the XLA-attention forward to the DiT parity
    envelope (MSE < 1e-4, the reference's transformer gate)."""
    import jax

    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video.pipeline import build_video_coords
    from candle_video_tpu.ops.pallas import flash_attention_packed as fap
    from candle_video_tpu.ops.rope import rope_cos_sin

    cfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=128, num_layers=2,
        caption_channels=16,
    )
    params = TF.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    f, h, w = 6, 13, 14  # S = 1092 (not a block multiple: padding in play)
    s = f * h * w
    hidden = jnp.asarray(rng.normal(size=(1, s, 8)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 8, 16)) * 0.3, jnp.float32)
    t = jnp.full((1,), 993.0, jnp.float32)
    coords = build_video_coords(f, h, w, frame_rate=25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [cfg.rope_base_num_frames, cfg.rope_base_height, cfg.rope_base_width],
        jnp.float32,
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim, cfg.rope_theta)

    ref = np.asarray(
        TF.forward(params, cfg, hidden, enc, t, cos, sin, attn_impl="xla")
    )
    monkeypatch.setattr(fap, "_ONEPASS_KP_MAX", 512)  # force the long route
    got = np.asarray(
        TF.forward(params, cfg, hidden, enc, t, cos, sin, attn_impl="pallas")
    )
    mse = float(((got - ref) ** 2).mean())
    assert mse < 1e-4, mse
