"""W4A16 int4 weight-only path: kernels, quantizers, loaders, dispatch.

The capacity tier below W8A16: packed-nibble weights with affine
per-group-32 scale+min (GGUF Q4_K's dequant form — the reference serves
exactly this tier via GGUF Q4_K T5, README.md quantization table; here it
also carries the 13B DiT so the int8 T5-XXL stays RESIDENT next to it on
one 16 GiB chip, benches/bench_13b.py).  Kernel details:
ops/pallas/int4_weight_matmul.py (K-half planar packing).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from candle_video_tpu.models.ltx_video import transformer as T  # noqa: E402
from candle_video_tpu.ops.pallas.int4_weight_matmul import (  # noqa: E402
    dequantize_int4_blockwise,
    quantize_int4_blockwise,
    w4_matmul,
    w4_matmul_auto,
    w4_matmul_xla,
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Quantizer
# ---------------------------------------------------------------------------


def test_quantize_int4_roundtrip_error_bound(rng):
    """Affine group-32 int4: reconstruction error is bounded by s/2 per
    element (round-to-nearest on a 16-level grid spanning the group)."""
    w = rng.normal(size=(256, 96)).astype(np.float32) * 0.02
    p, s, m = quantize_int4_blockwise(w)
    assert p.shape == (128, 96) and p.dtype == np.uint8
    assert s.shape == (8, 96) and m.shape == (8, 96)
    wd = dequantize_int4_blockwise(p, s, m)
    err = np.abs(wd - w)
    bound = np.repeat(np.asarray(s, np.float32), 32, axis=0) * 0.5 + 1e-7
    assert (err <= bound).all(), (err / bound).max()
    # group extremes are exact: min maps to q=0, max to q=15
    g = w.reshape(8, 32, 96)
    np.testing.assert_allclose(
        wd.reshape(8, 32, 96).min(axis=1), g.min(axis=1), rtol=1e-6, atol=1e-7
    )


def test_quantize_int4_exact_on_grid(rng):
    """Values already on a 16-level affine grid survive the round trip
    exactly when the grid extremes occur in each group (min/max affine
    quantization recovers (s, m) from q=0 and q=15; the FORMAT can carry
    any GGUF Q4_K payload — the bit-exact fold sets (s, m) directly)."""
    q = rng.integers(0, 16, size=(64, 8)).astype(np.float32)
    q[0::32] = 0.0  # pin the extremes in every group of 32
    q[1::32] = 15.0
    s = 0.013
    m = -0.1
    w = (q * s + m).astype(np.float32)
    p, sq, mq = quantize_int4_blockwise(w)
    wd = dequantize_int4_blockwise(p, sq, mq)
    np.testing.assert_allclose(wd, w, rtol=1e-6, atol=1e-7)


def test_quantize_int4_stacked_layers(rng):
    """Leading layer dims quantize independently (stacked [L, K, N])."""
    w = rng.normal(size=(3, 64, 16)).astype(np.float32)
    p, s, m = quantize_int4_blockwise(w)
    assert p.shape == (3, 32, 16) and s.shape == (3, 2, 16)
    for i in range(3):
        pi, si, mi = quantize_int4_blockwise(w[i])
        np.testing.assert_array_equal(p[i], pi)
        np.testing.assert_array_equal(s[i], si)


def test_quantize_int4_bf16_scales(rng):
    """scale_dtype='bfloat16' (the 5-bpw 13B tier) quantizes AGAINST the
    rounded scales, so dequant stays consistent: error bound still holds
    with the bf16 scale used in the reconstruction."""
    import ml_dtypes

    w = rng.normal(size=(128, 32)).astype(np.float32) * 0.02
    p, s, m = quantize_int4_blockwise(w, scale_dtype="bfloat16")
    assert s.dtype == ml_dtypes.bfloat16 and m.dtype == ml_dtypes.bfloat16
    wd = dequantize_int4_blockwise(p, s, m)
    bound = np.repeat(np.asarray(s, np.float32), 32, axis=0) * 0.5
    # bf16 min rounding adds at most ~0.4% of |m| on top of the s/2 grid
    slack = np.abs(np.repeat(np.asarray(m, np.float32), 32, axis=0)) * 0.004
    assert (np.abs(wd - w) <= bound + slack + 1e-7).all()


def test_quantize_int4_rejects_straddling_groups():
    with pytest.raises(AssertionError, match="multiple of 2\\*qblock"):
        quantize_int4_blockwise(np.zeros((32, 8), np.float32), qblock=32)


# ---------------------------------------------------------------------------
# Matmul kernels (interpret on CPU; on-chip parity in test_tpu_parity)
# ---------------------------------------------------------------------------


def _oracle(x, p, s, m):
    wd = dequantize_int4_blockwise(p, s, m)
    return np.asarray(
        (jnp.asarray(x, jnp.bfloat16)
         @ jnp.asarray(wd, jnp.float32).astype(jnp.bfloat16)
         ).astype(jnp.float32)
    )


@pytest.mark.parametrize("shape", [(8, 256, 384), (130, 192, 128),
                                   (16, 64, 40)])
def test_w4_matmul_xla_matches_dequant_oracle(rng, shape):
    mdim, k, n = shape
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    x = rng.normal(size=(mdim, k)).astype(np.float32)
    p, s, m = quantize_int4_blockwise(w)
    got = np.asarray(
        w4_matmul_xla(jnp.asarray(x), jnp.asarray(p), jnp.asarray(s),
                      jnp.asarray(m)).astype(jnp.float32)
    )
    ref = _oracle(x, p, s, m)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4 * np.abs(ref).max())


@pytest.mark.parametrize("shape,block_k", [
    ((8, 256, 384), 128),   # multiple k-blocks
    ((130, 192, 128), 1024),  # single padded k-block, padded M
    ((64, 1280, 512), 512),   # k padding inside the halves
])
def test_w4_matmul_pallas_matches_dequant_oracle(rng, shape, block_k):
    mdim, k, n = shape
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    x = rng.normal(size=(mdim, k)).astype(np.float32)
    p, s, m = quantize_int4_blockwise(w)
    got = np.asarray(
        w4_matmul(jnp.asarray(x), jnp.asarray(p), jnp.asarray(s),
                  jnp.asarray(m), block_k=block_k).astype(jnp.float32)
    )
    ref = _oracle(x, p, s, m)
    # accumulation-order differences across k-tiles (f32 partial sums)
    np.testing.assert_allclose(got, ref, rtol=0, atol=4e-3 * np.abs(ref).max())


def test_w4_matmul_bias_and_out_dtype(rng):
    w = rng.normal(size=(64, 32)).astype(np.float32)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    p, s, m = quantize_int4_blockwise(w)
    y = w4_matmul(jnp.asarray(x), jnp.asarray(p), jnp.asarray(s),
                  jnp.asarray(m), bias=jnp.asarray(b), out_dtype=jnp.float32)
    y0 = w4_matmul(jnp.asarray(x), jnp.asarray(p), jnp.asarray(s),
                   jnp.asarray(m), out_dtype=jnp.float32)
    assert y.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0) + b, rtol=1e-5,
                               atol=1e-5)


def test_w4_matmul_auto_dispatches_by_m(rng):
    """Both regimes of the auto dispatch agree with the oracle (fused
    Pallas below W4_XLA_MIN_M, transient XLA above)."""
    k, n = 128, 64
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    p, s, m = quantize_int4_blockwise(w)
    for mdim in (8, 2048):
        x = rng.normal(size=(mdim, k)).astype(np.float32)
        got = np.asarray(
            w4_matmul_auto(jnp.asarray(x), jnp.asarray(p), jnp.asarray(s),
                           jnp.asarray(m)).astype(jnp.float32)
        )
        ref = _oracle(x, p, s, m)
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=2e-3 * np.abs(ref).max())


# ---------------------------------------------------------------------------
# Transformer integration
# ---------------------------------------------------------------------------


def _tiny_cfg(num_layers=2):
    return T.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=num_layers,
        caption_channels=16,
    )


def _forward_inputs(cfg, seed=0, batch=2, f=2, h=3, w=4):
    from candle_video_tpu.ops.rope import rope_cos_sin

    rng = np.random.default_rng(seed)
    s = f * h * w
    hidden = jnp.asarray(rng.normal(size=(batch, s, cfg.in_channels)),
                         jnp.float32)
    enc = jnp.asarray(rng.normal(size=(batch, 5, cfg.caption_channels)),
                      jnp.float32)
    t = jnp.asarray([500.0] * batch, jnp.float32)
    mask = jnp.ones((batch, 5), jnp.float32)
    grid = jnp.asarray(
        np.stack(np.meshgrid(np.arange(float(f)), np.arange(float(h)),
                             np.arange(float(w)), indexing="ij"),
                 -1).reshape(-1, 3)
    )[None] / jnp.asarray([20.0, 2048.0, 2048.0])
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    return hidden, enc, t, mask, cos, sin


def _fwd(params, cfg, inputs):
    hidden, enc, t, mask, cos, sin = inputs
    return np.asarray(
        T.forward(params, cfg, hidden, enc, t, cos, sin,
                  encoder_attention_mask=mask, attn_impl="xla")
    )


def test_w4_weight_only_forward_close():
    """W4A16 transformer forward stays close to dense: only the weight
    rounding differs (activations stay full precision), ~2x the W8A16
    error (4-bit affine group quantization)."""
    cfg = _tiny_cfg()
    params = T.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    inputs = _forward_inputs(cfg, seed=23)
    qparams = T.quantize_transformer_params_w4(params, qblock=4,
                                               scale_dtype=np.float32)
    assert qparams["blocks"]["attn1"]["to_q"]["w4"].dtype == jnp.uint8
    assert qparams["blocks"]["attn1"]["to_q"]["w4"].shape == (
        cfg.num_layers, 12, 24
    )  # K=24 packed to 12 bytes
    assert qparams["blocks"]["ff"]["net_2"]["w4_scale"].shape == (
        cfg.num_layers, 96 // 4, 24
    )
    assert "weight" in qparams["proj_in"]  # non-block linears stay dense
    ref = _fwd(params, cfg, inputs)
    got = _fwd(qparams, cfg, inputs)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.06, f"w4 weight-only relative error {rel}"
    assert np.abs(got - ref).max() > 0  # the quantized path really ran


def test_w4_forward_matches_dequantized_dense_exactly():
    """The W4 forward must match the dense forward run on the dequantized
    weights to bf16 rounding: quantization error is entirely in the
    weights, the execution path adds only the bf16 matmul cast (the dense
    f32 oracle multiplies in f32; the W4 path feeds the MXU bf16)."""
    cfg = _tiny_cfg()
    params = T.init_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    inputs = _forward_inputs(cfg, seed=31)
    qparams = T.quantize_transformer_params_w4(params, qblock=4,
                                               scale_dtype=np.float32)

    def dq(p):
        if "w4" not in p:
            return p
        out = {"weight": jnp.asarray(np.stack([
            dequantize_int4_blockwise(
                np.asarray(p["w4"][i]), np.asarray(p["w4_scale"][i]),
                np.asarray(p["w4_min"][i]), qblock=4)
            for i in range(p["w4"].shape[0])
        ]))}
        if "bias" in p:
            out["bias"] = p["bias"]
        return out

    dparams = jax.tree.map(
        dq, qparams,
        is_leaf=lambda x: isinstance(x, dict) and ("w4" in x or "weight" in x),
    )
    got = _fwd(qparams, cfg, inputs)
    ref = _fwd(dparams, cfg, inputs)
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=2e-3 * np.abs(ref).max())
    # ...and far closer than the quantization error itself (the point):
    dense = _fwd(T.init_params(jax.random.PRNGKey(9), cfg,
                               dtype=jnp.float32), cfg, inputs)
    assert np.abs(got - ref).max() < 0.25 * np.abs(got - dense).max()


def test_w4_permute_quantize_commute():
    """Split-rope support: permuting packed nibble columns + their
    per-(group, column) scale/min is EXACTLY the quantization of the
    permuted dense weight (packing runs along K, columns are independent)."""
    from candle_video_tpu.ops.rope import rope_split_permutation

    cfg = T.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=32, num_layers=2,
        caption_channels=16,
    )
    params = T.init_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    q_then_p = T.permute_params_rope_split(
        T.quantize_transformer_params_w4(params, qblock=4,
                                         scale_dtype=np.float32), cfg
    )
    perm = np.asarray(rope_split_permutation(cfg.inner_dim))
    a1 = {**params["blocks"]["attn1"]}
    for name in ("to_q", "to_k"):
        lin = {"weight": a1[name]["weight"][..., perm]}
        if "bias" in a1[name]:
            lin["bias"] = a1[name]["bias"][..., perm]
        a1[name] = lin
    p_then_q = T.quantize_transformer_params_w4(
        {**params, "blocks": {**params["blocks"],
                              "attn1": {**params["blocks"]["attn1"], **a1}}},
        qblock=4, scale_dtype=np.float32,
    )
    for name in ("to_q", "to_k"):
        for key in ("w4", "w4_scale", "w4_min"):
            np.testing.assert_array_equal(
                np.asarray(q_then_p["blocks"]["attn1"][name][key]),
                np.asarray(p_then_q["blocks"]["attn1"][name][key]),
                err_msg=f"{name}.{key}",
            )


def test_init_params_w4_runs_forward():
    """Direct-int4 random init (13B smoke path): packed payloads +
    constant bf16 scale/min; forward runs and is finite."""
    cfg = _tiny_cfg()
    params = T.init_params_w4(jax.random.PRNGKey(2), cfg, qblock=4,
                              dtype=jnp.float32)
    assert params["blocks"]["attn2"]["to_v"]["w4"].shape == (2, 12, 24)
    assert params["blocks"]["attn2"]["to_v"]["w4"].dtype == jnp.uint8
    assert params["blocks"]["attn2"]["to_v"]["w4_scale"].dtype == jnp.bfloat16
    assert "weight" not in params["blocks"]["ff"]["net_0_proj"]
    out = _fwd(params, cfg, _forward_inputs(cfg, seed=31))
    assert out.shape == (2, 24, 8)
    assert np.isfinite(out).all()


def test_w4_streaming_loader_matches_dense_quantize():
    """The streaming host-side w4 loader must produce BIT-IDENTICAL packed
    payloads/scales to loading dense then quantizing at f32; with
    rope_split=True it must equal permuting the quantized tree."""
    from test_transformer import _tiny_diffusers_sd

    from candle_video_tpu.models.ltx_video.loader import (
        transformer_params_from_state_dict,
        transformer_params_w4_from_state_dict,
    )

    cfg = T.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=32, num_layers=2,
        caption_channels=16,
    )
    sd = _tiny_diffusers_sd(cfg, np.random.default_rng(3))

    dense = transformer_params_from_state_dict(sd, cfg, jnp.float32)
    qdense = T.quantize_transformer_params_w4(dense, qblock=4,
                                              scale_dtype=np.float32)
    stream = transformer_params_w4_from_state_dict(
        sd, cfg, jnp.float32, qblock=4, scale_dtype=np.float32
    )

    def leaves(p):
        flat, _ = jax.tree.flatten_with_path(p)
        return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}

    a, b = leaves(qdense), leaves(stream)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    split_stream = transformer_params_w4_from_state_dict(
        sd, cfg, jnp.float32, qblock=4, scale_dtype=np.float32,
        rope_split=True,
    )
    split_ref = T.permute_params_rope_split(qdense, cfg)
    a, b = leaves(split_ref), leaves(split_stream)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_cli_rejects_int4_with_int8_or_mesh():
    from candle_video_tpu.cli import main

    with pytest.raises(SystemExit, match="single-chip capacity path"):
        main(["--dit-int4", "--mesh", "tp=2"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["--dit-int4", "--dit-int8"])
