"""DiT transformer parity vs the independent torch mirror.

Mirrors the reference's verify_dit_parity strategy (tests/
verify_dit_parity.rs: tiny randomly-init model, max-abs < 2e-3) with the
torch mirror in scripts/torch_ltx.py standing in for diffusers.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import torch_ltx  # noqa: E402

from candle_video_tpu.models.ltx_video import transformer as T  # noqa: E402
from candle_video_tpu.models.ltx_video.loader import (  # noqa: E402
    torch_state_dict_to_numpy,
    transformer_params_from_state_dict,
)
from candle_video_tpu.ops.rope import normalize_video_coords, rope_cos_sin  # noqa: E402


TINY = dict(
    in_channels=8,
    out_channels=8,
    heads=2,
    dim_head=12,  # inner 24, 24 % 6 == 0
    cross_attention_dim=24,
    num_layers=2,
    caption_channels=16,
)


def tiny_cfg(num_layers=2):
    return T.LtxTransformerConfig(
        in_channels=8,
        out_channels=8,
        num_attention_heads=2,
        attention_head_dim=12,
        cross_attention_dim=24,
        num_layers=num_layers,
        caption_channels=16,
    )


@pytest.fixture(scope="module")
def tiny_models():
    torch.manual_seed(0)
    tm = torch_ltx.LtxTransformer3D(**TINY).eval()
    cfg = tiny_cfg()
    sd = torch_state_dict_to_numpy(tm.state_dict())
    params = transformer_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    return tm, cfg, params


def _inputs(batch=2, f=2, h=3, w=4, k=5, seed=0):
    rng = np.random.default_rng(seed)
    s = f * h * w
    hidden = rng.normal(size=(batch, s, 8)).astype(np.float32)
    enc = rng.normal(size=(batch, k, 16)).astype(np.float32)
    t = np.array([500.0] * batch, np.float32)
    mask = np.ones((batch, k), np.float32)
    mask[:, -1] = 0.0
    from candle_video_tpu.ops.rope import video_coords_grid

    coords = np.broadcast_to(video_coords_grid(f, h, w)[None], (batch, s, 3)).copy()
    return hidden, enc, t, mask, coords


def _jax_forward(params, cfg, hidden, enc, t, mask, coords, skip=None):
    grid = normalize_video_coords(
        jnp.asarray(coords), cfg.rope_base_num_frames, cfg.rope_base_height,
        cfg.rope_base_width,
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim, cfg.rope_theta)
    return np.asarray(
        T.forward(
            params,
            cfg,
            jnp.asarray(hidden),
            jnp.asarray(enc),
            jnp.asarray(t),
            cos,
            sin,
            encoder_attention_mask=jnp.asarray(mask),
            skip_layer_mask=None if skip is None else jnp.asarray(skip),
            attn_impl="xla",
        )
    )


def test_forward_parity_f32(tiny_models):
    tm, cfg, params = tiny_models
    hidden, enc, t, mask, coords = _inputs()
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(hidden),
            torch.from_numpy(enc),
            torch.from_numpy(t),
            torch.from_numpy(coords),
            torch.from_numpy(mask),
        ).numpy()
    got = _jax_forward(params, cfg, hidden, enc, t, mask, coords)
    assert got.shape == ref.shape == (2, 24, 8)
    assert np.abs(got - ref).max() < 2e-3  # reference dit parity envelope
    assert np.mean((got - ref) ** 2) < 1e-4


def test_forward_parity_no_mask(tiny_models):
    tm, cfg, params = tiny_models
    hidden, enc, t, _, coords = _inputs(seed=3)
    full = np.ones((2, 5), np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(hidden), torch.from_numpy(enc),
            torch.from_numpy(t), torch.from_numpy(coords),
        ).numpy()
    got = _jax_forward(params, cfg, hidden, enc, t, full, coords)
    assert np.abs(got - ref).max() < 2e-3


def test_skip_layer_mask_parity(tiny_models):
    tm, cfg, params = tiny_models
    hidden, enc, t, mask, coords = _inputs(seed=7)
    skip = np.array([[1.0, 0.0], [0.0, 0.0]], np.float32)  # skip layer0/batch0
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(hidden), torch.from_numpy(enc),
            torch.from_numpy(t), torch.from_numpy(coords),
            torch.from_numpy(mask), torch.from_numpy(skip),
        ).numpy()
    got = _jax_forward(params, cfg, hidden, enc, t, mask, coords, skip=skip)
    assert np.abs(got - ref).max() < 2e-3


def test_skip_all_layers_is_modulated_identity(tiny_models):
    """With every layer skipped, only the outer proj/modulation applies —
    and per-batch masks differ from the unskipped batch element."""
    tm, cfg, params = tiny_models
    hidden, enc, t, mask, coords = _inputs(seed=9)
    skip_b0 = np.array([[1.0, 0.0], [1.0, 0.0]], np.float32)
    got = _jax_forward(params, cfg, hidden, enc, t, mask, coords, skip=skip_b0)
    got_noskip = _jax_forward(params, cfg, hidden, enc, t, mask, coords)
    # batch 1 unaffected by the mask
    np.testing.assert_allclose(got[1], got_noskip[1], atol=1e-5)
    # batch 0 differs (blocks were skipped)
    assert np.abs(got[0] - got_noskip[0]).max() > 1e-4


def test_build_skip_layer_mask():
    m = T.build_skip_layer_mask(4, 2, [1, 3])
    assert m.shape == (4, 2)
    np.testing.assert_array_equal(m[:, 0], [0, 1, 0, 1])


def test_bf16_forward_close_to_f32(tiny_models):
    tm, cfg, params = tiny_models
    hidden, enc, t, mask, coords = _inputs(seed=11)
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    f32 = _jax_forward(params, cfg, hidden, enc, t, mask, coords)
    b16 = _jax_forward(params_bf16, cfg, hidden, enc, t, mask, coords)
    assert np.mean((f32 - b16.astype(np.float32)) ** 2) < 5e-3


def test_jit_and_shapes(tiny_models):
    _, cfg, params = tiny_models
    hidden, enc, t, mask, coords = _inputs(seed=13)
    grid = normalize_video_coords(jnp.asarray(coords), 20, 2048, 2048)
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)

    import functools

    fwd = jax.jit(
        functools.partial(T.forward, attn_impl="xla"), static_argnames=("cfg",)
    )
    out = fwd(params, cfg, jnp.asarray(hidden), jnp.asarray(enc), jnp.asarray(t),
              cos, sin)
    assert out.shape == (2, 24, 8)


def test_w8a8_quantized_forward_close(tiny_models):
    """Opt-in W8A8 path: int8 QKVO+FF with dynamic activation scales stays
    close to the full-precision forward on a tiny model."""
    tm, cfg, params = tiny_models
    hidden, enc, t, mask, coords = _inputs(seed=21)
    qparams = T.quantize_transformer_params(params)
    # quantized leaves really are int8
    assert qparams["blocks"]["attn1"]["to_q"]["weight_q"].dtype == jnp.int8
    ref = _jax_forward(params, cfg, hidden, enc, t, mask, coords)
    got = _jax_forward(qparams, cfg, hidden, enc, t, mask, coords)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.05, f"w8a8 relative error {rel}"
    # and it actually differs (the quantized path ran)
    assert np.abs(got - ref).max() > 0


def test_w8_weight_only_forward_close(tiny_models):
    """Weight-only int8 (W8A16, the 13B-on-one-chip path): int8 block
    weights with dequant fused into the Pallas matmul must stay closer to
    the dense forward than W8A8 (no activation quantization error)."""
    tm, cfg, params = tiny_models
    hidden, enc, t, mask, coords = _inputs(seed=23)
    qparams = T.quantize_transformer_params_w8(params, qblock=8)
    assert qparams["blocks"]["attn1"]["to_q"]["w8"].dtype == jnp.int8
    assert qparams["blocks"]["ff"]["net_2"]["w8_scale"].shape == (
        cfg.num_layers, 96 // 8, 24
    )
    # non-block linears stay dense
    assert "weight" in qparams["proj_in"]
    ref = _jax_forward(params, cfg, hidden, enc, t, mask, coords)
    got = _jax_forward(qparams, cfg, hidden, enc, t, mask, coords)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.03, f"w8 weight-only relative error {rel}"
    assert np.abs(got - ref).max() > 0  # the quantized path really ran


def test_w8_permute_quantize_commute():
    """Split-rope support for w8 params: permuting int8 columns + their
    per-(group, column) scales is EXACTLY the quantization of the permuted
    dense weight (whole output columns move, groups run along K)."""
    from candle_video_tpu.ops.rope import rope_split_permutation

    cfg = T.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=32, num_layers=2,
        caption_channels=16,
    )  # inner_dim 128 — the split layout's lane-group requirement
    params = T.init_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    q_then_p = T.permute_params_rope_split(
        T.quantize_transformer_params_w8(params, qblock=8), cfg
    )
    perm = np.asarray(rope_split_permutation(cfg.inner_dim))
    dense_p = jax.tree.map(lambda x: x, params)  # shallow copy via identity
    a1 = {**dense_p["blocks"]["attn1"]}
    for name in ("to_q", "to_k"):
        lin = {"weight": a1[name]["weight"][..., perm]}
        if "bias" in a1[name]:
            lin["bias"] = a1[name]["bias"][..., perm]
        a1[name] = lin
    p_then_q = T.quantize_transformer_params_w8(
        {**params, "blocks": {**params["blocks"],
                              "attn1": {**params["blocks"]["attn1"], **a1}}},
        qblock=8,
    )
    for name in ("to_q", "to_k"):
        np.testing.assert_array_equal(
            np.asarray(q_then_p["blocks"]["attn1"][name]["w8"]),
            np.asarray(p_then_q["blocks"]["attn1"][name]["w8"]),
        )
        np.testing.assert_array_equal(
            np.asarray(q_then_p["blocks"]["attn1"][name]["w8_scale"]),
            np.asarray(p_then_q["blocks"]["attn1"][name]["w8_scale"]),
        )


def test_init_params_w8_runs_forward():
    """Direct-int8 random init (13B smoke path): block linears carry int8
    payloads + constant scales, non-block leaves come from the standard
    builder; the forward runs and is finite."""
    cfg = tiny_cfg()
    params = T.init_params_w8(jax.random.PRNGKey(2), cfg, qblock=8,
                              dtype=jnp.float32)
    assert params["blocks"]["attn2"]["to_v"]["w8"].shape == (2, 24, 24)
    assert params["blocks"]["attn2"]["to_v"]["w8"].dtype == jnp.int8
    assert "weight" not in params["blocks"]["ff"]["net_0_proj"]
    hidden, enc, t, mask, coords = _inputs(seed=31)
    out = _jax_forward(params, cfg, hidden, enc, t, mask, coords)
    assert out.shape == (2, 24, 8)
    assert np.isfinite(out).all()


def _tiny_diffusers_sd(cfg, rng):
    """Minimal diffusers-layout transformer state dict (torch [out,in])."""
    d = cfg.inner_dim

    def lin(n_out, n_in):
        return {
            "weight": rng.normal(size=(n_out, n_in)).astype(np.float32) * 0.05,
            "bias": rng.normal(size=(n_out,)).astype(np.float32) * 0.01,
        }

    sd = {}

    def put(prefix, p):
        for k, v in p.items():
            sd[f"{prefix}.{k}"] = v

    put("proj_in", lin(d, cfg.in_channels))
    put("time_embed.emb.timestep_embedder.linear_1", lin(d, 256))
    put("time_embed.emb.timestep_embedder.linear_2", lin(d, d))
    put("time_embed.linear", lin(6 * d, d))
    put("caption_projection.linear_1", lin(d, cfg.caption_channels))
    put("caption_projection.linear_2", lin(d, d))
    sd["scale_shift_table"] = rng.normal(size=(2, d)).astype(np.float32)
    put("proj_out", lin(cfg.out_channels, d))
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        # attn2 k/v consume the PROJECTED caption states (inner_dim) — the
        # real checkpoints' attn2.to_k/to_v are [d, d], like _param_spec
        for attn, kv in (("attn1", d), ("attn2", d)):
            sd[f"{pre}.{attn}.norm_q.weight"] = rng.normal(
                size=(d,)).astype(np.float32)
            sd[f"{pre}.{attn}.norm_k.weight"] = rng.normal(
                size=(d,)).astype(np.float32)
            put(f"{pre}.{attn}.to_q", lin(d, d))
            put(f"{pre}.{attn}.to_k", lin(d, kv))
            put(f"{pre}.{attn}.to_v", lin(d, kv))
            put(f"{pre}.{attn}.to_out.0", lin(d, d))
        put(f"{pre}.ff.net.0.proj", lin(4 * d, d))
        put(f"{pre}.ff.net.2", lin(d, 4 * d))
        sd[f"{pre}.scale_shift_table"] = rng.normal(
            size=(6, d)).astype(np.float32)
    return sd


def test_w8_streaming_loader_matches_dense_quantize():
    """The streaming host-side w8 loader (the memory-scalable 13B path —
    quantizes per layer straight off the state dict, never materializing
    the BF16 tree) must produce BIT-IDENTICAL int8 payloads and scales to
    loading dense then quantizing on the same f32 values; with
    rope_split=True it must equal permuting the quantized tree."""
    from candle_video_tpu.models.ltx_video.loader import (
        transformer_params_from_state_dict,
        transformer_params_w8_from_state_dict,
    )

    cfg = T.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=64, cross_attention_dim=32, num_layers=2,
        caption_channels=16,
    )
    sd = _tiny_diffusers_sd(cfg, np.random.default_rng(3))

    dense = transformer_params_from_state_dict(sd, cfg, jnp.float32)
    qdense = T.quantize_transformer_params_w8(dense, qblock=8)
    stream = transformer_params_w8_from_state_dict(sd, cfg, jnp.float32,
                                                   qblock=8)

    def leaves(p):
        flat, _ = jax.tree.flatten_with_path(p)
        return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}

    a, b = leaves(qdense), leaves(stream)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    split_stream = transformer_params_w8_from_state_dict(
        sd, cfg, jnp.float32, qblock=8, rope_split=True
    )
    split_ref = T.permute_params_rope_split(qdense, cfg)
    a, b = leaves(split_ref), leaves(split_stream)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_w8a8_quality_gate_production_width():
    """W8A8 quality gate at the 2B production width (d=2048, 4d FF): the
    dynamic-activation int8 path must stay within bf16-class error of the
    f32 forward.  This is the quality gate VERDICT r1 asked for ahead of
    any serving use of the W8A8 path (docs/roadmap.md perf lever 3);
    random weights stand in for real checkpoints in this zero-egress env."""
    cfg = T.LtxTransformerConfig(
        in_channels=32,
        out_channels=32,
        num_attention_heads=32,
        attention_head_dim=64,
        cross_attention_dim=2048,
        num_layers=2,
        caption_channels=64,
    )
    params = T.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(17)
    s, b = 192, 1
    hidden = jnp.asarray(rng.normal(size=(b, s, 32)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(b, 24, 64)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    grid = jnp.asarray(
        np.stack(np.meshgrid(np.arange(2.0), np.arange(8.0), np.arange(12.0),
                             indexing="ij"), -1).reshape(-1, 3)
    )[None] / jnp.asarray([20.0, 2048.0, 2048.0])
    from candle_video_tpu.ops.rope import rope_cos_sin
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)

    ref = np.asarray(
        T.forward(params, cfg, hidden, enc, t, cos, sin, attn_impl="xla")
    )
    got = np.asarray(
        T.forward(T.quantize_transformer_params(params), cfg, hidden, enc, t,
                  cos, sin, attn_impl="xla")
    )
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.03, f"W8A8 relative error {rel:.4f} at production width"
    mse = float(np.mean((got - ref) ** 2)) / float(np.mean(ref**2) + 1e-12)
    assert mse < 1e-3, f"W8A8 relative MSE {mse:.2e}"
