"""Weight-only int8 T5 path: fused-dequant Pallas matmul + keep-quantized
GGUF loading (reference memory semantics, quantized_t5_encoder.rs:60-71)."""

import numpy as np

import jax.numpy as jnp

from candle_video_tpu.models.ltx_video import t5 as T5
from candle_video_tpu.ops.pallas.int8_weight_matmul import (
    dequantize_int8_blockwise,
    quantize_int8_blockwise,
    w8_matmul,
)
from candle_video_tpu.quant import dequant_np as DQ


def test_w8_matmul_matches_dequant_oracle(rng):
    m, k, n = 48, 128, 96  # unaligned m/n exercise the padding path
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32)
    w_q, s = quantize_int8_blockwise(w)
    ref = x @ dequantize_int8_blockwise(w_q, s) + bias
    got = np.asarray(
        w8_matmul(
            jnp.asarray(x),
            jnp.asarray(w_q),
            jnp.asarray(s),
            bias=jnp.asarray(bias),
            out_dtype=jnp.float32,
        ),
        np.float32,
    )
    # x is cast to bf16 inside the kernel; tolerance is bf16-level
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2


def test_w8_matmul_multiple_k_blocks(rng):
    m, k, n = 16, 320, 64
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    w_q, s = quantize_int8_blockwise(w)
    ref = x @ dequantize_int8_blockwise(w_q, s)
    got = np.asarray(
        w8_matmul(
            jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(s),
            block_k=128, out_dtype=jnp.float32,
        ),
        np.float32,
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2


def test_quantize_blockwise_roundtrip_error_bound(rng):
    w = rng.normal(size=(256, 64)).astype(np.float32)
    w_q, s = quantize_int8_blockwise(w)
    back = dequantize_int8_blockwise(w_q, s)
    # symmetric int8: per-group error <= scale/2 = max|group|/254
    g = w.reshape(-1, 32, 64)
    bound = np.abs(g).max(axis=1, keepdims=True) / 254.0 + 1e-7
    assert (np.abs((w - back).reshape(-1, 32, 64)) <= bound).all()


def test_q8_0_extraction_is_bitexact(rng):
    """extract_q8_0_fields + blockwise dequant == the block dequantizer."""
    x = rng.normal(size=(4, 96)).astype(np.float32)
    raw = DQ.quantize_q8_0(x)
    qs, d = DQ.extract_q8_0_fields(raw, x.size)
    ref = DQ.dequant_q8_0(raw, x.size)
    got = (qs.astype(np.float32).reshape(-1, 32) * d[:, None]).reshape(-1)
    np.testing.assert_array_equal(got, ref)


def _tiny_gguf(tmp_path, rng):
    from candle_video_tpu.quant.gguf import write_gguf

    cfg = T5.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
    )
    tensors = {}

    def add(name, shape, quant=True):
        x = rng.normal(size=shape).astype(np.float32) * 0.1
        if quant and x.size % 32 == 0:
            tensors[name] = (DQ.GGML_Q8_0, shape, DQ.quantize_q8_0(x))
        else:
            tensors[name] = (DQ.GGML_F32, shape, x.view(np.uint8).reshape(-1))

    add("token_embd.weight", (64, 32))
    add("enc.output_norm.weight", (32,), quant=False)
    for i in range(2):
        pre = f"enc.blk.{i}"
        for nm, shape in [
            ("attn_q", (32, 32)), ("attn_k", (32, 32)), ("attn_v", (32, 32)),
            ("attn_o", (32, 32)), ("ffn_gate", (64, 32)), ("ffn_up", (64, 32)),
            ("ffn_down", (32, 64)),
        ]:
            add(f"{pre}.{nm}.weight", shape)
        add(f"{pre}.attn_norm.weight", (32,), quant=False)
        add(f"{pre}.ffn_norm.weight", (32,), quant=False)
    add("enc.blk.0.attn_rel_b.weight", (32, 4), quant=False)

    path = str(tmp_path / "t5q.gguf")
    write_gguf(path, tensors, {"general.architecture": "t5"})
    return path, cfg


def test_gguf_keep_quantized_bitexact_payload(tmp_path, rng):
    """Q8_0 tensors loaded with keep_quantized carry the exact int8+scale."""
    from candle_video_tpu.quant.gguf import GGUFFile

    path, cfg = _tiny_gguf(tmp_path, rng)
    params = T5.params_from_gguf(path, cfg, keep_quantized=True)
    f = GGUFFile(path)
    p = params["blocks"][0]["attn"]["q"]
    assert set(p) == {"w_q", "s"}
    dense = f.tensor("enc.blk.0.attn_q.weight").T  # [in, out]
    back = dequantize_int8_blockwise(np.asarray(p["w_q"]), np.asarray(p["s"]))
    np.testing.assert_array_equal(back.astype(np.float32), dense.astype(np.float32))
    f.close()


def test_gguf_keep_quantized_forward_close_to_dense(tmp_path, rng):
    path, cfg = _tiny_gguf(tmp_path, rng)
    dense = T5.params_from_gguf(path, cfg, dtype=jnp.float32)
    quant = T5.params_from_gguf(path, cfg, keep_quantized=True)
    ids = rng.integers(0, 64, size=(1, 10)).astype(np.int32)
    ref = np.asarray(T5.forward(dense, cfg, jnp.asarray(ids)), np.float32)
    got = np.asarray(T5.forward(quant, cfg, jnp.asarray(ids)), np.float32)
    assert got.shape == ref.shape
    # same quantized weights; differences are the bf16 activation path only
    assert np.abs(got - ref).max() < 5e-2
    assert np.abs(got - ref).mean() < 1e-2


# ---------------------------------------------------------------------------
# bit-exact K-quant carry (Q4_K / Q5_K / Q6_K)
# ---------------------------------------------------------------------------


def test_kquant_extraction_is_bitexact(rng):
    """The affine decomposition s[g]*q + b[g] reproduces the block
    dequantizer BIT-FOR-BIT (both f32 products are exact: f16 x 6-bit and
    f16 x int8 fit the f32 mantissa)."""
    x = rng.normal(size=(3, 512)).astype(np.float32)

    raw = DQ.quantize_q4_k(x)
    q, s, b = DQ.extract_q4_k_fields(raw, x.size)
    ref = DQ.dequant_q4_k(raw, x.size)
    got = (s[:, None] * q.astype(np.float32).reshape(-1, 32)
           + b[:, None]).reshape(-1)
    np.testing.assert_array_equal(got, ref)

    raw = DQ.quantize_q5_k(x)
    q, s, b = DQ.extract_q5_k_fields(raw, x.size)
    ref = DQ.dequant_q5_k(raw, x.size)
    assert q.max() > 15  # the 5th bit is really exercised
    got = (s[:, None] * q.astype(np.float32).reshape(-1, 32)
           + b[:, None]).reshape(-1)
    np.testing.assert_array_equal(got, ref)

    raw = DQ.quantize_q6_k(x)
    q, s = DQ.extract_q6_k_fields(raw, x.size)
    ref = DQ.dequant_q6_k(raw, x.size)
    assert q.min() < -16  # signed 6-bit range exercised
    got = (s[:, None] * q.astype(np.float32).reshape(-1, 16)).reshape(-1)
    np.testing.assert_array_equal(got, ref)


def test_w8_matmul_qblock16(rng):
    """The fused kernel supports Q6_K's group-of-16 scales."""
    m, k, n = 16, 256, 64
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    w_q, s = quantize_int8_blockwise(w, qblock=16)
    ref = x @ dequantize_int8_blockwise(w_q, s, qblock=16)
    got = np.asarray(
        w8_matmul(jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(s),
                  out_dtype=jnp.float32, qblock=16),
        np.float32,
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2


def _kquant_gguf(tmp_path, rng, types):
    """Tiny T5 GGUF whose linear tensors use the given K-quant types per
    role (d_model=256 so rows are QK_K-aligned)."""
    from candle_video_tpu.quant.gguf import write_gguf

    cfg = T5.T5Config(
        vocab_size=64, d_model=256, d_kv=32, d_ff=512, num_layers=2,
        num_heads=8,
    )
    quantizers = {
        DQ.GGML_Q4_K: DQ.quantize_q4_k,
        DQ.GGML_Q5_K: DQ.quantize_q5_k,
        DQ.GGML_Q6_K: DQ.quantize_q6_k,
        DQ.GGML_Q8_0: DQ.quantize_q8_0,
    }
    tensors = {}

    def add(name, shape, tid=None):
        x = rng.normal(size=shape).astype(np.float32) * 0.1
        if tid is None:
            tensors[name] = (DQ.GGML_F32, shape, x.view(np.uint8).reshape(-1))
        else:
            tensors[name] = (tid, shape, quantizers[tid](x))

    add("token_embd.weight", (64, 256), DQ.GGML_Q8_0)
    add("enc.output_norm.weight", (256,))
    for i in range(2):
        pre = f"enc.blk.{i}"
        for nm, shape in [
            ("attn_q", (256, 256)), ("attn_k", (256, 256)),
            ("attn_v", (256, 256)), ("attn_o", (256, 256)),
            ("ffn_gate", (512, 256)), ("ffn_up", (512, 256)),
            ("ffn_down", (256, 512)),
        ]:
            add(f"{pre}.{nm}.weight", shape, types.get(nm, DQ.GGML_Q5_K))
        add(f"{pre}.attn_norm.weight", (256,))
        add(f"{pre}.ffn_norm.weight", (256,))
    add("enc.blk.0.attn_rel_b.weight", (32, 8))

    path = str(tmp_path / "t5_kq.gguf")
    write_gguf(path, tensors, {"general.architecture": "t5"})
    return path, cfg


def test_kquant_keep_quantized_loads_exact_fields(tmp_path, rng):
    """keep_quantized Q5_K/Q6_K entries reconstruct the dequantized tensor
    bit-for-bit — no requantization anywhere."""
    from candle_video_tpu.quant.gguf import GGUFFile

    path, cfg = _kquant_gguf(tmp_path, rng, {"ffn_down": DQ.GGML_Q6_K})
    params = T5.params_from_gguf(path, cfg, keep_quantized=True)
    f = GGUFFile(path)

    p = params["blocks"][0]["attn"]["q"]  # Q5_K: {w_q, s, b}
    assert set(p) == {"w_q", "s", "b"}
    k = p["w_q"].shape[0]
    w = (np.asarray(p["w_q"], np.float32).reshape(k // 32, 32, -1)
         * np.asarray(p["s"])[:, None, :]
         + np.asarray(p["b"])[:, None, :]).reshape(k, -1)
    np.testing.assert_array_equal(w, f.tensor("enc.blk.0.attn_q.weight").T)

    p = params["blocks"][0]["ffn"]["wo"]  # Q6_K: {w_q, s}, groups of 16
    assert set(p) == {"w_q", "s"}
    k = p["w_q"].shape[0]
    assert p["s"].shape[0] == k // 16
    w = (np.asarray(p["w_q"], np.float32).reshape(k // 16, 16, -1)
         * np.asarray(p["s"])[:, None, :]).reshape(k, -1)
    np.testing.assert_array_equal(w, f.tensor("enc.blk.0.ffn_down.weight").T)
    f.close()


def test_kquant_forward_matches_dequant_once_oracle(tmp_path, rng):
    """Mixed Q4_K/Q5_K/Q6_K keep-quantized forward == the dequant-once f32
    oracle up to the kernel's bf16 activation rounding (the VERDICT's
    'bit-exact dequant, bf16-rounding forward' bar)."""
    path, cfg = _kquant_gguf(
        tmp_path, rng,
        {"ffn_gate": DQ.GGML_Q4_K, "ffn_up": DQ.GGML_Q4_K,
         "ffn_down": DQ.GGML_Q6_K},
    )
    dense = T5.params_from_gguf(path, cfg, dtype=jnp.float32)
    quant = T5.params_from_gguf(path, cfg, keep_quantized=True)
    ids = rng.integers(0, 64, size=(1, 10)).astype(np.int32)
    ref = np.asarray(T5.forward(dense, cfg, jnp.asarray(ids)), np.float32)
    got = np.asarray(T5.forward(quant, cfg, jnp.asarray(ids)), np.float32)
    assert np.abs(got - ref).max() < 5e-2
    assert np.abs(got - ref).mean() < 1e-2


def test_kquant_stacked_forward(tmp_path, rng):
    """Homogeneous K-quant file composes with the scan-stacked layout;
    heterogeneous per-layer structures fall back to the list layout."""
    path, cfg = _kquant_gguf(tmp_path, rng, {})  # all Q5_K
    loop_p = T5.params_from_gguf(path, cfg, dtype=jnp.float32,
                                 keep_quantized=True)
    stack_p = T5.params_from_gguf(path, cfg, dtype=jnp.float32,
                                  keep_quantized=True, stacked=True)
    assert not isinstance(stack_p["blocks"], (list, tuple))
    ids = rng.integers(0, 64, size=(1, 10)).astype(np.int32)
    a = np.asarray(T5.forward(loop_p, cfg, jnp.asarray(ids)), np.float32)
    b = np.asarray(T5.forward(stack_p, cfg, jnp.asarray(ids)), np.float32)
    # scan vs unrolled lowerings fold the interpret-mode kernel's internal
    # bf16 round-trip differently (XLA excess-precision elimination), so
    # agreement is at bf16 rounding level, not bit-exact (params verified
    # identical leaf-by-leaf in both layouts)
    np.testing.assert_allclose(b, a, atol=5e-3, rtol=2e-2)


def test_w8_matmul_xla_matches_pallas(rng):
    """Transient-dequant XLA path == fused kernel == dequant oracle (both
    round the dequantized weight to bf16 before the MXU)."""
    from candle_video_tpu.ops.pallas.int8_weight_matmul import (
        w8_matmul_xla,
    )

    m, k, n = 48, 256, 96
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32)
    w_q, s = quantize_int8_blockwise(w)
    ref = x @ dequantize_int8_blockwise(w_q, s) + bias
    got = np.asarray(
        w8_matmul_xla(
            jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(s),
            bias=jnp.asarray(bias), out_dtype=jnp.float32,
        ),
        np.float32,
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2
    fused = np.asarray(
        w8_matmul(
            jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(s),
            bias=jnp.asarray(bias), out_dtype=jnp.float32,
        ),
        np.float32,
    )
    # same dequant->bf16->f32-accum math; only k-blocking order differs
    np.testing.assert_allclose(got, fused, atol=1e-2, rtol=1e-2)


def test_w8_matmul_auto_dispatches_by_m(rng):
    """auto == xla result at large M, == pallas result at small M (and all
    three agree numerically anyway)."""
    from candle_video_tpu.ops.pallas.int8_weight_matmul import (
        W8_XLA_MIN_M,
        w8_matmul_auto,
        w8_matmul_xla,
    )

    k, n = 128, 64
    w = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    w_q, s = quantize_int8_blockwise(w)
    for m in (8, W8_XLA_MIN_M):
        x = rng.normal(size=(m, k)).astype(np.float32)
        got = np.asarray(
            w8_matmul_auto(jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(s),
                           out_dtype=jnp.float32), np.float32)
        ref = np.asarray(
            w8_matmul_xla(jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(s),
                          out_dtype=jnp.float32), np.float32)
        np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-2)


def test_w8_matmul_xla_qblock16(rng):
    m, k, n = 16, 96, 64
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    from candle_video_tpu.ops.pallas.int8_weight_matmul import w8_matmul_xla

    w_q, s = quantize_int8_blockwise(w, qblock=16)
    ref = x @ dequantize_int8_blockwise(w_q, s, qblock=16)
    got = np.asarray(
        w8_matmul_xla(jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(s),
                      out_dtype=jnp.float32, qblock=16),
        np.float32,
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2


def test_q4k_true_4bit_carry(tmp_path, rng):
    """Q4_K payloads now ride as PACKED NIBBLES (round 5): the leaf is
    {w4, w4_scale, w4_min} with half the payload bytes of the int8 carry
    and no group-sum correction leaf, the dequant is bit-exact (Q4_K IS
    w = s[g]*q + m[g]), and the forward matches the dequant-once oracle."""
    from candle_video_tpu.ops.pallas.int4_weight_matmul import (
        dequantize_int4_blockwise,
    )

    path, cfg = _kquant_gguf(
        tmp_path, rng, {"ffn_gate": DQ.GGML_Q4_K, "ffn_up": DQ.GGML_Q4_K,
                        "ffn_down": DQ.GGML_Q4_K},
    )
    quant = T5.params_from_gguf(path, cfg, keep_quantized=True)
    p = quant["blocks"][0]["ffn"]["wi_0"]
    assert set(p) == {"w4", "w4_scale", "w4_min"}
    k = cfg.d_model
    assert p["w4"].shape == (k // 2, cfg.d_ff) and p["w4"].dtype == jnp.uint8
    # bit-exact vs the GGUF dequant reference
    from candle_video_tpu.quant.gguf import GGUFFile

    f = GGUFFile(str(path))
    ref_w = np.asarray(f.tensor("enc.blk.0.ffn_gate.weight"), np.float32).T
    f.close()
    got_w = dequantize_int4_blockwise(
        np.asarray(p["w4"]), np.asarray(p["w4_scale"]), np.asarray(p["w4_min"])
    )
    np.testing.assert_array_equal(got_w, ref_w)
    # forward parity vs dequant-once
    dense = T5.params_from_gguf(path, cfg, dtype=jnp.float32)
    ids = rng.integers(0, 64, size=(1, 10)).astype(np.int32)
    ref = np.asarray(T5.forward(dense, cfg, jnp.asarray(ids)), np.float32)
    got = np.asarray(T5.forward(quant, cfg, jnp.asarray(ids)), np.float32)
    assert np.abs(got - ref).max() < 5e-2
    # the scan-stacked layout (production T5) composes with w4 leaves
    stacked = T5.params_from_gguf(path, cfg, keep_quantized=True, stacked=True)
    assert not isinstance(stacked["blocks"], (list, tuple))
    got_s = np.asarray(T5.forward(stacked, cfg, jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(got_s, got, atol=5e-3, rtol=2e-2)
