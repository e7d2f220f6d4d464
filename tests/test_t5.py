"""T5 encoder parity vs HuggingFace transformers (torch CPU) — a genuinely
independent oracle, covering the reference's verify_t5 fixtures."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from candle_video_tpu.models.ltx_video import t5 as T5
from candle_video_tpu.models.ltx_video.loader import torch_state_dict_to_numpy


TINY = dict(
    vocab_size=128,
    d_model=32,
    d_kv=8,
    d_ff=48,
    num_layers=3,
    num_heads=4,
    relative_attention_num_buckets=32,
    relative_attention_max_distance=128,
)


@pytest.fixture(scope="module")
def tiny_t5():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=TINY["vocab_size"],
        d_model=TINY["d_model"],
        d_kv=TINY["d_kv"],
        d_ff=TINY["d_ff"],
        num_layers=TINY["num_layers"],
        num_heads=TINY["num_heads"],
        relative_attention_num_buckets=TINY["relative_attention_num_buckets"],
        relative_attention_max_distance=TINY["relative_attention_max_distance"],
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    model = T5EncoderModel(hf_cfg).eval()
    cfg = T5.T5Config(**TINY)
    sd = torch_state_dict_to_numpy(model.state_dict())
    params = T5.params_from_hf_state_dict(sd, cfg, dtype=jnp.float32)
    return model, cfg, params


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = np.arange(-40, 41)[None, :] - np.zeros((1, 1), np.int64)
    rel = (np.arange(81) - 40)[None, :].repeat(3, 0)
    got = T5.relative_position_bucket(rel, 32, 128)
    ref = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(got, ref)


def test_forward_parity(tiny_t5, rng):
    model, cfg, params = tiny_t5
    ids = rng.integers(0, TINY["vocab_size"], size=(2, 17)).astype(np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids).long()).last_hidden_state.numpy()
    got = np.asarray(T5.forward(params, cfg, jnp.asarray(ids)))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-4


def test_forward_parity_with_mask(tiny_t5, rng):
    model, cfg, params = tiny_t5
    ids = rng.integers(0, TINY["vocab_size"], size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.float32)
    mask[0, 8:] = 0
    mask[1, 5:] = 0
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    got = np.asarray(
        T5.forward(params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    )
    # compare only non-padded positions (HF zeroes padded grads differently)
    for b in range(2):
        valid = int(mask[b].sum())
        assert np.abs(got[b, :valid] - ref[b, :valid]).max() < 2e-4


def test_precomputed_pos_bias_matches_on_the_fly(tiny_t5, rng):
    _, cfg, params = tiny_t5
    ids = rng.integers(0, TINY["vocab_size"], size=(1, 9)).astype(np.int32)
    pb = T5.position_bias(params, cfg, 9)
    a = np.asarray(T5.forward(params, cfg, jnp.asarray(ids)))
    b = np.asarray(T5.forward(params, cfg, jnp.asarray(ids), pos_bias=pb))
    np.testing.assert_allclose(a, b, atol=0)


def test_gguf_t5_load_and_forward(tmp_path, rng):
    """Round-trip a tiny T5 through GGUF (Q8_0 weights) and run it."""
    from candle_video_tpu.quant import dequant_np as DQ
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
        return x

    add("token_embd.weight", (64, 32))
    add("enc.output_norm.weight", (32,), quant=False)
    for i in range(2):
        pre = f"enc.blk.{i}"
        add(f"{pre}.attn_q.weight", (32, 32))
        add(f"{pre}.attn_k.weight", (32, 32))
        add(f"{pre}.attn_v.weight", (32, 32))
        add(f"{pre}.attn_o.weight", (32, 32))
        add(f"{pre}.attn_norm.weight", (32,), quant=False)
        add(f"{pre}.ffn_gate.weight", (64, 32))
        add(f"{pre}.ffn_up.weight", (64, 32))
        add(f"{pre}.ffn_down.weight", (32, 64))
        add(f"{pre}.ffn_norm.weight", (32,), quant=False)
    add("enc.blk.0.attn_rel_b.weight", (32, 4), quant=False)

    path = str(tmp_path / "t5.gguf")
    write_gguf(path, tensors, {"general.architecture": "t5"})
    params = T5.params_from_gguf(path, cfg, dtype=jnp.float32)
    ids = rng.integers(0, 64, size=(1, 10)).astype(np.int32)
    out = T5.forward(params, cfg, jnp.asarray(ids))
    assert out.shape == (1, 10, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_stacked_forward_matches_loop(tiny_t5, rng):
    """The scan-stacked layout (stacked=True / stack_blocks) must reproduce
    the per-layer loop bit-for-bit semantics."""
    model, cfg, params = tiny_t5
    from candle_video_tpu.models.ltx_video.loader import torch_state_dict_to_numpy

    sd = torch_state_dict_to_numpy(model.state_dict())
    stacked = T5.params_from_hf_state_dict(sd, cfg, dtype=jnp.float32,
                                           stacked=True)
    assert not isinstance(stacked["blocks"], (list, tuple))
    assert "rel_bias" in stacked

    ids = rng.integers(0, TINY["vocab_size"], size=(2, 11)).astype(np.int32)
    mask = np.ones((2, 11), np.float32)
    mask[1, 7:] = 0
    ref = np.asarray(
        T5.forward(params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    )
    got = np.asarray(
        T5.forward(stacked, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # post-hoc conversion of already-loaded params agrees too
    conv = T5.stack_blocks(params)
    got2 = np.asarray(
        T5.forward(conv, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(got2, ref, atol=1e-5, rtol=1e-5)


def test_stacked_gguf_quantized_forward(tmp_path, rng):
    """stacked=True composes with keep_quantized int8-in-HBM weights."""
    from candle_video_tpu.quant import dequant_np as DQ
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
        return x

    add("token_embd.weight", (64, 32))
    add("enc.output_norm.weight", (32,), quant=False)
    for i in range(2):
        pre = f"enc.blk.{i}"
        for nm, shp in [("attn_q", (32, 32)), ("attn_k", (32, 32)),
                        ("attn_v", (32, 32)), ("attn_o", (32, 32)),
                        ("ffn_gate", (64, 32)), ("ffn_up", (64, 32)),
                        ("ffn_down", (32, 64))]:
            add(f"{pre}.{nm}.weight", shp)
        add(f"{pre}.attn_norm.weight", (32,), quant=False)
        add(f"{pre}.ffn_norm.weight", (32,), quant=False)
    add("enc.blk.0.attn_rel_b.weight", (32, 4), quant=False)

    path = str(tmp_path / "t5q.gguf")
    write_gguf(path, tensors, {"general.architecture": "t5"})
    ids = rng.integers(0, 64, size=(1, 10)).astype(np.int32)

    loop_q = T5.params_from_gguf(path, cfg, dtype=jnp.float32,
                                 keep_quantized=True)
    stack_q = T5.params_from_gguf(path, cfg, dtype=jnp.float32,
                                  keep_quantized=True, stacked=True)
    a = np.asarray(T5.forward(loop_q, cfg, jnp.asarray(ids)), np.float32)
    b = np.asarray(T5.forward(stack_q, cfg, jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)
