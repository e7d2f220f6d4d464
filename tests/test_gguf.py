"""GGUF reader + block dequantization tests.

Round-trips random weights through each block format (quantize → dequantize)
and cross-checks the native C++ kernels against the NumPy reference bit for
bit.  Covers the capability the reference gets from candle's QTensor/GGUF
stack (quantized_t5_encoder.rs:558-604).
"""

import numpy as np
import pytest

from candle_video_tpu.quant import dequant_np as DQ
from candle_video_tpu.quant.dequant import dequantize, native_available
from candle_video_tpu.quant.gguf import GGUFFile, write_gguf


QUANTIZERS = {
    DQ.GGML_Q8_0: DQ.quantize_q8_0,
    DQ.GGML_Q4_K: DQ.quantize_q4_k,
    DQ.GGML_Q5_K: DQ.quantize_q5_k,
    DQ.GGML_Q6_K: DQ.quantize_q6_k,
}
# acceptable quantization RMSE (relative to unit-normal data)
TOL = {
    DQ.GGML_Q8_0: 0.01,
    DQ.GGML_Q4_K: 0.10,
    DQ.GGML_Q5_K: 0.05,
    DQ.GGML_Q6_K: 0.03,
}


@pytest.mark.parametrize("type_id", list(QUANTIZERS))
def test_roundtrip_numpy(type_id, rng):
    x = rng.normal(size=(4096,)).astype(np.float32)
    raw = QUANTIZERS[type_id](x)
    y = DQ.dequantize_np(type_id, raw, x.size)
    rmse = float(np.sqrt(np.mean((x - y) ** 2)))
    assert rmse < TOL[type_id], f"{DQ.TYPE_NAMES[type_id]} rmse {rmse}"


@pytest.mark.parametrize("type_id", list(QUANTIZERS) + [DQ.GGML_F16])
def test_native_matches_numpy(type_id, rng):
    if not native_available():
        pytest.skip("native library not built")
    x = rng.normal(size=(2048,)).astype(np.float32)
    if type_id == DQ.GGML_F16:
        raw = x.astype(np.float16).view(np.uint8)
    else:
        raw = QUANTIZERS[type_id](x)
    y_np = DQ.dequantize_np(type_id, raw, x.size)
    y_cc = dequantize(type_id, raw, x.size, prefer_native=True)
    np.testing.assert_array_equal(y_cc, y_np)


def test_f32_f16_passthrough(rng):
    x = rng.normal(size=(100,)).astype(np.float32)
    np.testing.assert_array_equal(
        dequantize(DQ.GGML_F32, x.view(np.uint8), 100), x
    )
    y = dequantize(DQ.GGML_F16, x.astype(np.float16).view(np.uint8), 100)
    np.testing.assert_allclose(y, x, atol=1e-2)


def test_gguf_write_read_roundtrip(tmp_path, rng):
    a = rng.normal(size=(8, 256)).astype(np.float32)
    b = rng.normal(size=(512,)).astype(np.float32)
    path = str(tmp_path / "test.gguf")
    write_gguf(
        path,
        {
            "tensor.f32": (DQ.GGML_F32, (8, 256), a.view(np.uint8).reshape(-1)),
            "tensor.q5k": (DQ.GGML_Q5_K, (2, 256), DQ.quantize_q5_k(b)),
        },
        metadata={"general.architecture": "t5", "t5.block_count": 24},
    )
    f = GGUFFile(path)
    assert f.metadata["general.architecture"] == "t5"
    assert f.metadata["t5.block_count"] == 24
    assert set(f.tensor_names()) == {"tensor.f32", "tensor.q5k"}
    np.testing.assert_array_equal(f.tensor("tensor.f32"), a)
    q = f.tensor("tensor.q5k")
    assert q.shape == (2, 256)
    rmse = float(np.sqrt(np.mean((q.reshape(-1) - b) ** 2)))
    assert rmse < 0.05
    f.close()


def test_gguf_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.gguf")
    with open(path, "wb") as fh:
        fh.write(b"NOTGGUF" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not a GGUF"):
        GGUFFile(path)
