"""On-TPU BF16 production-numerics parity vs a CPU f32 oracle.

The reference's bar: the real execution path (CUDA BF16 + flash-attn) must
hold PSNR > 35 dB / per-step latent MSE < 1e-3 against the Python oracle
(tests/verify_pipeline_parity.rs:1-9, verify_vae_decode_parity.rs:13-45).
Round-1 gap (VERDICT.md): all parity ran CPU-f32 with the XLA attention
path; the production bf16 + Pallas dispatch was never pushed through.

These tests run ONLY on the real chip (CVT_TEST_PLATFORM=axon); each
computes its oracle in a forced-CPU subprocess (f32, XLA attention) from
the same seeds, then runs the production path (bf16 params, attn_impl
"auto" = packed Pallas self-attention with in-kernel RoPE + xla_bf16
cross-attention) on the TPU and asserts the reference envelopes.

Run:  CVT_TEST_PLATFORM=axon python -m pytest tests/test_tpu_parity.py -v
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("CVT_TEST_PLATFORM", "cpu") != "axon",
    reason="on-TPU parity suite; set CVT_TEST_PLATFORM=axon on the real chip",
)

_ORACLE_SRC = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from tests.test_tpu_parity import _run_pipeline
out = _run_pipeline("float32", "xla")
np.savez({path!r}, **out)
print("oracle done")
"""


def _run_pipeline(dtype_name: str, attn_impl: str):
    """Deterministic tiny-resolution generation on the current backend.

    Full production 2B DiT config (28 layers, d=2048) + full VAE decoder at
    256x384x9f (S=192), 3 denoise steps — the model numerics are real, only
    the token count is small.

    The f32 control runs under ``jax.default_matmul_precision("highest")``:
    on TPU, f32 matmuls otherwise lower to bf16-reduced passes, which is a
    precision policy, not the backend difference the control isolates
    (measured MSE 1.1e-5 under the default policy vs the 1e-5 envelope).
    """
    import contextlib

    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.transformer import init_params
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    prec = (
        jax.default_matmul_precision("highest")
        if dtype_name == "float32"
        else contextlib.nullcontext()
    )
    with prec:
        return _run_pipeline_impl(
            dtype_name, attn_impl, jnp, P, V, get_config_by_version,
            init_params, init_vae_params,
        )


def _run_pipeline_impl(dtype_name, attn_impl, jnp, P, V, get_config_by_version,
                       init_params, init_vae_params):
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    full = get_config_by_version("0.9.8-2b-distilled")
    params = init_params(jax.random.PRNGKey(11), full.transformer, dtype=dtype)
    vae_params = init_vae_params(jax.random.PRNGKey(12), V.LtxVaeConfig(), dtype)

    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(size=(1, 128, 4096)) * 0.05, jnp.float32)
    mask = np.ones((1, 128), np.float32)
    mask[:, 96:] = 0.0

    pipe = P.LtxPipeline(
        config=full,
        transformer_params=params,
        vae_params=vae_params,
    )
    latents = P.generate(
        pipe,
        prompt_embeds=embeds,
        prompt_attention_mask=jnp.asarray(mask),
        height=256,
        width=384,
        num_frames=9,
        num_inference_steps=3,
        sigmas=[1.0, 0.85, 0.5],
        seed=5,
        output_type="latent",
        attn_impl=attn_impl,
    )
    video = P.generate(
        pipe,
        prompt_embeds=embeds,
        prompt_attention_mask=jnp.asarray(mask),
        height=256,
        width=384,
        num_frames=9,
        num_inference_steps=3,
        sigmas=[1.0, 0.85, 0.5],
        seed=5,
        output_type="tensor",
        attn_impl=attn_impl,
    )
    return {
        "latents": np.asarray(latents, np.float32),
        "video": np.asarray(video, np.float32),
    }


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("oracle") / "cpu_f32.npz")
    code = _ORACLE_SRC.format(repo=_REPO, path=path)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    data = np.load(path)
    return {k: data[k] for k in data.files}


def _psnr(a, b, data_range=255.0):
    mse = float(np.mean((a - b) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(data_range**2 / mse)


def test_e2e_bf16_production_vs_cpu_f32(oracle):
    assert jax.devices()[0].platform in ("tpu", "axon")
    got = _run_pipeline("bfloat16", "auto")

    lat_mse = float(np.mean((got["latents"] - oracle["latents"]) ** 2))
    psnr = _psnr(got["video"], oracle["video"])
    print(f"\nTPU bf16 vs CPU f32: latent MSE {lat_mse:.3e}, video PSNR {psnr:.1f} dB")
    # reference envelopes (verify_pipeline_parity.rs:1-9)
    assert lat_mse < 1e-3, lat_mse
    assert psnr > 35.0, psnr


def test_e2e_tpu_f32_xla_vs_cpu_f32(oracle):
    """Same-path control: TPU f32 XLA attention vs CPU f32 — isolates the
    backend difference from the bf16/Pallas difference."""
    got = _run_pipeline("float32", "xla")
    lat_mse = float(np.mean((got["latents"] - oracle["latents"]) ** 2))
    psnr = _psnr(got["video"], oracle["video"])
    print(f"\nTPU f32/xla vs CPU f32: latent MSE {lat_mse:.3e}, PSNR {psnr:.1f} dB")
    assert lat_mse < 1e-5, lat_mse
    assert psnr > 45.0, psnr


def test_long_kernel_on_chip_at_production_s():
    """The multi-k-block LONG attention kernel on the real chip at the
    long-clip production sequence length (S = 33*16*24 = 12672, the
    512x768x257f token count) vs the XLA f32-softmax oracle — 4 heads so
    the oracle's [H, S, S] f32 scores (~2.6 GiB) fit beside the inputs.
    Covers both the natural layout and the split-rope layout the
    production dispatch uses."""
    import jax.numpy as jnp

    from candle_video_tpu.ops import attention_xla
    from candle_video_tpu.ops.pallas.flash_attention_packed import (
        _ONEPASS_KP_MAX,
        _packed_long,
    )
    from candle_video_tpu.ops.rope import (
        rope_cos_sin,
        rope_split_permutation,
        rope_split_tables,
    )

    assert jax.devices()[0].platform in ("tpu", "axon")
    b, s, h, d = 1, 33 * 16 * 24, 4, 64
    assert s > _ONEPASS_KP_MAX  # this SHAPE is the long-kernel regime
    scale = 1.0 / np.sqrt(d)
    rng = np.random.default_rng(0)
    q4 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k4 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v4 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    ref = np.asarray(attention_xla(q4, k4, v4, scale), np.float32)

    q, k, v = (x.reshape(b, s, h * d) for x in (q4, k4, v4))
    got = np.asarray(
        _packed_long(q, k, v, num_heads=h, scale=scale).reshape(b, s, h, d),
        np.float32,
    )
    mse = float(((got - ref) ** 2).mean())
    print(f"\nlong kernel natural layout S={s}: MSE {mse:.3e}")
    assert mse < 1e-6, mse  # bf16-rounding level, matches the one-pass gate

    # split layout with in-kernel q+k rotation (production self-attn path)
    grid = jnp.asarray(rng.uniform(size=(1, s, 3)), jnp.float32)
    cos, sin = rope_cos_sin(grid, h * d)
    from candle_video_tpu.ops.rope import apply_rotary_emb

    qr = apply_rotary_emb(q4, cos.reshape(1, s, h, d), sin.reshape(1, s, h, d))
    kr = apply_rotary_emb(k4, cos.reshape(1, s, h, d), sin.reshape(1, s, h, d))
    ref_r = np.asarray(attention_xla(qr, kr, v4, scale), np.float32)
    perm = rope_split_permutation(h * d)
    cs = rope_split_tables(cos, sin)
    got_s = np.asarray(
        _packed_long(q[..., perm], k[..., perm], v, num_heads=h, scale=scale,
                     rope_split=cs).reshape(b, s, h, d),
        np.float32,
    )
    mse_s = float(((got_s - ref_r) ** 2).mean())
    print(f"long kernel split layout S={s}: MSE {mse_s:.3e}")
    assert mse_s < 2e-6, mse_s


def test_w4_matmul_kernels_on_chip():
    """W4A16 int4 weight-only matmul on the real chip: both execution
    regimes (fused Pallas kernel — Mosaic-compiled nibble unpack — and the
    transient-dequant XLA path) vs the host dequant oracle.  The interpret
    tests (test_int4.py) cannot catch Mosaic legalization gaps: round-5
    found both uint8->f32 casts and 8-bit vector shifts rejected at
    compile time (int4_weight_matmul._kernel does the unpack in int32)."""
    import jax.numpy as jnp

    from candle_video_tpu.ops.pallas.int4_weight_matmul import (
        dequantize_int4_blockwise,
        quantize_int4_blockwise,
        w4_matmul,
        w4_matmul_xla,
    )

    assert jax.devices()[0].platform in ("tpu", "axon")
    rng = np.random.default_rng(0)
    k, n = 2048, 1024
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    p, s, m = quantize_int4_blockwise(w)
    wd = dequantize_int4_blockwise(p, s, m)
    for mdim in (128, 31):  # aligned and padded M
        x = rng.normal(size=(mdim, k)).astype(np.float32)
        ref = np.asarray(
            (jnp.asarray(x, jnp.bfloat16)
             @ jnp.asarray(wd, jnp.float32).astype(jnp.bfloat16)
             ).astype(jnp.float32)
        )
        sc = np.abs(ref).max()
        y_xla = np.asarray(w4_matmul_xla(
            jnp.asarray(x), jnp.asarray(p), jnp.asarray(s), jnp.asarray(m)
        ).astype(jnp.float32))
        assert np.abs(y_xla - ref).max() <= 1e-4 * sc
        y_pl = np.asarray(w4_matmul(
            jnp.asarray(x), jnp.asarray(p), jnp.asarray(s), jnp.asarray(m),
            block_k=1024,
        ).astype(jnp.float32))
        assert np.abs(y_pl - ref).max() <= 4e-3 * sc
