"""Standalone component verifiers — one subcommand per reference verify
binary (reference: examples/verify/*.rs, Cargo.toml:79-131).

Unlike the pytest suite (CI) these are interactive runners: each builds a
fresh torch-mirror (or closed-form f64) oracle at small shapes, runs the
JAX component, and prints a metric line + PASS/FAIL.  No fixture files
needed; with diffusers + real checkpoints use scripts/capture_*.py and the
fixture-gated tests instead.

Usage:
    python scripts/verify.py all
    python scripts/verify.py scheduler dit vae-decode ...

Subcommands → reference counterpart:
    rng             examples/verify/verify_rng.rs
    scheduler       examples/verify/verify_scheduler.rs
    scheduler-math  verify-scheduler-math (Cargo.toml:112)
    scheduler-step  verify-scheduler-step (Cargo.toml:124)
    dit             examples/verify/verify_dit.rs
    vae-encoder     examples/verify/verify_vae_encoder.rs
    vae-decode      examples/verify/verify_vae_decode.rs
    vae-roundtrip   examples/verify/verify_vae_roundtrip.rs
    vae-tiling      examples/verify/verify_vae_tiling.rs
    t5              verify-t5 (Cargo.toml:104)
    quant           (no direct binary) W8A16/W4A16 matmul vs dequant oracle
    pipeline        examples/verify/verify_pipeline.rs
    pipeline-step   verify-pipeline-step (Cargo.toml:108)
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

_RESULTS = []

TINY_DIT = dict(in_channels=8, out_channels=8, heads=2, dim_head=12,
                cross_attention_dim=24, num_layers=2, caption_channels=16)

TINY_VAE = dict(
    in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=(8, 16, 32), decoder_block_out_channels=(8, 16),
    spatiotemporal_scaling=(True, True),
    decoder_spatiotemporal_scaling=(True, True),
    layers_per_block=(1, 1, 2), decoder_layers_per_block=(1, 1, 1),
    patch_size=2, patch_size_t=1,
    downsample_types=("spatiotemporal", "spatiotemporal"),
    decoder_upsample_residual=(True, True), decoder_upsample_factor=(2, 2),
    timestep_conditioning=True, decoder_causal=False,
    spatial_compression_ratio=8, temporal_compression_ratio=4,
)


def _report(name: str, metric: str, value: float, tol: float):
    ok = value <= tol
    _RESULTS.append((name, ok))
    print(f"[{name:<16}] {metric} = {value:.3e}  (tol {tol:.1e})  "
          f"{'PASS' if ok else 'FAIL'}", flush=True)


# ---------------------------------------------------------------------------


def verify_rng():
    """Pcg32 determinism + Gaussian moments (verify_rng.rs)."""
    from candle_video_tpu.utils.rng import Pcg32

    a = [Pcg32(42, 54).next_u32() for _ in range(1)]
    b = [Pcg32(42, 54).next_u32() for _ in range(1)]
    _report("rng", "stream mismatch", float(a != b), 0.0)
    n = Pcg32(7, 1).randn((200_000,))
    _report("rng-normal", "|mean|+|std-1|",
            abs(float(n.mean())) + abs(float(n.std()) - 1.0), 2e-2)
    # vectorized block == scalar Box-Muller replay
    s = Pcg32(3, 9)
    scalar = np.asarray([s.next_gaussian()[0] for _ in range(8)] , np.float32)
    vec = Pcg32(3, 9).randn((16,))[::2]
    _report("rng-vec", "vector vs scalar maxabs",
            float(np.abs(scalar - vec).max()), 0.0)


def verify_scheduler():
    """set_timesteps + full Euler loop vs an independent f64 recomputation
    (verify_scheduler.rs compares a diffusers capture; zero-egress here)."""
    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version

    cfg = get_config_by_version("0.9.8-2b-distilled").scheduler
    sch = S.set_timesteps(cfg, num_inference_steps=8, mu=None)
    sig = np.asarray(sch.sigmas, np.float64)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 8))
    mo = rng.normal(size=(1, 64, 8))
    x64 = x.copy()
    xj = jnp.asarray(x, jnp.float32)
    for i in range(len(sig) - 1):
        x64 = x64 + (sig[i + 1] - sig[i]) * mo
        xj = S.step(xj, jnp.asarray(mo, jnp.float32), sig[i], sig[i + 1])
    d = np.abs(np.asarray(xj, np.float64) - x64).max()
    _report("scheduler", "8-step loop maxabs", float(d), 1e-4)


def verify_scheduler_math():
    """Sigma-transform surface across presets (verify-scheduler-math)."""
    from candle_video_tpu.models.ltx_video.configs import (
        FlowMatchEulerSchedulerConfig,
    )
    from candle_video_tpu.models.ltx_video import scheduler as S

    worst = 0.0
    for kw in [dict(), dict(shift=2.0), dict(shift_terminal=0.1),
               dict(use_karras_sigmas=True),
               dict(use_exponential_sigmas=True)]:
        cfg = FlowMatchEulerSchedulerConfig(use_dynamic_shifting=False, **kw)
        sch = S.set_timesteps(cfg, num_inference_steps=10)
        s = np.asarray(sch.sigmas, np.float64)
        worst = max(worst, float((np.diff(s[:-1]) > 1e-9).sum()))  # decreasing
        worst = max(worst, abs(s[-1]))  # terminal sigma appended as 0
        if kw.get("shift_terminal"):
            worst = max(worst, abs(s[-2] - kw["shift_terminal"]))
    _report("scheduler-math", "monotonic/terminal viol", worst, 1e-6)


def verify_scheduler_step():
    """One hand-computed Euler step (verify-scheduler-step)."""
    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video import scheduler as S

    x = jnp.ones((1, 4, 2), jnp.float32) * 0.5
    mo = jnp.ones((1, 4, 2), jnp.float32) * 2.0
    out = S.step(x, mo, 0.8, 0.3)
    want = 0.5 + (0.3 - 0.8) * 2.0
    _report("scheduler-step", "maxabs",
            float(np.abs(np.asarray(out) - want).max()), 1e-6)


def verify_dit():
    """Tiny DiT forward vs the torch mirror (verify_dit.rs)."""
    import jax.numpy as jnp
    import torch

    import torch_ltx
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video.loader import (
        torch_state_dict_to_numpy,
        transformer_params_from_state_dict,
    )
    from candle_video_tpu.ops.rope import (
        normalize_video_coords,
        rope_cos_sin,
        video_coords_grid,
    )

    torch.manual_seed(0)
    tm = torch_ltx.LtxTransformer3D(**TINY_DIT).eval()
    cfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=2,
        caption_channels=16,
    )
    params = transformer_params_from_state_dict(
        torch_state_dict_to_numpy(tm.state_dict()), cfg, jnp.float32
    )
    rng = np.random.default_rng(1)
    f, h, w = 2, 3, 4
    s = f * h * w
    x = rng.normal(size=(1, s, 8)).astype(np.float32)
    enc = rng.normal(size=(1, 5, 16)).astype(np.float32)
    t = np.full((1,), 400.0, np.float32)
    mask = np.ones((1, 5), np.float32)
    coords = np.broadcast_to(video_coords_grid(f, h, w)[None], (1, s, 3)).copy()
    with torch.no_grad():
        want = tm(
            torch.from_numpy(x), torch.from_numpy(enc), torch.from_numpy(t),
            torch.from_numpy(coords), torch.from_numpy(mask),
        ).numpy()
    grid = normalize_video_coords(jnp.asarray(coords), 20, 2048, 2048)
    cos, sin = rope_cos_sin(grid, cfg.inner_dim)
    got = TF.forward(
        params, cfg, jnp.asarray(x), jnp.asarray(enc), jnp.asarray(t),
        cos, sin, encoder_attention_mask=jnp.asarray(mask), attn_impl="xla",
    )
    _report("dit", "maxabs", float(np.abs(np.asarray(got) - want).max()), 2e-3)


def _tiny_vae():
    import jax.numpy as jnp
    import torch

    import torch_ltx_vae as tv
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.loader import (
        torch_state_dict_to_numpy,
        vae_params_from_state_dict,
    )

    torch.manual_seed(0)
    cfgd = {k: list(v) if isinstance(v, tuple) else v
            for k, v in TINY_VAE.items()}
    enc, dec = tv.Encoder3d(cfgd).eval(), tv.Decoder3d(cfgd).eval()
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in
               torch_state_dict_to_numpy(enc.state_dict()).items()})
    sd.update({f"decoder.{k}": v for k, v in
               torch_state_dict_to_numpy(dec.state_dict()).items()})
    params = vae_params_from_state_dict(sd, jnp.float32)
    cfg = V.LtxVaeConfig(**TINY_VAE)
    return V, cfg, params, enc, dec


def verify_vae_encoder():
    import jax.numpy as jnp
    import torch

    V, cfg, params, enc, dec = _tiny_vae()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = enc(torch.from_numpy(x)).numpy()
    got = V.encoder_forward(params["encoder"], cfg, jnp.asarray(x))
    _report("vae-encoder", "maxabs",
            float(np.abs(np.asarray(got) - want).max()), 5e-4)


def verify_vae_decode():
    import jax.numpy as jnp
    import torch

    V, cfg, params, enc, dec = _tiny_vae()
    rng = np.random.default_rng(3)
    z = rng.normal(size=(1, cfg.latent_channels, 2, 2, 2)).astype(np.float32)
    temb = np.asarray([0.05], np.float32)
    with torch.no_grad():
        want = dec(torch.from_numpy(z), torch.from_numpy(temb)).numpy()
    got = V.decoder_forward(params["decoder"], cfg, jnp.asarray(z),
                            jnp.asarray(temb))
    _report("vae-decode", "maxabs",
            float(np.abs(np.asarray(got) - want).max()), 5e-4)


def verify_vae_roundtrip():
    """encode → mode → decode vs the torch mirrors end to end."""
    import jax.numpy as jnp
    import torch

    V, cfg, params, enc, dec = _tiny_vae()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32) * 0.5
    temb = np.asarray([0.0], np.float32)
    with torch.no_grad():
        moments = enc(torch.from_numpy(x))
        mean = moments[:, : cfg.latent_channels]
        want = dec(mean, torch.from_numpy(temb)).numpy()
    got = V.forward(params, cfg, jnp.asarray(x), jnp.asarray(temb),
                    use_tiling=False)
    _report("vae-roundtrip", "maxabs",
            float(np.abs(np.asarray(got) - want).max()), 1e-3)


def verify_vae_tiling():
    """Tiled vs untiled decode (verify_vae_tiling.rs): identical away from
    blended seams."""
    import jax.numpy as jnp

    V, cfg, params, enc, dec = _tiny_vae()
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=(1, cfg.latent_channels, 2, 8, 8)),
                    jnp.float32)
    temb = jnp.asarray([0.0], jnp.float32)
    full = V.decoder_forward(params["decoder"], cfg, z, temb)
    tiling = V.TilingConfig(
        tile_sample_min_height=48, tile_sample_min_width=48,
        tile_sample_stride_height=32, tile_sample_stride_width=32,
    )
    tiled = V.tiled_decode(params, cfg, z, temb, tiling)
    d = np.abs(np.asarray(tiled) - np.asarray(full))
    _report("vae-tiling", "median abs (seams are blended)",
            float(np.median(d)), 5e-2)


def verify_t5():
    """T5 encoder vs HF transformers (verify-t5)."""
    import jax.numpy as jnp
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from candle_video_tpu.models.ltx_video import t5 as T5
    from candle_video_tpu.models.ltx_video.loader import (
        torch_state_dict_to_numpy,
    )

    torch.manual_seed(0)
    hf = T5EncoderModel(HFT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0,
        is_encoder_decoder=False, use_cache=False,
    )).eval()
    cfg = T5.T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=48,
                      num_layers=3, num_heads=4)
    params = T5.params_from_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()), cfg, jnp.float32
    )
    rng = np.random.default_rng(6)
    ids = rng.integers(0, 128, size=(1, 10))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).last_hidden_state.numpy()
    got = T5.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    _report("t5", "maxabs", float(np.abs(np.asarray(got) - want).max()), 5e-4)


def _tiny_full_pipeline():
    import jax
    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import (
        FlowMatchEulerSchedulerConfig,
        LtxFullConfig,
        LtxInferenceConfig,
    )
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    tcfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=2,
        caption_channels=16,
    )
    vae_kw = dict(TINY_VAE)
    vae_kw.update(latent_channels=8, spatial_compression_ratio=32)
    full = LtxFullConfig(
        inference=LtxInferenceConfig(guidance_scale=2.0,
                                     num_inference_steps=2),
        transformer=tcfg,
        vae=V.LtxVaeConfig(**vae_kw),
        scheduler=FlowMatchEulerSchedulerConfig(
            shift_terminal=0.1, base_shift=0.95, max_shift=2.05,
            base_image_seq_len=1024, max_image_seq_len=4096,
        ),
    )
    tparams = TF.init_params(jax.random.PRNGKey(0), tcfg, dtype=jnp.float32)
    vparams = init_vae_params(jax.random.PRNGKey(1), full.vae,
                              dtype=jnp.float32)
    return P, full, P.LtxPipeline(config=full, transformer_params=tparams,
                                  vae_params=vparams, tokenizer=None)


def verify_pipeline():
    """Tiny generate(): determinism across calls + output envelope
    (verify_pipeline.rs checks PSNR vs a diffusers capture; zero-egress
    here, so this verifies the generate() contract itself)."""
    import jax.numpy as jnp

    P, full, pipe = _tiny_full_pipeline()
    rng = np.random.default_rng(7)
    emb = jnp.asarray(
        rng.normal(size=(1, 8, full.transformer.caption_channels)), jnp.float32
    )
    nemb = jnp.zeros_like(emb)
    m = jnp.ones((1, 8), jnp.float32)
    kw = dict(prompt_embeds=emb, prompt_attention_mask=m,
              negative_prompt_embeds=nemb, negative_prompt_attention_mask=m,
              height=64, width=64, num_frames=5, num_inference_steps=2,
              seed=11, output_type="tensor")
    a = np.asarray(P.generate(pipe, **kw))
    b = np.asarray(P.generate(pipe, **kw))
    det = float(np.abs(a - b).max())
    env = 0.0 if (a.min() >= 0.0 and a.max() <= 255.0) else 1.0
    _report("pipeline", "determinism+range", det + env, 0.0)


def verify_pipeline_step():
    """denoise_loop single step ≡ scheduler.step(transformer(x)) composed
    by hand (verify-pipeline-step)."""
    import jax
    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.ops.rope import rope_cos_sin

    P2, full, pipe = _tiny_full_pipeline()
    tcfg = full.transformer
    params = pipe.transformer_params
    rng = np.random.default_rng(8)
    f, h, w = 2, 2, 2
    s = f * h * w
    x = jnp.asarray(rng.normal(size=(1, s, tcfg.in_channels)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 6, tcfg.caption_channels)),
                      jnp.float32)
    mask = jnp.ones((1, 6), jnp.float32)
    coords = P.build_video_coords(f, h, w, frame_rate=25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [tcfg.rope_base_num_frames, tcfg.rope_base_height,
         tcfg.rope_base_width], jnp.float32)
    cos, sin = rope_cos_sin(grid, tcfg.inner_dim, tcfg.rope_theta)
    # 2-step schedule sliced to a single step (1-step + shift_terminal is
    # degenerate: t[-1]=1 makes the terminal stretch 0/0, as in diffusers)
    sch = S.set_timesteps(full.scheduler, num_inference_steps=2)
    skip = jnp.zeros((tcfg.num_layers, 1), jnp.float32)
    one = P.denoise_loop(
        params, tcfg, x, enc, mask, sch.sigmas_jnp[:2], sch.timesteps_jnp[:1],
        cos, sin, jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        skip, jax.random.PRNGKey(0), num_conds=1, attn_impl="xla",
    )
    t = jnp.broadcast_to(sch.timesteps_jnp[0], (1,))
    mo = TF.forward(params, tcfg, x, enc, t, cos, sin,
                    encoder_attention_mask=mask, attn_impl="xla")
    want = S.step(x, mo, sch.sigmas_jnp[0], sch.sigmas_jnp[1])
    _report("pipeline-step", "maxabs",
            float(np.abs(np.asarray(one) - np.asarray(want)).max()), 1e-4)


def verify_quant():
    """Weight-only quantized matmuls vs unfused dequant oracles: W8A16
    (int8-in-HBM, the T5/13B carry) and W4A16 (packed nibbles + affine
    group-32 — GGUF Q4_K's dequant form, the 13B-plus-resident-T5 tier).
    No direct reference binary (its GGUF path is exercised by verify-t5);
    covers ops/pallas/int{8,4}_weight_matmul.py."""
    import jax.numpy as jnp

    from candle_video_tpu.ops.pallas.int4_weight_matmul import (
        dequantize_int4_blockwise,
        quantize_int4_blockwise,
        w4_matmul_auto,
    )
    from candle_video_tpu.ops.pallas.int8_weight_matmul import (
        dequantize_int8_blockwise,
        quantize_int8_blockwise,
        w8_matmul_auto,
    )

    rng = np.random.default_rng(11)
    k, n = 256, 192
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    x = rng.normal(size=(16, k)).astype(np.float32)

    q8, s8 = quantize_int8_blockwise(w)
    ref8 = np.asarray(
        (jnp.asarray(x, jnp.bfloat16) @ jnp.asarray(
            dequantize_int8_blockwise(q8, s8), jnp.float32
        ).astype(jnp.bfloat16)).astype(jnp.float32)
    )
    got8 = np.asarray(w8_matmul_auto(
        jnp.asarray(x), jnp.asarray(q8), jnp.asarray(s8),
        out_dtype=jnp.float32,
    ))
    _report("quant-w8", "relmax",
            float(np.abs(got8 - ref8).max() / np.abs(ref8).max()), 3e-3)

    p4, s4, m4 = quantize_int4_blockwise(w)
    ref4 = np.asarray(
        (jnp.asarray(x, jnp.bfloat16) @ jnp.asarray(
            dequantize_int4_blockwise(p4, s4, m4), jnp.float32
        ).astype(jnp.bfloat16)).astype(jnp.float32)
    )
    got4 = np.asarray(w4_matmul_auto(
        jnp.asarray(x), jnp.asarray(p4), jnp.asarray(s4), jnp.asarray(m4),
        out_dtype=jnp.float32,
    ))
    # the fused kernel's k-tile partial sums reorder the f32 accumulation
    # vs the oracle's single matmul — a wider envelope than w8 (whose
    # small-M tile covers all of K in one step at these shapes)
    _report("quant-w4", "relmax",
            float(np.abs(got4 - ref4).max() / np.abs(ref4).max()), 6e-3)


# ---------------------------------------------------------------------------

TARGETS = {
    "rng": verify_rng,
    "scheduler": verify_scheduler,
    "scheduler-math": verify_scheduler_math,
    "scheduler-step": verify_scheduler_step,
    "dit": verify_dit,
    "vae-encoder": verify_vae_encoder,
    "vae-decode": verify_vae_decode,
    "vae-roundtrip": verify_vae_roundtrip,
    "vae-tiling": verify_vae_tiling,
    "t5": verify_t5,
    "quant": verify_quant,
    "pipeline": verify_pipeline,
    "pipeline-step": verify_pipeline_step,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("targets", nargs="+", choices=sorted(TARGETS) + ["all"])
    args = ap.parse_args()

    import jax

    # torch-mirror parity is an f32 CPU exercise
    jax.config.update("jax_platforms", "cpu")

    targets = sorted(TARGETS) if "all" in args.targets else args.targets
    for t in targets:
        try:
            TARGETS[t]()
        except Exception as e:  # noqa: BLE001
            _RESULTS.append((t, False))
            print(f"[{t:<16}] ERROR: {type(e).__name__}: {e}", flush=True)
    bad = [n for n, ok in _RESULTS if not ok]
    print(f"\n{len(_RESULTS) - len(bad)}/{len(_RESULTS)} checks passed"
          + (f"; FAILED: {', '.join(bad)}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
