"""13B text-to-video with the T5-XXL encoder RESIDENT — weight-only int4.

The W8A16 13B tree (12.7 GiB) forces STAGED memory: T5 encodes first and
is freed before the DiT materializes (benches/bench_13b.py).  At W4A16
(packed nibbles + bf16 affine group-32 scale/min ≈ 5 bits/weight,
ops/pallas/int4_weight_matmul.py) the 13B DiT is ~7.8 GiB, and with the
T5-XXL ALSO at true 4-bit (the GGUF Q4_K in-HBM carry, ~2.8 GiB) the
whole serving set — DiT + encoder + VAE decoder — is ~11.6 GiB resident
on one 16 GiB chip: every generate() call runs prompt -> encode ->
denoise -> decode with no model swapping, and the decode runs the same
full-frame ups-split stream as the W8A16 bench.  (First cut kept the
int8 T5: 13.9 GiB resident OOM'd the decode's half-res dense prefix.)
The reference's GGUF tiers include exactly Q4_K (README.md quantization
table); its 13B model cannot run on its 12 GB GPU at any precision.

Metrics (one JSON line each):
  denoise_step_ms_13b_int4_512x768x97f
  e2e_s_13b_int4_512x768x97f  — INCLUDES the resident-T5 prompt encode
  hbm_gib_13b_int4_resident   — DiT + T5 + VAE decoder footprint
  t5_hbm_gib_xxl_q4k          — the true-4-bit T5 footprint

Weights are random (direct-int4 device init — real checkpoints quantize
at load via loader.transformer_params_w4_from_state_dict); compute cost
is value-independent.

Run: python -m benches.bench_13b_w4   (needs the whole chip)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

T0 = time.perf_counter()


def log(msg):
    print(f"[13b-w4 +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def build_t5_w4_params(cfg):
    """Full-size T5-XXL with every linear at TRUE 4-bit in HBM — the same
    leaf format params_from_gguf(keep_quantized=True) produces for Q4_K
    files ({w4 packed nibbles, w4_scale, w4_min} — t5.py::_linear).
    Deterministic on-device fill (a 9.5 GiB host transfer would dominate
    setup); values only matter statistically."""
    import functools

    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k", "n"))
    def wp(seed, k, n):
        i = jax.lax.iota(jnp.uint32, (k // 2) * n).reshape(k // 2, n)
        return ((i * jnp.uint32(2654435761) + seed) % 256).astype(jnp.uint8)

    @functools.partial(jax.jit, static_argnames=("k", "n"))
    def sc(k, n, v):
        return jnp.full((k // 32, n), v, jnp.float32)

    def qlin(seed, k, n):
        # uniform nibbles q~U[0,15]; affine centers dequant at 0
        return {"w4": wp(jnp.uint32(seed), k, n),
                "w4_scale": sc(k, n, 1e-4), "w4_min": sc(k, n, -7.5e-4)}

    d, ff = cfg.d_model, cfg.d_ff
    blocks = []
    for i in range(cfg.num_layers):
        blk = {
            "attn": {
                "q": qlin(7 * i + 1, d, d),
                "k": qlin(7 * i + 2, d, d),
                "v": qlin(7 * i + 3, d, d),
                "o": qlin(7 * i + 4, d, d),
            },
            "attn_norm": {"weight": jnp.ones((d,), jnp.float32)},
            "ffn": {
                "wi_0": qlin(7 * i + 5, d, ff),
                "wi_1": qlin(7 * i + 6, d, ff),
                "wo": qlin(7 * i + 7, ff, d),
            },
            "ffn_norm": {"weight": jnp.ones((d,), jnp.float32)},
        }
        if i == 0:
            blk["attn"]["relative_attention_bias"] = jnp.zeros(
                (cfg.relative_attention_num_buckets, cfg.num_heads),
                jnp.float32,
            )
        blocks.append(blk)

    @jax.jit
    def emb(seed):
        i = jax.lax.iota(jnp.uint32, cfg.vocab_size * d).reshape(
            cfg.vocab_size, d)
        u = ((i * jnp.uint32(2654435761) + seed) % 255).astype(jnp.int8)
        return u.astype(jnp.bfloat16) * 0.02

    return {
        "embedding": emb(jnp.uint32(99)),
        "blocks": blocks,
        "final_norm": {"weight": jnp.ones((d,), jnp.float32)},
    }


def main():
    from candle_video_tpu.models.ltx_video import configs as C
    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video import t5 as T5
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params
    from candle_video_tpu.ops.rope import rope_cos_sin, rope_split_tables

    full = C.v0_9_8_distilled_13b()
    cfg = full.transformer
    f, h, w = 13, 16, 24  # 512x768x97f
    s = f * h * w
    log(f"13B config: {cfg.num_layers}L, {cfg.num_attention_heads}x"
        f"{cfg.attention_head_dim}, S={s}")

    # --- everything RESIDENT: T5 Q4_K-form w4, 13B int4 DiT, VAE decoder ---
    t5_cfg = T5.t5_xxl()
    assert t5_cfg.d_model == cfg.caption_channels
    t5_params = build_t5_w4_params(t5_cfg)
    jax.block_until_ready(t5_params)
    t5_gib = sum(x.nbytes for x in jax.tree.leaves(t5_params)) / 2**30
    log(f"T5-XXL w4 (Q4_K-form) resident: {t5_gib:.2f} GiB")

    params = TF.init_params_w4(jax.random.PRNGKey(0), cfg, qblock=32)
    jax.block_until_ready(params)
    dit_gib = sum(x.nbytes for x in jax.tree.leaves(params)) / 2**30
    log(f"13B W4A16 DiT resident: {dit_gib:.2f} GiB")

    vae_params = init_vae_params(jax.random.PRNGKey(1), full.vae, jnp.bfloat16)
    vae_params.pop("encoder", None)
    jax.block_until_ready(vae_params)
    vae_gib = sum(x.nbytes for x in jax.tree.leaves(vae_params)) / 2**30
    total_gib = t5_gib + dit_gib + vae_gib
    log(f"VAE decoder resident: {vae_gib:.2f} GiB — total {total_gib:.2f} GiB")

    # --- denoise step latency (production dispatch) ------------------------
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(1, s, cfg.in_channels)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 128, cfg.caption_channels)) * 0.02,
                      jnp.float32)
    mask = jnp.ones((1, 128), jnp.float32)
    coords = P.build_video_coords(f, h, w, frame_rate=25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [cfg.rope_base_num_frames, cfg.rope_base_height, cfg.rope_base_width],
        jnp.float32,
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim, cfg.rope_theta)
    sch = S.set_timesteps(full.scheduler, num_inference_steps=7, mu=0.0)
    skip = jnp.zeros((cfg.num_layers, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    n_steps = int(sch.timesteps.shape[0])

    from candle_video_tpu.ops.pallas.flash_attention_packed import packed_viable
    use_split = (
        jax.devices()[0].platform in ("tpu", "axon")
        and cfg.inner_dim % 128 == 0
        and packed_viable(s, s, cfg.num_attention_heads,
                          cfg.attention_head_dim)
    )
    rope_split = rope_split_tables(cos, sin) if use_split else None
    log(f"split-rope dispatch: {use_split}")

    def run():
        return P.denoise_loop(
            params, cfg, latents, enc, mask,
            sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
            jnp.float32(full.inference.guidance_scale), jnp.float32(0.0),
            jnp.float32(0.0), skip, key, num_conds=1, attn_impl="auto",
            rope_split=rope_split,
        )

    out = run()
    np.asarray(out[0, 0, 0])
    log("denoise compiled + first run done")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    log(f"denoise: {best:.3f} s / {n_steps} steps")
    print(json.dumps({
        "metric": "denoise_step_ms_13b_int4_512x768x97f",
        "value": round(best / n_steps * 1000.0, 1),
        "unit": "ms/step",
        "vs_baseline": None,  # reference cannot run 13B on its 12 GB GPU
    }), flush=True)

    # --- e2e WITH the resident encoder in the loop -------------------------
    latents = enc = cos = sin = rope_split = out = None  # noqa: F841
    from candle_video_tpu.utils.tokenizer import MockTokenizer

    pipe = P.LtxPipeline(
        config=full, transformer_params=params, vae_params=vae_params,
        t5_params=t5_params, t5_config=t5_cfg,
        tokenizer=MockTokenizer(vocab_size=t5_cfg.vocab_size,
                                model_max_length=128),
    )
    pipe.mark_rope_presplit()  # uniform-nibble payloads need no permutation
    params = None

    decode_mode = "stream_ups_n6_fullframe"

    def e2e():
        # prompt -> T5 encode (resident!) -> denoise -> full-frame ups-
        # split streamed decode, all in one call, no staging.  No tiled
        # fallback: failure must fail the bench.
        return P.generate(
            pipe,
            prompt="a red panda climbing a snow-covered pine tree",
            height=512, width=768, num_frames=97,
            output_type="tensor",
            use_pcg_rng=False,
            max_sequence_length=128,
            vae_tail_stream_chunks=6,
            vae_tail_stream_from_ups=True,
        )

    out = e2e()
    np.asarray(out[0, 0, 0, 0, :1])
    log(f"e2e compiled + first run done (decode_mode={decode_mode})")
    best = float("inf")
    for _ in range(2):
        out = None
        t0 = time.perf_counter()
        out = e2e()
        np.asarray(out[0, 0, 0, 0, :1])
        best = min(best, time.perf_counter() - t0)
    log(f"e2e: {best:.3f} s (incl. resident-T5 encode)")
    assert out.shape[0] == 1 and 512 in out.shape and 768 in out.shape

    print(json.dumps({
        "metric": "e2e_s_13b_int4_512x768x97f",
        "value": round(best, 2),
        "unit": "s",
        "vs_baseline": None,
        "decode_mode": decode_mode,
        "note": "T5-XXL resident; e2e includes prompt encode",
    }), flush=True)
    print(json.dumps({
        "metric": "hbm_gib_13b_int4_resident",
        "value": round(total_gib, 2),
        "unit": "GiB",
        "vs_baseline": None,
    }), flush=True)
    print(json.dumps({
        "metric": "t5_hbm_gib_xxl_q4k",
        "value": round(t5_gib, 2),
        "unit": "GiB",
        "vs_baseline": None,
    }), flush=True)


if __name__ == "__main__":
    main()
