"""13B DiT denoise on ONE 16 GiB chip via weight-only int8 (W8A16).

The 13B LTX transformer (48 layers, 32x128 heads, d=4096 —
reference configs.rs:151-160) is ~26 GiB in BF16: it cannot fit a single
v5e chip (nor the reference's 12 GB RTX 3060 at any precision).  With the
block linears quantized to int8-in-HBM (~12.4 GiB incl. scales) and dequant
fused into the Pallas matmul k-loop (ops/pallas/int8_weight_matmul.py), the
full model runs single-chip.  This bench measures the production denoise
scan (jitted lax.scan, 7 distilled steps, packed-kernel attention with the
split-rope layout) at 512x768x97f (S=4992).

Weights are random (direct-int8 device init — real checkpoints quantize at
load via transformer.quantize_transformer_params_w8); compute cost is
value-independent.

Run: python -m benches.bench_13b
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(msg):
    print(f"[13b +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.perf_counter()


def main():
    from candle_video_tpu.models.ltx_video import configs as C
    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.ops.rope import rope_cos_sin, rope_split_tables

    full = C.v0_9_8_distilled_13b()
    cfg = full.transformer
    f, h, w = 13, 16, 24  # 97f x 512 x 768 -> latent (97//8+1, 512/32, 768/32)
    s = f * h * w

    log(f"13B config: {cfg.num_layers}L, {cfg.num_attention_heads}x"
        f"{cfg.attention_head_dim}, S={s}")

    params = TF.init_params_w8(jax.random.PRNGKey(0), cfg, qblock=128)
    # force materialization, then report the param footprint
    jax.block_until_ready(params)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    log(f"params materialized: {nbytes / 2**30:.2f} GiB on device")

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

    # production dispatch: packed kernel + split-rope tables.  Random weights
    # need no permutation (permute_params_rope_split is exact on w8 params
    # and a no-op statistically on uniform-byte payloads); real checkpoints
    # permute once at setup.
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

    out = run()  # compile
    np.asarray(out[0, 0, 0])
    log("compiled + first run done")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out[0, 0, 0])  # one-element fetch (timing methodology)
        best = min(best, time.perf_counter() - t0)
    step_ms = best / n_steps * 1000.0
    log(f"denoise: {best:.3f} s / {n_steps} steps")

    print(json.dumps({
        "metric": "denoise_step_ms_13b_int8_512x768x97f",
        "value": round(step_ms, 1),
        "unit": "ms/step",
        "vs_baseline": None,  # reference cannot run 13B on its 12 GB GPU
    }))


if __name__ == "__main__":
    main()
