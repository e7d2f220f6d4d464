"""Long-clip flagship bench: 2B LTX at 512x768x257f on ONE chip, end to end.

S = 33*16*24 = 12672 video tokens — past the one-pass packed kernel's VMEM
envelope, so self-attention runs the multi-k-block LONG kernel
(ops/pallas/flash_attention_packed.py::_kernel_long; choice logged at
trace time, no silent fallback), and the decode runs whatever
vae.select_decode_mode picks for the free HBM (expected: streaming — the
dense 257-frame decode peak is ~3x the 97f one).  The reference handles
long clips only via approximate temporal tiling
(/root/reference/src/models/ltx_video/vae.rs:2294-2434); this path is
exact at every length.

Metrics (one JSON line each):
  denoise_step_ms_2b_512x768x257f — per-step latency of the 7-step scan
  e2e_s_2b_512x768x257f           — embeds -> denoise -> decode -> video

Run standalone: python -m benches.bench_long  (needs the whole chip; no
resident T5 — long-clip generation is the memory-bound regime).
"""

from __future__ import annotations

import functools
import json
import logging
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/candle_video_tpu_xla"))

H, W, F = 512, 768, 257  # -> latents 33 x 16 x 24, S = 12672


def _emit(metric, value, unit, vs_baseline=None):
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, "vs_baseline": vs_baseline}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params
    from candle_video_tpu.models.ltx_video.zeros_init import (
        zeros_transformer_params,
    )
    from candle_video_tpu.ops.rope import rope_cos_sin
    from candle_video_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    # surface the kernel-choice log lines on stderr
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(name)s: %(message)s")
    logging.getLogger("jax").setLevel(logging.WARNING)

    full = get_config_by_version("0.9.8-2b-distilled")
    cfg = full.transformer
    params = zeros_transformer_params(cfg, jnp.bfloat16)
    vae_params = init_vae_params(jax.random.PRNGKey(0), full.vae, jnp.bfloat16)
    rng = np.random.default_rng(0)

    def fetch(x):
        leaf = jax.tree.leaves(x)[0]
        idx = tuple(0 for _ in range(leaf.ndim - 1)) + (slice(0, 1),)
        np.asarray(leaf[idx])

    def timed_best(fn, n=2):
        out = fn()
        fetch(out)
        best = float("inf")
        for _ in range(n):
            out = None
            t0 = time.time()
            out = fn()
            fetch(out)
            best = min(best, time.time() - t0)
        return best, out

    pipe = P.LtxPipeline(config=full, transformer_params=params,
                         vae_params=vae_params)
    emb = jnp.zeros((1, 128, cfg.caption_channels), jnp.float32)
    mask = jnp.ones((1, 128), jnp.float32)

    # what the policy picks for this shape on this chip — logged for the record
    zshape = (1, full.vae.latent_channels, (F - 1) // 8 + 1, H // 32, W // 32)
    picked = V.select_decode_mode(full.vae, zshape)
    print(f"[bench_long] select_decode_mode{zshape} -> {picked or 'dense'}",
          file=sys.stderr, flush=True)

    def e2e():
        return P.generate(
            pipe,
            prompt_embeds=emb,
            prompt_attention_mask=mask,
            height=H, width=W, num_frames=F,
            output_type="tensor",
            use_pcg_rng=False,
            decode_warmup=True,  # decode programs compile during denoise
        )

    e2e_s, video = timed_best(e2e, n=2)
    assert video.shape[0] == 1 and H in video.shape and W in video.shape, (
        video.shape)
    video = None
    _emit("e2e_s_2b_512x768x257f", e2e_s, "s")

    # denoise-only per-step latency at S=12672 (the long-kernel regime)
    f, h, w = (F - 1) // 8 + 1, H // 32, W // 32
    s_len = f * h * w
    latents = jnp.asarray(rng.normal(size=(1, s_len, cfg.in_channels)),
                          jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 128, cfg.caption_channels)) * 0.02,
                      jnp.float32)
    coords = P.build_video_coords(f, h, w, frame_rate=25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [cfg.rope_base_num_frames, cfg.rope_base_height, cfg.rope_base_width],
        jnp.float32,
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim, cfg.rope_theta)
    sch = S.set_timesteps(
        full.scheduler, num_inference_steps=7,
        sigmas=list(full.inference.timesteps), mu=0.0,
    )
    skip = jnp.zeros((cfg.num_layers, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    n_steps = sch.timesteps.shape[0]

    rope_split = None
    run_params = params
    if P._use_split_rope(pipe, cfg, s_len, "auto"):
        from candle_video_tpu.ops.rope import rope_split_tables

        rope_split = rope_split_tables(cos, sin)
        run_params = pipe.split_rope_params()

    def run():
        return P.denoise_loop(
            run_params, cfg, latents, enc, mask,
            sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            skip, key, num_conds=1, attn_impl="auto",
            rope_split=rope_split,
        )

    step_s, _ = timed_best(run, n=3)
    _emit("denoise_step_ms_2b_512x768x257f", step_s / n_steps * 1000.0,
          "ms/step")


if __name__ == "__main__":
    main()
