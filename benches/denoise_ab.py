"""Measure the production denoise scan (bench.py section 4 only) — used to
A/B attention-kernel experiments via env vars, e.g.:

    python benches/denoise_ab.py                      # baseline
    CVT_ATTN_SOFTMAX_BOUND=8 python benches/denoise_ab.py
    CVT_ATTN_SCORES_BF16=1 python benches/denoise_ab.py

One process per variant: the env is read at trace time.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/candle_video_tpu_xla"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.zeros_init import (
        zeros_transformer_params,
    )
    from candle_video_tpu.ops.rope import rope_cos_sin

    full = get_config_by_version("0.9.8-2b-distilled")
    cfg = full.transformer
    params = zeros_transformer_params(cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)

    def fetch(x):
        leaf = jax.tree.leaves(x)[0]
        idx = tuple(0 for _ in range(leaf.ndim - 1)) + (slice(0, 1),)
        np.asarray(leaf[idx])

    def calib():
        a = jnp.ones((2048, 2048), jnp.bfloat16)
        f = jax.jit(lambda a: a @ a @ a @ a)
        f(a)
        fetch(f(a))
        t0 = time.time()
        fetch(f(a))
        return (time.time() - t0) * 1e3

    f, h, w = 13, 16, 24
    s = f * h * w
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
    sch = S.set_timesteps(
        full.scheduler, num_inference_steps=7,
        sigmas=list(full.inference.timesteps), mu=0.0,
    )
    skip = jnp.zeros((cfg.num_layers, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    n_steps = sch.timesteps.shape[0]

    pipe = P.LtxPipeline(config=full, transformer_params=params,
                         tokenizer=None)
    rope_split = None
    run_params = params
    if P._use_split_rope(pipe, cfg, s, "auto"):
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

    out = run()
    fetch(out)
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        fetch(run())
        best = min(best, time.time() - t0)
    env = {k: v for k, v in os.environ.items() if k.startswith("CVT_ATTN")}
    print(f"denoise {best/n_steps*1e3:.2f} ms/step  env={env}  "
          f"calib={calib():.1f}ms", flush=True)
    # one-number output-difference probe vs nothing (caller compares runs)
    print("out[0,:3,0] =", np.asarray(out[0, :3, 0]).tolist(), flush=True)


if __name__ == "__main__":
    main()
