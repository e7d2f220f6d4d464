"""Headline benchmark: 2B denoise-step latency at 512x768x97f (S=4992).

Measures the PRODUCTION denoise path — the jitted ``lax.scan`` loop of
pipeline.denoise_loop (7 distilled steps, one dispatch) — and reports
per-step latency.  Prints ONE JSON line {"metric","value","unit","vs_baseline"}.

Baseline: the reference's extrapolated 28-layer per-denoise-step time on its
own hardware (RTX 3060, flash-attn BF16): ~260 ms @ seq 4096 and ~500 ms @
seq 8192 (docs/benchmark_results.md:43-47); linear interpolation to S=4992
gives ~312.5 ms/step.  vs_baseline = baseline_ms / ours_ms (>1 = faster).

Timing note: on the axon backend block_until_ready may return early and
buffer donation crashes the runtime; timing uses forced host fetches.
"""

from __future__ import annotations

import json
import time

BASELINE_MS = 260.0 + (4992 - 4096) * (500.0 - 260.0) / (8192 - 4096)  # ~312.5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.zeros_init import zeros_transformer_params
    from candle_video_tpu.ops.rope import rope_cos_sin

    full = get_config_by_version("0.9.8-2b-distilled")
    cfg = full.transformer
    params = zeros_transformer_params(cfg, jnp.bfloat16)

    f, h, w = 13, 16, 24  # 512x768x97f latents -> S=4992
    s = f * h * w
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

    sch = S.set_timesteps(
        full.scheduler, num_inference_steps=7,
        sigmas=list(full.inference.timesteps), mu=0.0,
    )
    skip = jnp.zeros((cfg.num_layers, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    n_steps = sch.timesteps.shape[0]

    def run():
        return P.denoise_loop(
            params, cfg, latents, enc, mask,
            sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            skip, key, num_conds=1, attn_impl="auto",
        )

    out = run()
    np.asarray(out[0, :1, :1])  # compile + forced sync

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = run()
        np.asarray(out[0, :1, :1])
        best = min(best, (time.time() - t0) / n_steps * 1000.0)

    print(json.dumps({
        "metric": "denoise_step_ms_2b_512x768x97f",
        "value": round(best, 2),
        "unit": "ms/step",
        "vs_baseline": round(BASELINE_MS / best, 3),
    }))


if __name__ == "__main__":
    main()
