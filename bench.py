"""Headline benchmark: 2B DiT denoise-step latency at 512x768x97f (S=4992).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's extrapolated 28-layer per-denoise-step time on its
own hardware (RTX 3060, flash-attn BF16): ~260 ms @ seq 4096 and ~500 ms @
seq 8192 (docs/benchmark_results.md:43-47).  Linear interpolation to our
S=4992 gives ~312 ms/step.  vs_baseline = baseline_ms / ours_ms (>1 = faster
than the reference).
"""

from __future__ import annotations

import json
import time


BASELINE_MS = 260.0 + (4992 - 4096) * (500.0 - 260.0) / (8192 - 4096)  # ~312.5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.pipeline import build_video_coords
    from candle_video_tpu.models.ltx_video.zeros_init import zeros_transformer_params
    from candle_video_tpu.ops.rope import rope_cos_sin
    from candle_video_tpu.models.ltx_video import scheduler as S

    cfg = get_config_by_version("0.9.8-2b-distilled").transformer
    params = zeros_transformer_params(cfg, jnp.bfloat16)

    f, h, w = 13, 16, 24  # 512x768x97f latents
    s = f * h * w
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(1, s, cfg.in_channels)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 128, cfg.caption_channels)) * 0.02,
                      jnp.float32)
    t = jnp.full((1,), 993.0, jnp.float32)
    mask = jnp.ones((1, 128), jnp.float32)

    coords = build_video_coords(f, h, w, frame_rate=25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [cfg.rope_base_num_frames, cfg.rope_base_height, cfg.rope_base_width],
        jnp.float32,
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim, cfg.rope_theta)

    # NOTE: no buffer donation — donated aliasing triggered TPU backend
    # crashes on the axon runtime
    @jax.jit
    def denoise_step(params, latents, enc, t, mask, cos, sin):
        pred = TF.forward(
            params, cfg, latents, enc, t, cos, sin,
            encoder_attention_mask=mask, attn_impl="auto",
        ).astype(jnp.float32)
        return S.step(latents, pred, 0.9937, 0.9875)

    # warmup / compile; force completion with a host fetch — on the axon
    # backend block_until_ready can return before execution has finished
    out = denoise_step(params, latents, enc, t, mask, cos, sin)
    np.asarray(out)

    n = 7
    ms = float("inf")
    for _ in range(3):
        lat = latents
        t0 = time.time()
        for _ in range(n):
            lat = denoise_step(params, lat, enc, t, mask, cos, sin)
        np.asarray(lat[0, :1, :1])  # forced device->host sync
        ms = min(ms, (time.time() - t0) / n * 1000.0)

    print(json.dumps({
        "metric": "denoise_step_ms_2b_512x768x97f",
        "value": round(ms, 2),
        "unit": "ms/step",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
