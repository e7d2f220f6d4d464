"""Serving throughput/latency bench: the measured story for serving.py.

Drives VideoGenerationServer at the flagship bucket (512x768x97f, 7
distilled steps, embeds-injected requests — production serving reuses the
prompt-embedding cache) under a burst of N requests and reports:

- ``serving_videos_per_min``      — sustained throughput, continuous
  batching (max_batch=2: two requests ride one generate() as CFG-style
  batch rows; decode peak stays inside one chip next to the resident T5)
- ``serving_p50_s`` / ``serving_p95_s`` — request sojourn (submit ->
  result, INCLUDING queueing) under the same burst
- ``serving_seq_videos_per_min``  — max_batch=1 baseline (every request
  its own generate call)
- ``serving_mixed_videos_per_min``— mixed-bucket load (flagship bucket
  interleaved with 256x384x33f): exercises the no-starvation pending list
  and per-bucket dispatch

Run standalone (``python -m benches.serving_bench``) with synthetic
weights, or let bench.py call :func:`run` with its already-resident
pipeline (same process, warm jits — measures serving, not compilation).
"""

from __future__ import annotations

import json
import time


def _percentile(xs, p):
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, round(p / 100 * (len(xs) - 1))))
    return xs[i]


def run(pipe, emb, mask, *, n_requests: int = 6, max_batch: int = 2,
        emit=print, stream_chunks: int = 2, mixed: bool = True):
    """Returns {metric: value}; emits one JSON line per metric via ``emit``."""
    import numpy as np

    from candle_video_tpu.serving import (
        Request,
        ShapeBucket,
        VideoGenerationServer,
    )

    big = ShapeBucket(512, 768, 97, 7)
    small = ShapeBucket(256, 384, 33, 7)
    results = {}

    def req(seed, bucket):
        return Request(prompt_embeds=emb, prompt_attention_mask=mask,
                       bucket=bucket, seed=seed)

    def drive(server, reqs, tag):
        server.warmup(emb, mask)
        server.start()
        t0 = time.time()
        outs = [(time.time(), server.submit(r)) for r in reqs]
        lats = []
        for t_sub, q in outs:
            res = q.get(timeout=1200)
            if isinstance(res, Exception):
                raise res
            np.asarray(res[(0,) * res.ndim])  # forced device sync per video
            lats.append(time.time() - t_sub)
        wall = time.time() - t0
        server.stop()
        return wall, lats

    # continuous batching at the flagship bucket
    srv = VideoGenerationServer(pipe, [big], max_batch=max_batch,
                                use_pcg_rng=False,
                                vae_tail_stream_chunks=stream_chunks)
    wall, lats = drive(srv, [req(100 + i, big) for i in range(n_requests)],
                       "batched")
    results["serving_videos_per_min"] = n_requests / wall * 60.0
    results["serving_p50_s"] = _percentile(lats, 50)
    results["serving_p95_s"] = _percentile(lats, 95)

    # sequential baseline (max_batch=1)
    srv = VideoGenerationServer(pipe, [big], max_batch=1,
                                use_pcg_rng=False,
                                vae_tail_stream_chunks=stream_chunks)
    wall, _ = drive(srv, [req(200 + i, big) for i in range(n_requests)],
                    "sequential")
    results["serving_seq_videos_per_min"] = n_requests / wall * 60.0

    if mixed:
        # mixed-bucket burst: big/small interleaved; the batcher must group
        # per bucket without starving either class
        srv = VideoGenerationServer(pipe, [big, small], max_batch=max_batch,
                                    use_pcg_rng=False,
                                    vae_tail_stream_chunks=stream_chunks)
        reqs = []
        for i in range(n_requests):
            reqs.append(req(300 + i, big if i % 2 == 0 else small))
        wall, _ = drive(srv, reqs, "mixed")
        results["serving_mixed_videos_per_min"] = n_requests / wall * 60.0

    for k, v in results.items():
        emit(json.dumps({
            "metric": k,
            "value": round(v, 2),
            "unit": "videos/min" if "per_min" in k else "s",
            "vs_baseline": None,  # reference has no serving story (one-shot CLI)
        }), flush=True)
    return results


def main():
    import jax
    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params
    from candle_video_tpu.models.ltx_video.zeros_init import (
        zeros_transformer_params,
    )

    full = get_config_by_version("0.9.8-2b-distilled")
    pipe = P.LtxPipeline(
        config=full,
        transformer_params=zeros_transformer_params(full.transformer,
                                                    jnp.bfloat16),
        vae_params=init_vae_params(jax.random.PRNGKey(0), full.vae,
                                   jnp.bfloat16),
    )
    emb = jnp.zeros((1, 128, full.transformer.caption_channels), jnp.float32)
    mask = jnp.ones((1, 128), jnp.float32)
    run(pipe, emb, mask)


if __name__ == "__main__":
    main()
