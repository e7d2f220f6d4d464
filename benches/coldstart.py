"""Cold/warm start: wall-clock from process start to the first finished
frame of a production-shape generation (512x768x97f, default preset).

The reference brags ~2 s startup on its prebuilt CUDA binaries
(/root/reference/README.md:57); a JAX process pays interpreter + jax import
+ XLA compilation.  bench.py runs this script twice in fresh subprocesses:
the first (``coldstart_cold_s``) and a repeat (``coldstart_s``).

Compile accounting (round-5): every stage line carries the number of XLA
compilations and their summed wall-clock so far, so cache behavior is
VISIBLE instead of inferred.  On a backend with a working persistent cache
the repeat run shows ~0 compile seconds; on the axon tunnel the persistent
cache cannot be used at all — executables deserialize but hang at first
execution (see utils/compile_cache.py) — so both runs recompile and the
counter documents exactly what they paid.  The round-4 "warm 79 s > cold
54 s" inversion was this: no cache either run (the env var JAX 0.9 ignores
was the only thing set), pure tunnel noise between two full recompiles.

Cold-start structure on the tunnel (remote XLA compiles):
  - params: ONE jitted builder per model (zeros DiT, hash-normal VAE)
  - denoise: one scan program (~4 s compile)
  - decode: head + streaming-tail step programs (the big compile, ~15-25 s)
    — compiled on a BACKGROUND thread while denoise compiles/runs
    (generate(decode_warmup=True)), so the critical path is
    max(decode_compile, denoise_compile + denoise_run).

Run: python -m benches.coldstart   (prints one JSON line with the elapsed)
"""

from __future__ import annotations

import json
import sys
import time

T0 = time.perf_counter()  # process-level: import costs count

_COUNTER = None


def _mark(name):
    # stage attribution on stderr (the JSON contract on stdout is unchanged):
    # separates interpreter+import, device attach, param build, and the
    # generate() call (compiles + execution) in the startup total
    extra = ""
    if _COUNTER is not None:
        n, secs = _COUNTER.snapshot()
        extra = f"  [{n} compiles, {secs:.1f}s compiling]"
    print(f"[coldstart +{time.perf_counter() - T0:7.1f}s] {name}{extra}",
          file=sys.stderr, flush=True)


def main():
    global _COUNTER

    import jax
    import jax.numpy as jnp
    import numpy as np

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params
    from candle_video_tpu.models.ltx_video.zeros_init import (
        zeros_transformer_params,
    )
    from candle_video_tpu.utils.compile_cache import (
        CompileCounter,
        enable_persistent_cache,
    )

    cache_on = enable_persistent_cache()
    _COUNTER = CompileCounter().install()
    _mark(f"imports done (persistent cache {'ON' if cache_on else 'OFF'})")
    jax.devices()
    _mark("device attached")

    full = get_config_by_version("0.9.8-2b-distilled")
    params = zeros_transformer_params(full.transformer, jnp.bfloat16)
    vae_params = init_vae_params(
        jax.random.PRNGKey(0), full.vae, jnp.bfloat16
    )
    _mark("params built")
    pipe = P.LtxPipeline(
        config=full, transformer_params=params, vae_params=vae_params
    )
    emb = jnp.zeros((1, 128, full.transformer.caption_channels), jnp.float32)
    mask = jnp.ones((1, 128), jnp.float32)
    # preset defaults (7 distilled steps) — the same programs the e2e bench
    # compiles, so a repeat CLI user of the default preset sees this path
    video = P.generate(
        pipe,
        prompt_embeds=emb,
        prompt_attention_mask=mask,
        height=512, width=768, num_frames=97,
        output_type="tensor",
        use_pcg_rng=False,
        vae_tail_stream_chunks=2,
        decode_warmup=True,
    )
    np.asarray(video[0, 0, 0, 0, :1])  # first frame ready
    _mark("first frame fetched")
    elapsed = time.perf_counter() - T0
    print(json.dumps({"elapsed_s": round(elapsed, 2)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
