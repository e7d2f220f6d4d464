"""Criterion-style microbenchmark CLI (the reference's benches/
ltx_video_benchmarks.rs surface: scheduler step/set_timesteps, transformer
forward at several sequence lengths, VAE decode, attention kernels).

Usage: python benches/microbench.py [--bench NAME] [--json]

Timing uses forced host fetches (axon block_until_ready is unreliable).
NOTE: standalone per-call numbers include ~4 ms of remote-dispatch latency
on the tunnel setup; in-graph cost inside the production ``lax.scan`` is
lower.  ``bench.py`` measures the production path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, *args, n=10, warmup=1):
    import numpy as np

    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    return (time.time() - t0) / n * 1000.0


def jax_leaf(out):
    import jax

    leaves = jax.tree.leaves(out)
    x = leaves[0]
    return x[tuple(slice(0, 1) for _ in range(x.ndim))]


def bench_scheduler():
    from candle_video_tpu.models.ltx_video import scheduler as S

    cfg = S.FlowMatchEulerSchedulerConfig(shift_terminal=0.1)
    results = {}
    for steps in (10, 30, 50):
        t0 = time.time()
        for _ in range(100):
            S.set_timesteps(cfg, num_inference_steps=steps, mu=1.5)
        results[f"set_timesteps_{steps}"] = (time.time() - t0) / 100 * 1e6  # µs

    import jax.numpy as jnp

    x = jnp.ones((2, 4096, 128), jnp.float32)
    v = jnp.ones((2, 4096, 128), jnp.float32)

    import jax

    step = jax.jit(lambda x, v: S.step(x, v, 0.9, 0.7))
    results["step_b2_seq4096"] = _timed(step, x, v) * 1000.0  # µs
    return {k: round(v, 2) for k, v in results.items()}  # µs


def bench_attention():
    import jax.numpy as jnp

    from candle_video_tpu.ops.attention import attention_xla
    from candle_video_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    results = {}
    for s in (1024, 4096, 4992):
        q = jnp.asarray(rng.normal(size=(1, s, 32, 64)), jnp.bfloat16)
        import functools

        fa = functools.partial(flash_attention, scale=0.125)
        results[f"flash_s{s}"] = round(_timed(fa, q, q, q), 3)
    return results  # ms


def bench_transformer():
    import jax
    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.pipeline import build_video_coords
    from candle_video_tpu.models.ltx_video.zeros_init import zeros_transformer_params
    from candle_video_tpu.ops.rope import rope_cos_sin

    cfg = get_config_by_version("0.9.8-2b-distilled").transformer
    params = zeros_transformer_params(cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    results = {}
    # reference bench shapes: seq 1024 (9f.32.32), 4096 (9f.64.64), 8192 (17f.64.64)
    for name, (f, h, w) in {
        "seq1024": (2, 16, 32),
        "seq4096": (2, 32, 64),
        "seq4992": (13, 16, 24),
    }.items():
        s = f * h * w
        hidden = jnp.asarray(rng.normal(size=(1, s, 128)), jnp.float32)
        enc = jnp.asarray(rng.normal(size=(1, 128, 4096)) * 0.02, jnp.float32)
        t = jnp.full((1,), 993.0, jnp.float32)
        coords = build_video_coords(f, h, w, 25.0)
        grid = jnp.asarray(coords)[None] / jnp.asarray([20, 2048, 2048], jnp.float32)
        cos, sin = rope_cos_sin(grid, cfg.inner_dim)

        import functools

        fwd = jax.jit(
            functools.partial(TF.forward, attn_impl="auto"), static_argnames=("cfg",)
        )
        results[f"dit28_{name}"] = round(
            _timed(fwd, params, cfg, hidden, enc, t, cos, sin, n=5), 2
        )
    return results  # ms


def bench_vae_decode():
    import functools

    import jax
    import jax.numpy as jnp

    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    cfg = V.LtxVaeConfig()
    params = init_vae_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    results = {}
    dec = jax.jit(functools.partial(V.decoder_forward, cfg=cfg))
    for name, (f, h, w) in {"256x384x65f": (9, 8, 12), "512x768x97f": (13, 16, 24)}.items():
        z = jnp.asarray(rng.normal(size=(1, 128, f, h, w)) * 0.3, jnp.bfloat16)
        temb = jnp.asarray([0.05], jnp.float32)
        results[f"decode_{name}"] = round(
            _timed(lambda zz, tt: dec(params["decoder"], z=zz, temb=tt), z, temb, n=3),
            1,
        )
    return results  # ms


BENCHES = {
    "scheduler": bench_scheduler,
    "attention": bench_attention,
    "transformer": bench_transformer,
    "vae": bench_vae_decode,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", choices=list(BENCHES) + ["all"], default="all")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    names = list(BENCHES) if args.bench == "all" else [args.bench]
    out = {}
    for name in names:
        out[name] = BENCHES[name]()
        if not args.json:
            print(f"[{name}]")
            for k, v in out[name].items():
                unit = "µs" if name == "scheduler" else "ms"
                print(f"  {k}: {v} {unit}")
    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
