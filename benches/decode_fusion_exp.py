"""Decode non-conv cost decomposition: where do the ~75 ms between the
402 ms untiled decode and its ~327 ms conv total go?

Times the production channels-last decode (512x768x97f) in ablation
ladder form by monkeypatching the decoder's norm/activation helpers:

  full        — production decoder_forward (baseline)
  no_silu     — silu -> identity
  no_norms    — _rms_norm/_layer_norm -> identity (weights dropped)
  convs_only  — both of the above

The deltas bound what a fused Pallas norm+scale/shift+silu pass could
recover (the norm reduction is over the LANE axis in channels-last, so a
one-read-one-write kernel is possible; XLA runs stats + apply as separate
HBM passes).  Run: python -m benches.decode_fusion_exp

Measured (round 4, v5e tunnel, 512x768x97f untiled dense decode):

    full            404.0 ms
    no_silu         400.7 ms
    no_norms        367.0 ms
    convs_only      365.6 ms

    silu cost      3.4 ms   (XLA already fuses it into neighbours)
    norm cost     37.0 ms
    norm+silu     38.5 ms
    convs+struct 365.6 ms

Conclusion: the perfect-fusion floor (all norm/act cost driven to ZERO)
is 365.6 ms — already above the 350 ms round-3 target.  Decode below
350 requires beating XLA's conv path itself (measured 158-175 TF/s =
80-88 % of the 197 TF/s bf16 peak; the Pallas implicit-GEMM attempt is
Mosaic-rejected, see docs/benchmark_results.md).  A fused norm pass can
recover at most ~37 ms and realistically the reduce pass's extra HBM
read (~1/3 of norm traffic, ~12-25 ms).
"""
from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/candle_video_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

import candle_video_tpu.models.ltx_video.vae as V
from candle_video_tpu.models.ltx_video.vae_init import init_vae_params


def fetch(x):
    leaf = jax.tree.leaves(x)[0]
    idx = tuple(0 for _ in range(leaf.ndim - 1)) + (slice(0, 1),)
    np.asarray(leaf[idx])


def timed_best(fn, iters=5):
    out = fn()
    fetch(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    vcfg = V.LtxVaeConfig()
    params = init_vae_params(jax.random.PRNGKey(0), vcfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(1, 128, 13, 16, 24)) * 0.3, jnp.bfloat16)
    temb = jnp.asarray([0.05], jnp.float32)

    real_rms, real_ln, real_silu = V._rms_norm, V._layer_norm, V.silu

    def id_norm(x, *a, **k):
        return x

    def id_silu(x):
        return x

    variants = {
        "full": (real_rms, real_ln, real_silu),
        "no_silu": (real_rms, real_ln, id_silu),
        "no_norms": (id_norm, id_norm, real_silu),
        "convs_only": (id_norm, id_norm, id_silu),
    }
    results = {}
    for name, (rms, ln, sl) in variants.items():
        V._rms_norm, V._layer_norm, V.silu = rms, ln, sl
        try:
            dec = jax.jit(functools.partial(V.decoder_forward, cfg=vcfg))
            s = timed_best(
                lambda: dec(params["decoder"], z=z, temb=temb))
            results[name] = s * 1000.0
            print(f"{name:12s} {s*1000.0:8.1f} ms", flush=True)
        finally:
            V._rms_norm, V._layer_norm, V.silu = real_rms, real_ln, real_silu

    full = results["full"]
    print(f"\nsilu cost   : {full - results['no_silu']:6.1f} ms")
    print(f"norm cost   : {full - results['no_norms']:6.1f} ms")
    print(f"norm+silu   : {full - results['convs_only']:6.1f} ms")
    print(f"convs+struct: {results['convs_only']:6.1f} ms")


if __name__ == "__main__":
    main()
