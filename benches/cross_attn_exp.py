"""A/B the cross-attention path at LTX 2B shapes (S=4992, K=128 text
tokens, 32 heads, D=64, BF16, additive mask bias).

Variants:
  xla_bf16    — production today: unfused einsums, f32 logits/softmax
  packed      — lane-blocked kernel, default 128-lane grouping (2 heads per
                program; measured slower than xla_bf16 in round 2: k/v
                refetched per head-group and tiny per-program dots)
  full_lanes  — packed kernel with ALL heads in one program
                (lane_group_heads=H): k/v resident once per batch, every
                head's scores+softmax+PV fused, scores never touch HBM

Chained reps with a data dependency (the ~30 ms tunnel fetch would swamp
~1 ms calls), one-element sync fetch.  Prints ms/layer and max rel error
vs an f32 oracle.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/candle_video_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

from candle_video_tpu.ops.attention import attention_xla, attention_xla_bf16
from candle_video_tpu.ops.pallas.flash_attention_packed import (
    flash_attention_packed,
)

B, S, K, H, D = 1, 4992, 128, 32, 64
SCALE = 1.0 / D**0.5
REPS = 20


def fetch(x):
    np.asarray(x[(0,) * (x.ndim - 1) + (slice(0, 1),)])


def chained(fn):
    """reps chained through a perturbation of q so XLA can't elide."""

    @jax.jit
    def run(q, k, v, bias):
        def body(i, acc):
            qq = q + (acc[0] * 0).astype(q.dtype)  # data dependency, no-op
            out = fn(qq, k, v, bias)
            return acc + out.astype(jnp.float32)[:, 0, 0, 0]

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((B,), jnp.float32))

    return run


def timeit(run, *args, iters=5):
    out = run(*args)
    fetch(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    rng = np.random.default_rng(0)
    q4 = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k4 = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.bfloat16)
    v4 = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.bfloat16)
    mask = np.ones((B, K), np.float32)
    mask[:, 100:] = 0.0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :], jnp.float32)

    oracle = attention_xla(q4, k4, v4, SCALE, bias=bias).astype(jnp.float32)

    def xla_bf16(q, k, v, b):
        return attention_xla_bf16(q, k, v, SCALE, bias=b)

    def packed(q, k, v, b, lgh=None):
        out = flash_attention_packed(
            q.reshape(B, S, H * D), k.reshape(B, K, H * D),
            v.reshape(B, K, H * D), num_heads=H, scale=SCALE, bias=b,
            lane_group_heads=lgh,
        )
        return out.reshape(B, S, H, D)

    variants = {
        "xla_bf16": xla_bf16,
        "packed": lambda q, k, v, b: packed(q, k, v, b),
        "full_lanes": lambda q, k, v, b: packed(q, k, v, b, lgh=H),
        "full_lanes_bq512": lambda q, k, v, b: flash_attention_packed(
            q.reshape(B, S, H * D), k.reshape(B, K, H * D),
            v.reshape(B, K, H * D), num_heads=H, scale=SCALE, bias=b,
            lane_group_heads=H, block_q=512,
        ).reshape(B, S, H, D),
    }
    for name, fn in variants.items():
        try:
            out = fn(q4, k4, v4, bias).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(out - oracle)) / jnp.max(jnp.abs(oracle)))
            ms = timeit(chained(fn), q4, k4, v4, bias) * 1e3
            print(f"{name:18s} {ms:7.3f} ms/layer   max-rel-err {err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
