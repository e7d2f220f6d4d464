"""W4A16 dequant-strategy A/B at 13B DiT shapes (experiment, not a metric).

The W4 13B denoise measured 1051 ms/step vs W8A16's 959 — the gap is the
per-matmul transient dequant (unpack + s*q+m + bf16 cast over the whole
weight).  Candidates, each timed as an 8-distinct-weight scan inside ONE
jit (per-dispatch tunnel latency makes standalone microbenches
meaningless here — see docs/benchmark_results.md):

  xla_f32  — current default: f32 dequant intermediates -> bf16 matmul
  xla_bf16 — compute_dtype=bf16: halves the dequant HBM traffic, one
             extra bf16 rounding of s*q+m
  pallas   — the fused kernel at DiT M (k-loop dequant in VMEM, re-done
             per M-block revisit)
  w8_xla   — the W8A16 transient path at the same shapes (the 959-ms
             reference point's kernel)

Run: python -m benches.w4_dequant_exp   (prints one line per candidate)
"""

from __future__ import annotations

import sys
import time


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from candle_video_tpu.ops.pallas.int4_weight_matmul import (
        quantize_int4_blockwise, w4_matmul, w4_matmul_xla,
    )
    from candle_video_tpu.ops.pallas.int8_weight_matmul import (
        quantize_int8_blockwise, w8_matmul_xla,
    )

    rng = np.random.default_rng(0)
    M, L = 4992, 8
    shapes = [(4096, 4096), (4096, 16384), (16384, 4096)]  # QKVO / FF up / FF down

    for (K, N) in shapes:
        w = rng.normal(size=(L, K, N)).astype(np.float32) * 0.02
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        p4, s4, m4 = quantize_int4_blockwise(w, scale_dtype="bfloat16")
        q8 = np.empty((L, K, N), np.int8)
        s8 = np.empty((L, K // 32, N), np.float32)
        for i in range(L):
            q8[i], s8[i] = quantize_int8_blockwise(w[i])

        def scan_bench(apply, stack, tag):
            @jax.jit
            def f(x_, st):
                def body(c, wl):
                    return c, apply(x_, wl)

                _, ys = jax.lax.scan(body, 0.0, st)
                return ys.sum()

            y = f(x, stack)
            np.asarray(y)
            best = 1e9
            for _ in range(10):
                t0 = time.perf_counter()
                y = f(x, stack)
                np.asarray(y)
                best = min(best, time.perf_counter() - t0)
            print(f"[w4exp] K={K} N={N} {tag}: {best * 1e3 / L:.3f} ms/matmul",
                  file=sys.stderr, flush=True)
            return best

        t4 = (jnp.asarray(p4), jnp.asarray(s4), jnp.asarray(m4))
        scan_bench(lambda x_, wl: w4_matmul_xla(x_, wl[0], wl[1], wl[2]),
                   t4, "xla_f32 ")
        scan_bench(lambda x_, wl: w4_matmul_xla(
            x_, wl[0], wl[1], wl[2], compute_dtype=jnp.bfloat16),
            t4, "xla_bf16")
        scan_bench(lambda x_, wl: w4_matmul(
            x_, wl[0], wl[1], wl[2], block_m=1024), t4, "pallas  ")
        scan_bench(lambda x_, wl: w8_matmul_xla(x_, wl[0], wl[1]),
                   (jnp.asarray(q8), jnp.asarray(s8)), "w8_xla  ")


if __name__ == "__main__":
    main()
