"""A/B: what is the fastest 13B-on-one-chip matmul given int8-in-HBM weights?

Decides the W8A16 execution strategy for the 13B DiT (and whether W8A8
activation quantization on top could cut the step time further).

CAVEAT (measured 2026-08): this standalone harness re-uses ONE resident
weight every scan iteration, which flatters whichever path streams fewer
HBM bytes per call and produces impossible-looking rates (bf16 "267 TF/s"
at the FF shapes).  The real model streams 48 DISTINCT layer weights per
forward — a streaming-limited regime where the fused-vs-transient choice
is second-order: in-model A/B is 976 (all-fused) vs 963 ms/step (auto).
Use benches/profile_13b.py (distinct per-layer weights, real _block) for
decisions; keep this harness only for kernel-level relative checks.

Variants per shape (scan-amortized; operands are jit ARGUMENTS, not closure
constants, so the axon remote-compile request stays small; a carried scalar
serializes iterations so XLA cannot hoist or elide the matmul):
  bf16        — dense jnp.dot bf16 (the 2+-chip path; speed ceiling)
  w8a16_t5    — w8_matmul, T5 config (block_m=256, qblock=32)
  w8a16_dit   — w8_matmul, shipped DiT config (block_m=1024, qblock=128)
  w8a16_xla   — transient dequant: int8 [K,N] -> bf16 temp in HBM -> jnp.dot.
                The reference's own dequantize-per-forward semantics
                (quantized_t5_encoder.rs:60-71): weights stay int8 in HBM,
                only a per-matmul bf16 temp exists.
  w8a8        — ops/pallas/int8_matmul.w8a8_matmul INCLUDING per-row
                activation quantization (the real end-to-end cost)
  int8_xla    — raw jnp.dot(int8, int8, preferred int32) through XLA
                (MXU int8 ceiling; ignores quant/dequant cost)

Usage: python benches/int8_mxu_exp.py [--n 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/candle_video_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

from candle_video_tpu.ops.pallas.int8_matmul import (
    quantize_activations,
    w8a8_matmul,
)
from candle_video_tpu.ops.pallas.int8_weight_matmul import (
    quantize_int8_blockwise,
    w8_matmul,
)

SHAPES = [
    (4992, 4096, 4096),    # 13B qkv/o projection
    (4992, 4096, 16384),   # 13B FF up
    (4992, 16384, 4096),   # 13B FF down
]


def fetch(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def scan_time(make_step, operands, n: int):
    """make_step(acc, *operands) -> [M, N] output.  Returns ms per iteration.

    ``operands`` are passed as jit arguments (device arrays never enter the
    traced HLO as constants).  The carry scalar derived from each output is
    folded back into the next input, so iterations are serialized.
    """

    @jax.jit
    def run(*ops):
        def body(acc, _):
            out = make_step(acc, *ops)
            return out.ravel()[0].astype(jnp.float32) * jnp.float32(1e-30), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    fetch(run(*operands))  # compile + warm
    t0 = time.time()
    fetch(run(*operands))
    return (time.time() - t0) / n * 1000.0


def dequant_g(wq, s, qblock):
    k, n = wq.shape
    wf = wq.astype(jnp.float32).reshape(k // qblock, qblock, n)
    return (wf * s[:, None, :]).reshape(k, n).astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for (m, k, n) in SHAPES:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = rng.standard_normal((k, n)).astype(np.float32)
        wb = jnp.asarray(w, jnp.bfloat16)
        wq32_np, s32_np = quantize_int8_blockwise(w, 32)
        wq32, s32 = jnp.asarray(wq32_np), jnp.asarray(s32_np)
        wq128_np, s128_np = quantize_int8_blockwise(w, 128)
        wq128, s128 = jnp.asarray(wq128_np), jnp.asarray(s128_np)
        # per-column scale for the w8a8 kernel (coarser than W8A16's groups)
        sw_col = jnp.asarray(
            np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0, jnp.float32
        )
        wq_col = jnp.asarray(
            np.clip(np.round(w / np.asarray(sw_col)[None, :]), -127, 127),
            np.int8,
        )
        xq0, sx0 = quantize_activations(x)

        flops = 2.0 * m * k * n

        def tf(ms):
            return flops / (ms * 1e-3) / 1e12

        res = {}
        res["bf16"] = scan_time(
            lambda a, x, wb: jnp.dot(x + a.astype(jnp.bfloat16), wb),
            (x, wb), args.n)
        res["w8a16_t5"] = scan_time(
            lambda a, x, wq, s: w8_matmul(
                x + a.astype(jnp.bfloat16), wq, s, qblock=32),
            (x, wq32, s32), args.n)
        res["w8a16_dit"] = scan_time(
            lambda a, x, wq, s: w8_matmul(
                x + a.astype(jnp.bfloat16), wq, s, qblock=128, block_m=1024),
            (x, wq128, s128), args.n)
        res["w8a16_xla"] = scan_time(
            lambda a, x, wq, s: jnp.dot(
                x + a.astype(jnp.bfloat16), dequant_g(wq, s, 128)),
            (x, wq128, s128), args.n)

        def w8a8_full(a, x, wq, sw):
            xq, sx = quantize_activations(x + a.astype(jnp.bfloat16))
            return w8a8_matmul(xq, sx, wq, sw)

        res["w8a8"] = scan_time(w8a8_full, (x, wq_col, sw_col), args.n)
        res["int8_xla"] = scan_time(
            lambda a, xq, wq: jnp.dot(
                jnp.clip(xq + (a.astype(jnp.int32) % 2).astype(jnp.int8),
                         -127, 127),
                wq, preferred_element_type=jnp.int32),
            (xq0, wq_col), args.n)

        print(f"[{m}x{k}x{n}]")
        for name, ms in res.items():
            print(f"  {name:10s} {ms:7.2f} ms  {tf(ms):6.1f} TF/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
