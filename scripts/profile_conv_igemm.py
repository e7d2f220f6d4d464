"""Benchmark the Pallas implicit-GEMM conv vs the XLA conv at the decoder's
hot stages.  Run: python scripts/profile_conv_igemm.py [bt bh]
"""
import sys, time, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from candle_video_tpu.ops.conv3d import causal_conv3d
from candle_video_tpu.ops.pallas.conv3d_igemm import conv3d_igemm_cl

print("device:", jax.devices()[0])
ARGS = [int(a) for a in sys.argv[1:]]

SHAPES = [
    ("tail 128", 128, 128, 104, 128, 192, 2, 8),
    ("up1 256", 256, 256, 52, 64, 96, 2, 8),
    ("conv_out 128->48", 128, 48, 104, 128, 192, 2, 8),
]
REPS = 10


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(0 for _ in leaf.shape)
    np.asarray(leaf[idx])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fetch(out)
    return (time.perf_counter() - t0) / iters


def chained(conv_fn, reps=REPS):
    def run(x, w, b):
        def body(i, carry):
            out = conv_fn(carry, w, b)
            return carry + (out.ravel()[0] * 0).astype(carry.dtype)

        x = jax.lax.fori_loop(0, reps, body, x)
        return conv_fn(x, w, b)

    return jax.jit(run)


for name, ci, co, t, h, w, bt, bh in SHAPES:
    if ARGS:
        bt, bh = ARGS
    rng = np.random.default_rng(0)
    tf = 2 * 27 * ci * co * t * h * w / 1e12
    print(f"\n=== {name}  ({tf:.2f} TF)  bt={bt} bh={bh} ===", flush=True)
    x = jnp.asarray(rng.normal(size=(t, h, w, ci)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(size=(co, ci, 3, 3, 3)) * 0.02, jnp.bfloat16)
    bias = jnp.zeros((co,), jnp.bfloat16)
    base = timeit(jax.jit(lambda x: x.ravel()[0] * 1.0), x)

    co_pad = (co + 127) // 128 * 128
    wp = jnp.pad(wgt, [(0, co_pad - co), (0, 0), (0, 0), (0, 0), (0, 0)])
    bp = jnp.pad(bias, [(0, co_pad - co)])
    w27 = jnp.transpose(wp, (2, 3, 4, 1, 0)).reshape(27, ci, co_pad)

    def ig(x, w, b, bt=bt, bh=bh):
        return conv3d_igemm_cl(x, w, b, causal=True, block_t=bt, block_h=bh)

    try:
        f = chained(ig)
        raw = timeit(f, x, w27, bp)
        dt_s = max((raw - base) / (REPS + 1), 1e-6)
        print(f"  igemm    {dt_s*1e3:8.2f} ms  {tf/dt_s:6.1f} TF/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  igemm FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    # parity spot-check vs XLA at this shape (bf16)
    try:
        got = np.asarray(ig(x, w27, bp)[..., :co], np.float32)
        xo = jnp.transpose(x, (3, 0, 1, 2))[None]
        ref = causal_conv3d(xo, wgt, bias, causal=True, impl="xla")
        ref = np.asarray(ref, np.float32)[0].transpose(1, 2, 3, 0)
        d = np.abs(ref - got)
        print(f"  parity max-abs {d.max():.4f}  ref-scale {np.abs(ref).max():.2f}",
              flush=True)
        del got, ref, d
    except Exception as e:  # noqa: BLE001
        print(f"  parity FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    del x
