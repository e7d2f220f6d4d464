"""A/B XLA-level conv3d variants at the two hottest decoder stages
(tail C=128 and up1 C=256) to see what a Pallas implicit-GEMM must beat.

Variants:
  ncdhw     — production path (lax.conv_general_dilated NCDHW, bf16 out)
  ndhwc     — channels-last in/out (NDHWC x DHWIO)
  conv2d_t  — sum of 3 NCHW conv2d taps with T folded into batch
  conv2d_tl — same but channels-last NHWC
  taps      — existing matmul tap decomposition

Run: python scripts/profile_conv_variants.py [variant ...]  (one process per
variant is safest on the 16 GiB chip — padded copies of the tail shape add up)
"""
import sys, time, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from candle_video_tpu.ops.conv3d import causal_conv3d

print("device:", jax.devices()[0])

SHAPES = [
    ("tail 128", 128, 128, 104, 128, 192),
    ("up1 256", 256, 256, 52, 64, 96),
    ("conv_in 128->1024", 128, 1024, 13, 16, 24),
    ("mid 1024", 1024, 1024, 13, 16, 24),
    ("ups0 1024->4096", 1024, 4096, 13, 16, 24),
    ("up0 512", 512, 512, 26, 32, 48),
    ("ups1 512->2048", 512, 2048, 26, 32, 48),
    ("ups2 256->1024", 256, 1024, 52, 64, 96),
    ("conv_out 128->48", 128, 48, 104, 128, 192),
]
if "--hot-only" in sys.argv:
    SHAPES = SHAPES[:2]
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


def v_ncdhw(x, w, b):
    return causal_conv3d(x, w, b, causal=False, impl="xla")


def v_taps(x, w, b):
    return causal_conv3d(x, w, b, causal=False, impl="taps")


def v_ndhwc(x, w, b):
    # x [B,C,T,H,W] -> NDHWC once outside; here assume already NDHWC
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1, 1),
        padding=[(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16,
    )
    return out + b


def v_conv2d_t(x, w, b):
    # x [B,C,T+2,H,W] pre-padded in T; w [O,I,3,3,3]
    bsz, c, tp, h, wd = x.shape
    t = tp - 2
    out = None
    for dt in range(3):
        xs = x[:, :, dt:dt + t]  # [B,C,T,H,W]
        xs = jnp.transpose(xs, (0, 2, 1, 3, 4)).reshape(bsz * t, c, h, wd)
        o = jax.lax.conv_general_dilated(
            xs, w[:, :, dt],
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.bfloat16,
        )
        out = o if out is None else out + o
    out = out + b[None, :, None, None]
    return out.reshape(bsz, t, -1, h, wd).transpose(0, 2, 1, 3, 4)


def v_conv2d_tl(x, w, b):
    # x [B,T+2,H,W,C] channels-last pre-padded in T; w [3,3,3,I,O] DHWIO
    bsz, tp, h, wd, c = x.shape
    t = tp - 2
    out = None
    for dt in range(3):
        xs = x[:, dt:dt + t].reshape(bsz * t, h, wd, c)
        o = jax.lax.conv_general_dilated(
            xs, w[dt],
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        out = o if out is None else out + o
    return (out + b).reshape(bsz, t, h, wd, -1)


WANT = {a for a in sys.argv[1:] if not a.startswith("--")} or {
    "ncdhw", "ndhwc", "conv2d_t", "conv2d_tl"}

for name, ci, co, t, h, w in SHAPES:
    rng = np.random.default_rng(0)
    tf = 2 * 27 * ci * co * t * h * w / 1e12
    print(f"\n=== {name}  ({tf:.2f} TF) ===")

    wgt_np = (rng.normal(size=(co, ci, 3, 3, 3)) * 0.02).astype(np.float32)
    x_np = rng.normal(size=(1, ci, t, h, w)).astype(np.float32)
    bias = jnp.zeros((co,), jnp.bfloat16)

    def prep(vname):
        x = jnp.asarray(x_np, jnp.bfloat16)
        wgt = jnp.asarray(wgt_np, jnp.bfloat16)
        if vname in ("ncdhw", "taps"):
            return x, wgt
        if vname == "ndhwc":
            return (jnp.transpose(x, (0, 2, 3, 4, 1)),
                    jnp.transpose(wgt, (2, 3, 4, 1, 0)))
        if vname == "conv2d_t":
            return jnp.pad(x, [(0, 0), (0, 0), (1, 1), (0, 0), (0, 0)]), wgt
        if vname == "conv2d_tl":
            return (jnp.pad(jnp.transpose(x, (0, 2, 3, 4, 1)),
                            [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)]),
                    jnp.transpose(wgt, (2, 3, 4, 1, 0)))
        raise ValueError(vname)

    fns = {"ncdhw": v_ncdhw, "taps": v_taps, "ndhwc": v_ndhwc,
           "conv2d_t": v_conv2d_t, "conv2d_tl": v_conv2d_tl}
    for vname in ["ncdhw", "taps", "ndhwc", "conv2d_t", "conv2d_tl"]:
        if vname not in WANT:
            continue
        try:
            xv, wv = prep(vname)
            base = timeit(jax.jit(lambda x: x.ravel()[0] * 1.0), xv)
            f = chained(fns[vname])
            raw = timeit(f, xv, wv, bias)
            dt_s = max((raw - base) / (REPS + 1), 1e-6)
            print(f"  {vname:10s} {dt_s*1e3:8.2f} ms  {tf/dt_s:6.1f} TF/s",
                  flush=True)
            del xv, wv
        except Exception as e:  # noqa: BLE001
            print(f"  {vname:10s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
