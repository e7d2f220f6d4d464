"""Per-stage decode profile: time each decoder conv shape (XLA) on the real
device and compare against the bf16 roofline, to locate where the 0.63 s
untiled decode goes.  Run: python scripts/profile_decode.py
"""
import sys, time, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from candle_video_tpu.ops.conv3d import causal_conv3d

DEV = jax.devices()[0]
print("device:", DEV, DEV.platform)

B = 1
# (name, Cin, Cout, T, H, W, stride, count) — decoder at 512x768x97f
# z [1,128,13,16,24]; up0 @512 26x32x48; up1 @256 52x64x96; tail @128 104x128x192
SHAPES = [
    ("conv_in 128->1024", 128, 1024, 13, 16, 24, (1, 1, 1), 1),
    ("mid 1024", 1024, 1024, 13, 16, 24, (1, 1, 1), 2 * 5),
    ("ups0 1024->4096(d2s)", 1024, 4096, 13, 16, 24, (1, 1, 1), 1),
    ("up0 512", 512, 512, 26, 32, 48, (1, 1, 1), 2 * 5),
    ("ups1 512->2048(d2s)", 512, 2048, 26, 32, 48, (1, 1, 1), 1),
    ("up1 256", 256, 256, 52, 64, 96, (1, 1, 1), 2 * 5),
    ("ups2 256->1024(d2s)", 256, 1024, 52, 64, 96, (1, 1, 1), 1),
    ("tail 128", 128, 128, 104, 128, 192, (1, 1, 1), 2 * 5),
    ("conv_out 128->48", 128, 48, 104, 128, 192, (1, 1, 1), 1),
]


def fetch(out):
    # axon: block_until_ready may return early; force a host fetch of one
    # element to synchronize (same methodology as bench.py).
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(0 for _ in leaf.shape)
    np.asarray(leaf[idx])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fetch(out)
    return (time.perf_counter() - t0) / iters


REPS = 10


def chained(conv_fn, reps=REPS):
    """Apply conv_fn `reps` times with a data dependency so XLA can't
    hoist or elide; amortizes the ~30 ms tunnel fetch overhead."""

    def run(x, w, b):
        def body(i, carry):
            out = conv_fn(carry, w, b)
            # scalar feedback keeps each iteration's input distinct
            return carry + (out[0, 0, 0, 0, 0] * 0).astype(carry.dtype)

        x = jax.lax.fori_loop(0, reps, body, x)
        return conv_fn(x, w, b)

    return jax.jit(run)


total = 0.0
total_tf = 0.0
for name, ci, co, t, h, w, st, count in SHAPES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, ci, t, h, w)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(size=(co, ci, 3, 3, 3)) * 0.02, jnp.bfloat16)
    bias = jnp.zeros((co,), jnp.bfloat16)
    f = chained(lambda x, w, b: causal_conv3d(x, w, b, causal=False))
    raw = timeit(f, x, wgt, bias, iters=3)
    base = timeit(jax.jit(lambda x: x[0, 0, 0, 0, 0] * 1.0), x, iters=3)
    dt = max((raw - base) / (REPS + 1), 1e-6)
    tf = 2 * 27 * ci * co * t * h * w / 1e12
    gb = (ci + co) * t * h * w * 2 / 1e9
    eff = tf / dt
    print(f"{name:26s} {dt*1e3:8.2f} ms x{count:2d} = {dt*count*1e3:7.1f} ms"
          f"  {tf:5.2f} TF @ {eff:6.1f} TF/s  io {gb/dt:6.0f} GB/s")
    total += dt * count
    total_tf += tf * count

print(f"\nconv total: {total*1e3:.1f} ms, {total_tf:.1f} TF,"
      f" avg {total_tf/total:.1f} TF/s")

# elementwise cost probe at the tail shape: rms-norm-ish + silu pass
x = jnp.zeros((B, 128, 104, 128, 192), jnp.bfloat16)


@jax.jit
def ew(x):
    v = jnp.mean((x.astype(jnp.float32)) ** 2, axis=1, keepdims=True)
    return (x * jax.lax.rsqrt(v + 1e-8).astype(x.dtype)) * jax.nn.sigmoid(x)


dt = timeit(ew, x)
gb = x.nbytes * 2 / 1e9
print(f"tail elementwise pass: {dt*1e3:.2f} ms  ({gb/dt:.0f} GB/s)")
