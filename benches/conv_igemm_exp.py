"""Experiment: Pallas implicit-GEMM 3x3x3 conv vs XLA conv at LTX decoder
shapes.

The decoder's convs are all stride-1 3x3x3 with channels {128, 256, 512,
1024} (vae.rs:296-465 semantics; our oracle is ops/conv3d.causal_conv3d).
XLA's conv lowering measures 16-32% MFU at these shapes; this experiment
measures tap-decomposed implicit GEMM inside one Pallas kernel, where the
f32 accumulator lives in VMEM (XLA materializes it in HBM) and the input
tile is halo-DMA'd once per (t, h-tile) and reused by all 27 taps.

Variants (all channels-last [T, H, W, C], pre-padded input):
  A  "rank3": 4D VMEM scratch, per-tap rank-3 slice (ht, W, C) and a
     rank-3 x rank-2 dot_general contracting C.
  C  "dwcopy": per-tile, materialize the 3 dw-shifted copies once
     (misaligned read x3), then all 27 taps are sublane-ALIGNED slices
     (W stride padded to a multiple of 8).

Usage: python benches/conv_igemm_exp.py [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Variant A: 4D scratch, rank-3 dots
# ---------------------------------------------------------------------------


def _kernel_rank3(w_ref, x_hbm, out_ref, in_buf, acc, sems, *, kt, kh, kw,
                  ht, W, Wp, n_tiles_h):
    t = pl.program_id(0)
    h = pl.program_id(1)
    step = t * n_tiles_h + h
    n_steps = pl.num_programs(0) * n_tiles_h

    def start_dma(step_idx, slot):
        tt = step_idx // n_tiles_h
        hh = step_idx % n_tiles_h
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tt, kt), pl.ds(hh * ht, ht + kh - 1)],
            in_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(step == 0)
    def _():
        start_dma(0, 0).start()
        start_dma(1, 1).start()

    slot = jax.lax.rem(step, 2)
    start_dma(step, slot).wait()

    first = True
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                xs = in_buf[slot, dt, dh:dh + ht, dw:dw + W, :]
                part = jax.lax.dot_general(
                    xs, w_ref[dt * kh * kw + dh * kw + dw],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if first:
                    acc[:] = part
                    first = False
                else:
                    acc[:] += part

    @pl.when(step + 2 < n_steps)
    def _():
        start_dma(step + 2, slot).start()

    out_ref[:] = acc[:].astype(out_ref.dtype)[None]


def conv_rank3(x_pad, w_taps, *, ht, interpret=False):
    """x_pad [Tp, Hp, Wp, C] (already halo-padded), w [taps, C, N]."""
    kt = 3
    kh = kw = 3
    Tp, Hp, Wp, C = x_pad.shape
    T, H, W = Tp - (kt - 1), Hp - (kh - 1), Wp - (kw - 1)
    taps, _, N = w_taps.shape
    n_tiles_h = H // ht
    assert H % ht == 0, (H, ht)

    kern = functools.partial(
        _kernel_rank3, kt=kt, kh=kh, kw=kw, ht=ht, W=W, Wp=Wp,
        n_tiles_h=n_tiles_h,
    )
    return pl.pallas_call(
        kern,
        grid=(T, n_tiles_h),
        in_specs=[
            pl.BlockSpec((taps, C, N), lambda t, h: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, ht, W, N), lambda t, h: (t, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H, W, N), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kt, ht + kh - 1, Wp, C), x_pad.dtype),
            pltpu.VMEM((ht, W, N), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(w_taps, x_pad)


# ---------------------------------------------------------------------------
# Variant C: flattened rows, dw pre-shift copies, aligned 2D dots
# ---------------------------------------------------------------------------


def _kernel_dwcopy(w_ref, x_hbm, out_ref, in_buf, shifted, acc, sems, *,
                   kt, kh, kw, ht, W, Wps, n_tiles_h):
    t = pl.program_id(0)
    h = pl.program_id(1)
    step = t * n_tiles_h + h
    n_steps = pl.num_programs(0) * n_tiles_h
    rows_in = ht + kh - 1

    def start_dma(step_idx, slot):
        tt = step_idx // n_tiles_h
        hh = step_idx % n_tiles_h
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tt, kt), pl.ds(hh * ht * Wps, rows_in * Wps)],
            in_buf.at[slot, :, pl.ds(0, rows_in * Wps)],
            sems.at[slot],
        )

    @pl.when(step == 0)
    def _():
        start_dma(0, 0).start()
        start_dma(1, 1).start()

    slot = jax.lax.rem(step, 2)
    start_dma(step, slot).wait()

    # materialize the kw shifted copies once (the only misaligned reads).
    # The slice end overruns the DMA'd rows by up to kw-1 elements; those
    # only ever feed output positions in the W-alignment pad columns.
    for dw in range(kw):
        shifted[dw] = in_buf[slot][:, dw:dw + rows_in * Wps, :]

    first = True
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                xs = shifted[dw, dt, dh * Wps:dh * Wps + ht * Wps, :]
                part = jax.lax.dot_general(
                    xs, w_ref[dt * kh * kw + dh * kw + dw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if first:
                    acc[:] = part
                    first = False
                else:
                    acc[:] += part

    @pl.when(step + 2 < n_steps)
    def _():
        start_dma(step + 2, slot).start()

    out_ref[:] = acc[:].astype(out_ref.dtype)[None]


def conv_dwcopy(x_pad, w_taps, *, ht, interpret=False):
    """x_pad [Tp, Hp, Wp, C] with Wp a multiple of 8 (extra right pad);
    w [taps, C, N].  Output rows keep the Wps stride (garbage in the pad
    columns); caller slices [:, :, :W]."""
    kt = 3
    kh = kw = 3
    Tp, Hp, Wps, C = x_pad.shape
    T, H = Tp - (kt - 1), Hp - (kh - 1)
    W = Wps - (kw - 1)  # logical W + right alignment pad, sliced by caller
    taps, _, N = w_taps.shape
    n_tiles_h = H // ht
    assert H % ht == 0 and Wps % 8 == 0, (H, ht, Wps)

    x_flat = x_pad.reshape(Tp, Hp * Wps, C)
    rows_in = ht + kh - 1

    kern = functools.partial(
        _kernel_dwcopy, kt=kt, kh=kh, kw=kw, ht=ht, W=W, Wps=Wps,
        n_tiles_h=n_tiles_h,
    )
    out = pl.pallas_call(
        kern,
        grid=(T, n_tiles_h),
        in_specs=[
            pl.BlockSpec((taps, C, N), lambda t, h: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, ht * Wps, N), lambda t, h: (t, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H * Wps, N), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kt, rows_in * Wps + 8, C), x_pad.dtype),
            pltpu.VMEM((kw, kt, rows_in * Wps, C), x_pad.dtype),
            pltpu.VMEM((ht * Wps, N), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(w_taps, x_flat)
    return out.reshape(T, H, Wps, N)[:, :, :W]


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def xla_conv_ndhwc(x_pad, w):
    """w [kt, kh, kw, C, N]; x_pad already padded -> VALID conv."""
    return jax.lax.conv_general_dilated(
        x_pad[None], w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16,
    )[0]


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    idx = tuple(0 for _ in range(leaf.ndim - 1)) + (slice(0, 1),)
    np.asarray(leaf[idx])


def bench(fn, *args, n=5):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best, out


def calib():
    a = jnp.ones((2048, 2048), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a @ a @ a)
    t, _ = bench(f, a, n=3)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--shapes", default="all")
    args = ap.parse_args()

    shapes = [
        # (label, T, H, W, C, N, ht)
        ("last128", 97, 128, 192, 128, 128, 16),
        ("up1_256", 49, 64, 96, 256, 256, 16),
        ("up0_512", 25, 32, 48, 512, 512, 16),
        ("ups2_256to1024", 49, 64, 96, 256, 1024, 8),
    ]
    if args.shapes != "all":
        keep = args.shapes.split(",")
        shapes = [s for s in shapes if s[0] in keep]
    if args.interpret:
        shapes = [("tiny", 4, 16, 24, 128, 128, 8)]

    rng = np.random.default_rng(0)
    for label, T, H, W, C, N, ht in shapes:
        x = jnp.asarray(rng.normal(size=(T, H, W, C)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, N)) * 0.05, jnp.bfloat16)
        w_taps = w.reshape(27, C, N)

        # pre-pad: replicate T (causal=False → 1 each side), zero spatial
        xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")
        xp = xp.at[:, :, 0].set(0).at[:, :, -1].set(0)
        xp = xp.at[:, 0].set(0).at[:, -1].set(0)
        flops = 2 * T * H * W * C * N * 27

        t_ref, ref = bench(jax.jit(xla_conv_ndhwc), xp, w)
        print(f"[{label}] XLA NDHWC: {t_ref*1e3:8.2f} ms  "
              f"{flops/t_ref/1e12:6.1f} TF/s  calib={calib()*1e3:.1f}ms",
              flush=True)

        for name, fn in [
            ("rank3", functools.partial(conv_rank3, ht=ht,
                                        interpret=args.interpret)),
            ("dwcopy", None),
        ]:
            if name == "dwcopy":
                Wps = _ceil_to(W + 2, 8)
                xp2 = jnp.pad(
                    x, ((1, 1), (1, 1), (1, Wps - W - 1), (0, 0)), mode="edge"
                )
                xp2 = xp2.at[:, :, 0].set(0)
                xp2 = jnp.where(
                    (jnp.arange(Wps) >= W + 1)[None, None, :, None], 0, xp2
                )
                xp2 = xp2.at[:, 0].set(0).at[:, -1].set(0)
                fn = functools.partial(conv_dwcopy, ht=ht,
                                       interpret=args.interpret)
                arg = xp2
            else:
                arg = xp
            try:
                tt, out = bench(jax.jit(functools.partial(fn)), arg, w_taps)
            except Exception as e:  # noqa: BLE001
                print(f"[{label}] {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            out = out[:, :, :W]  # dwcopy keeps alignment-pad columns
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            print(f"[{label}] {name}:    {tt*1e3:8.2f} ms  "
                  f"{flops/tt/1e12:6.1f} TF/s  maxrel={rel:.2e}  "
                  f"speedup={t_ref/tt:.2f}x  calib={calib()*1e3:.1f}ms",
                  flush=True)


if __name__ == "__main__":
    main()
