"""Implicit-GEMM 3x3x3 conv (Pallas) — EXPERIMENTAL, not the production path.

STATUS: bit-exact vs the XLA conv in interpret mode (f32), but the Mosaic
remote compiler currently rejects it (opaque tpu_compile_helper HTTP 500 —
suspects: the 5D VMEM scratch or the multi-dim `.at[]` DMA slices).  The
production decoder instead uses ``causal_conv3d_cl`` (kt NHWC conv2d taps),
which measured 158-175 TF/s at the decoder's hot stages — 80-88 % of v5e
peak, leaving this kernel's remaining headroom small.  Kept as the starting
point if the last ~15 % ever matters.

The decoder's cost was ten C=128 "tail" convs at [104,128,192] plus ten
C=256 "up1" convs (profile: scripts/profile_decode.py — 250 ms + 97 ms of
the 628 ms untiled decode, at 90.5 / 117 TF/s under XLA's NCDHW conv
lowering).  The reference runs these as kt Conv2d slices on cuDNN
(vae.rs:296-465); here the conv is restated as 27 chained MXU matmuls over
a halo-tiled input:

- input lives channels-last [T, H, W, C] in HBM, pre-padded (replicate/causal
  in time, zeros in space) by the wrapper;
- the grid walks (T/BT, H/BH) output tiles; each program DMAs THREE
  w-shifted halo tiles [BT+2, BH+2, W, C] (shift dw in {0,1,2}) so that every
  tap's lhs is a *layout-preserving* collapse (BH, W, C) -> (BH*W, C) — no
  sublane re-layouts, no shifted VPU adds;
- for each of the BT output t-planes, the 27 taps accumulate into one f32
  accumulator via chained `acc += lhs @ w[tap]` — pure MXU accumulation
  (a shifted-output formulation was rejected: 27 sliced f32 adds of the
  [BH,W,O] accumulator are VPU-bound at C=128);
- bias is fused; output is written back bf16 (or the input dtype).

3x HBM read amplification for the dw shifts (plus the (BT+2)(BH+2)/(BT*BH)
halo factor) is the price of keeping every matmul operand layout-clean; at
the tail shape that is ~3.7 GB/conv ≈ 5 ms against an 11.5 ms compute floor.

Requirements: stride 1, kernel 3x3x3, W and C multiples of the sublane/lane
tiles (decoder stages: W in {48, 96, 192}, C in {128, 256} — all conform).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, sems, *, bt: int, bh: int,
            w_out: int):
    it = pl.program_id(0)
    ih = pl.program_id(1)
    t0 = it * bt
    h0 = ih * bh

    copies = [
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(t0, bt + 2), pl.ds(h0, bh + 2),
                     pl.ds(dw, w_out), :],
            xbuf.at[dw],
            sems.at[dw],
        )
        for dw in range(3)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    o_dtype = o_ref.dtype
    bias = b_ref[0].astype(jnp.float32)  # [O]
    c_in = xbuf.shape[-1]
    for i in range(bt):
        acc = None
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    lhs = xbuf[dw, i + dt, dh:dh + bh, :, :].reshape(
                        bh * w_out, c_in
                    )
                    part = jax.lax.dot(
                        lhs,
                        w_ref[(dt * 3 + dh) * 3 + dw],
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
        acc = acc + bias[None, :]
        o_ref[i] = acc.reshape(bh, w_out, -1).astype(o_dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_t", "block_h", "interpret", "out_dtype"),
)
def conv3d_igemm_cl(
    x,  # [T, H, W, C] channels-last, unpadded
    weight,  # [O, C, 3, 3, 3] (torch layout) or [27, C, O]
    bias=None,  # [O]
    causal: bool = True,
    block_t: int = 2,
    block_h: int = 8,
    interpret: bool | None = None,
    out_dtype=None,
):
    """3x3x3 stride-1 conv, replicate temporal padding (causal: 2 left;
    else 1/1), zero spatial padding 1/1.  Returns [T, H, W, O].

    Matches ops.conv3d.causal_conv3d semantics (vae.rs:374-413 edge
    handling) for the kt=kh=kw=3, stride-1 case the decoder uses.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    t, h, w_dim, c = x.shape
    if weight.ndim == 5:
        o = weight.shape[0]
        w27 = jnp.transpose(weight, (2, 3, 4, 1, 0)).reshape(27, c, o)
    else:
        o = weight.shape[2]
        w27 = weight
    compute_dtype = x.dtype
    w27 = w27.astype(compute_dtype)
    out_dtype = out_dtype or compute_dtype
    if bias is None:
        bias = jnp.zeros((o,), jnp.float32)
    b2 = bias.astype(jnp.float32).reshape(1, o)

    nt = -(-t // block_t)
    nh = -(-h // block_h)
    # halo pad: time replicate (causal = both halo frames replicate the
    # first frame), space zeros; then pad T/H up to block multiples.
    xp = jnp.pad(
        x,
        [(2, 0) if causal else (1, 1), (0, 0), (0, 0), (0, 0)],
        mode="edge",
    )
    xp = jnp.pad(
        xp,
        [(0, nt * block_t - t), (1, 1 + nh * block_h - h), (1, 1), (0, 0)],
    )

    lane = 128
    sub = 16 if compute_dtype == jnp.bfloat16 else 8
    assert w_dim % sub == 0 and c % lane == 0 and o % lane == 0, (
        f"conv3d_igemm_cl needs W%{sub}==0, C/O%128==0; got W={w_dim} C={c} O={o}"
    )

    out = pl.pallas_call(
        functools.partial(_kernel, bt=block_t, bh=block_h, w_out=w_dim),
        grid=(nt, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((27, c, o), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, o), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block_t, block_h, w_dim, o), lambda i, j: (i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((nt * block_t, nh * block_h, w_dim, o),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((3, block_t + 2, block_h + 2, w_dim, c), compute_dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w27, b2)
    return out[:t, :h]
