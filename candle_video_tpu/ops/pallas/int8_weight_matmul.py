"""Weight-only int8 matmul with dequant fused into the k-loop (W8A16).

The reference keeps the GGUF T5-XXL weights quantized in VRAM and
dequantizes per matmul (quantized_t5_encoder.rs:60-71) — its whole point is
the ~8 GB memory saving (reference README.md:95).  The round-1 "dequant once
to BF16" load path costs ~9.5 GB HBM for T5-XXL; this kernel restores the
reference's memory semantics TPU-natively:

- weights live in HBM as int8 with per-(32, out-channel) f32 scales
  (group-of-32 along K = the GGUF Q8_0 block layout, so Q8_0 checkpoints are
  carried bit-exactly: int8 payload + f16 scale, no requantization),
- each k-tile is dequantized in VMEM (int8 -> f32 * scale -> bf16) and fed
  straight to the MXU; only the bf16 output is written back,
- activations stay bf16 (weight-only quantization — unlike the W8A8 kernel
  in int8_matmul.py, no activation quantization error).

T5 prompt encode is HBM-bandwidth-bound (M=128 tokens vs K,N up to 10240):
halving the weight bytes roughly halves encode latency too.

Execution-strategy note: the fused kernel is the right call in that
bandwidth-bound small-M regime.  At DiT token counts (M≈5k) the matmul is
MXU-bound and the in-VMEM dequant — re-done for every M-block revisit of a
weight tile — is pure overhead; ``w8_matmul_xla`` dequantizes the int8
weight into a TRANSIENT bf16 HBM buffer instead (XLA reuses one allocation
across the layer scan; weights stay int8 at rest — the reference's own
dequantize-per-forward semantics, quantized_t5_encoder.rs:60-71) and runs
a stock bf16 matmul.  ``w8_matmul_auto`` dispatches on M.

Measured honestly, IN-MODEL (the only number that holds up): the full 13B
denoise step is 976 ms/step all-fused vs 963 ms/step with the auto
dispatch (benches/bench_13b.py) — a ~1.3% win.  Standalone microbenches
(benches/int8_mxu_exp.py) overstate the gap enormously (fused 6.98/7.76 ms
vs xla 3.64/3.28 ms at the FF shapes): with ONE resident weight re-used
every scan iteration they flatter whichever path streams fewer HBM bytes
per call, while the real model streams 48 DISTINCT layer weights — a
regime where this device is streaming-limited and the dequant choice is
second-order (benches/profile_13b.py decomposes the real step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 32  # GGUF Q8_0 group size along K


def _kernel(x_ref, wq_ref, sw_ref, o_ref, acc_scr, *, nk: int, qblock: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    bk, bn = wq_ref.shape
    # dequant in VMEM: [bk, bn] int8 * per-(qblock, n) scale -> bf16 MXU input
    s = sw_ref[...]  # [bk // qblock, bn] f32
    wf = wq_ref[...].astype(jnp.float32).reshape(bk // qblock, qblock, bn)
    wf = (wf * s[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
    acc_scr[...] += jax.lax.dot(
        x_ref[...], wf, preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret",
                     "qblock"),
)
def w8_matmul(
    x,  # [M, K] bf16/f32 activations
    w_q,  # [K, N] int8
    s_w,  # [K // qblock, N] f32 per-(group, column) scales
    bias=None,  # [N] (any float dtype)
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    qblock: int = QBLOCK,  # K-group size: 32 (Q8_0/Q4_K/Q5_K) or 16 (Q6_K)
):
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    m, k = x.shape
    n = w_q.shape[1]
    assert k % qblock == 0 and s_w.shape == (k // qblock, n), (
        f"scales {s_w.shape} must be [{k}//{qblock}, {n}]"
    )
    block_m = min(block_m, _round_up(m, 32))
    block_n = min(block_n, _round_up(n, 128))
    block_k = min(block_k, _round_up(k, 128))
    block_k = _round_up(block_k, qblock)

    mp, kp, np_ = _round_up(m, block_m), _round_up(k, block_k), _round_up(n, block_n)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, mp - m), (0, kp - k)))
    wq = jnp.pad(w_q, ((0, kp - k), (0, np_ - n)))
    sw = jnp.pad(s_w, ((0, (kp - k) // qblock), (0, np_ - n)))

    grid = (mp // block_m, np_ // block_n, kp // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=grid[2], qblock=qblock),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec(
                (block_k // qblock, block_n), lambda i, j, kk: (kk, j)
            ),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, wq, sw)

    out = out[:m, :n]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def w8_matmul_xla(
    x,  # [M, K] bf16/f32 activations
    w_q,  # [K, N] int8
    s_w,  # [K // qblock, N] f32 per-(group, column) scales
    bias=None,  # [N]
    out_dtype=jnp.bfloat16,
    qblock: int = QBLOCK,
):
    """Transient-dequant W8A16: int8 HBM weight -> bf16 temp -> bf16 matmul.

    Same dequant math as the fused kernel (int8 -> f32 * scale -> bf16 MXU
    input, f32 accumulation), but done once per matmul through XLA instead
    of once per (M-block, k-tile) in VMEM.  The bf16 weight exists only as a
    per-matmul temporary; the resident copy stays int8.  Use for MXU-bound
    shapes (large M); see module docstring.
    """
    k, n = w_q.shape
    assert k % qblock == 0 and s_w.shape == (k // qblock, n), (
        f"scales {s_w.shape} must be [{k}//{qblock}, {n}]"
    )
    wf = w_q.astype(jnp.float32).reshape(k // qblock, qblock, n)
    wf = (wf * s_w[:, None, :].astype(jnp.float32)).reshape(k, n)
    out = jnp.dot(
        x.astype(jnp.bfloat16), wf.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# Below this token count the matmul is HBM-bandwidth-bound and the fused
# kernel's int8-only weight traffic wins; above it the MXU-bound transient-
# dequant path runs at full bf16 speed (benches/int8_mxu_exp.py).
W8_XLA_MIN_M = 1024


def w8_matmul_auto(x, w_q, s_w, bias=None, out_dtype=jnp.bfloat16,
                   qblock: int = QBLOCK, **pallas_kwargs):
    """Dispatch W8A16 by regime: fused Pallas kernel for small M (weight-
    bandwidth-bound, e.g. T5's 128-token encode), transient XLA dequant for
    large M (MXU-bound, e.g. DiT's ~5k video tokens)."""
    if x.shape[0] >= W8_XLA_MIN_M:
        return w8_matmul_xla(
            x, w_q, s_w, bias=bias, out_dtype=out_dtype, qblock=qblock
        )
    return w8_matmul(
        x, w_q, s_w, bias=bias, out_dtype=out_dtype, qblock=qblock,
        **pallas_kwargs,
    )


def quantize_int8_blockwise(w, qblock: int = QBLOCK):
    """[.., K, N] float -> (w_q int8 [.., K, N], s f32 [.., K//qblock, N])
    symmetric per-(group-of-qblock-along-K, column) quantization.  Leading
    dims carry stacked layers (the DiT W8A16 path quantizes [L, K, N]
    stacks per layer through this same function)."""
    import numpy as np

    w = np.asarray(w, np.float32)
    k, n = w.shape[-2], w.shape[-1]
    assert k % qblock == 0
    g = w.reshape(*w.shape[:-2], k // qblock, qblock, n)
    s = np.maximum(np.abs(g).max(axis=-2), 1e-12) / 127.0  # [.., K//qb, N]
    q = np.clip(np.round(g / s[..., None, :]), -127, 127).astype(np.int8)
    return q.reshape(w.shape), s.astype(np.float32)


def dequantize_int8_blockwise(w_q, s, qblock: int = QBLOCK):
    """Reference (unfused) dequant for testing: -> f32 [K, N]."""
    import numpy as np

    k, n = w_q.shape
    g = np.asarray(w_q, np.float32).reshape(k // qblock, qblock, n)
    return (g * np.asarray(s, np.float32)[:, None, :]).reshape(k, n)
