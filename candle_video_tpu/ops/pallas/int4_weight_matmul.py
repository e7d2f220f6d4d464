"""Weight-only int4 matmul with dequant fused into the k-loop (W4A16).

Extends the W8A16 path (int8_weight_matmul.py) to 4-bit weights for the
capacity regime the reference serves with GGUF Q4_K quantization
(/root/reference/src/models/ltx_video/quantized_t5_encoder.rs:60-71 —
weights stay quantized in VRAM, dequantized per matmul).  TPU-natively:

- weights live in HBM as PACKED nibbles (two 4-bit codes per int8 byte)
  with per-(qblock-along-K, out-channel) affine scale+min pairs:
  ``w ≈ s * q + m`` with ``q ∈ [0, 15]`` — exactly GGUF Q4_K's dequant
  form (ggml's ``d * q - dmin * m``), so Q4_K checkpoints can be carried
  bit-exactly by folding the superblock scales into per-group f32 (s, m),
- each k-tile is dequantized in VMEM (nibble -> f32 * s + m -> bf16) and
  fed straight to the MXU; activations stay bf16 (no activation error),
- the 13B DiT at 4 bits + bf16 scale/min (group-32) is ~5 bpw ≈ 8.1 GiB —
  small enough that the 5.1 GiB int8 T5-XXL stays RESIDENT next to it on
  one 16 GiB chip (the W8A16 13B at 12.7 GiB forces staged encode).

Packing layout (K-half planar — chosen so the kernel needs NO sublane
interleave): byte ``j`` of a column packs logical row ``j`` in its LOW
nibble and logical row ``K/2 + j`` in its HIGH nibble.  Dequantizing a
k-tile is then two contiguous half-depth tiles (lo -> rows of the first
K/2, hi -> rows of the second K/2), each a plain (x-slice @ w-half) MXU
pass — the pair-interleave layout would instead need an in-kernel
[bk/2, 2, bn] -> [bk, bn] sublane shuffle.  Requires K % (2*qblock) == 0
(every model dim here is a multiple of 64).

Execution strategy mirrors the int8 path (see its module docstring): at
DiT token counts (M ≈ 5k) the matmul is MXU-bound and ``w4_matmul_xla``
dequantizes into a transient bf16 buffer once per matmul; at small M
(T5's 128-token encode — HBM-bandwidth-bound) the fused kernel streams
4-bit weight bytes only, halving the weight traffic of the int8 kernel.
``w4_matmul_auto`` dispatches on M.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK4 = 32  # GGUF Q4_K sub-block size along K


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Quantize / dequantize (host-side reference + producers)
# ---------------------------------------------------------------------------


def pack_nibbles(q):
    """[.., K, N] int codes in [0, 15] -> packed uint8 [.., K//2, N]
    (K-half planar: byte j = row j | row K/2+j << 4 — module docstring).
    The carry path for pre-quantized payloads (GGUF Q4_K's q fields fold
    in BIT-EXACTLY with their per-group affine (s, m))."""
    q = np.asarray(q)
    k = q.shape[-2]
    assert k % 2 == 0, f"K={k} must be even to pack nibbles"
    assert q.min() >= 0 and q.max() <= 15, "nibble codes must be in [0, 15]"
    qu = q.astype(np.uint8)
    return (qu[..., : k // 2, :] | (qu[..., k // 2 :, :] << 4)).astype(np.uint8)


def quantize_int4_blockwise(w, qblock: int = QBLOCK4,
                            scale_dtype=np.float32):
    """[.., K, N] float -> (packed uint8 [.., K//2, N], s [.., K//qblock, N],
    m [.., K//qblock, N]) per-(group-of-qblock-along-K, column) AFFINE
    quantization: ``w ≈ s * q + m``, q in [0, 15].

    ``scale_dtype`` trades footprint for scale precision: f32 carries GGUF
    Q4_K bit-exactly (folded superblock scales); ``ml_dtypes.bfloat16``
    (or the string "bfloat16") halves the scale bytes (group-32 bf16 s+m =
    1 bit/weight -> 5 bpw total) at ~0.2% extra scale rounding — the right
    call for the 13B DiT capacity path.  Leading dims carry stacked
    layers.  K-half planar packing (module doc).
    """
    if isinstance(scale_dtype, str) and scale_dtype == "bfloat16":
        import ml_dtypes

        scale_dtype = ml_dtypes.bfloat16
    w = np.asarray(w, np.float32)
    k, n = w.shape[-2], w.shape[-1]
    assert k % (2 * qblock) == 0, (
        f"K={k} must be a multiple of 2*qblock={2 * qblock} "
        "(K-half planar packing: groups must not straddle the halves)"
    )
    g = w.reshape(*w.shape[:-2], k // qblock, qblock, n)
    lo_v = g.min(axis=-2)
    hi_v = g.max(axis=-2)
    s = np.maximum((hi_v - lo_v) / 15.0, 1e-12).astype(scale_dtype)
    m = lo_v.astype(scale_dtype)
    sf = s.astype(np.float32)[..., :, None, :]
    mf = m.astype(np.float32)[..., :, None, :]
    q = np.clip(np.round((g - mf) / sf), 0, 15).astype(np.uint8)
    return pack_nibbles(q.reshape(*w.shape[:-2], k, n)), s, m


def dequantize_int4_blockwise(packed, s, m, qblock: int = QBLOCK4):
    """Reference (unfused, NumPy) dequant for testing: -> f32 [K, N]."""
    packed = np.asarray(packed)
    kh, n = packed.shape[-2], packed.shape[-1]
    k = kh * 2
    lo = (packed & 0xF).astype(np.float32)
    hi = (packed >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], axis=-2)  # [.., K, N]
    g = q.reshape(*packed.shape[:-2], k // qblock, qblock, n)
    sf = np.asarray(s, np.float32)[..., :, None, :]
    mf = np.asarray(m, np.float32)[..., :, None, :]
    return (g * sf + mf).reshape(*packed.shape[:-2], k, n)


# ---------------------------------------------------------------------------
# XLA transient-dequant path (MXU-bound large-M regime)
# ---------------------------------------------------------------------------


def w4_matmul_xla(
    x,  # [M, K] bf16/f32 activations
    w_p,  # [K//2, N] uint8 packed nibbles
    s_w,  # [K//qblock, N] scales (f32/bf16/f16)
    m_w,  # [K//qblock, N] mins
    bias=None,  # [N]
    out_dtype=jnp.bfloat16,
    qblock: int = QBLOCK4,
    compute_dtype=jnp.float32,
):
    """Transient-dequant W4A16: packed HBM weight -> bf16 temp -> matmul.

    Same dequant math as the fused kernel (nibble -> compute_dtype * s + m
    -> bf16 MXU input, f32 accumulation) done once per matmul through XLA;
    the bf16 weight exists only as a per-matmul temporary and the resident
    copy stays 4-bit.  ``compute_dtype=jnp.bfloat16`` halves the dequant
    intermediates' HBM traffic at one extra bf16 rounding of s*q+m (the
    nibble itself is exact in bf16) — measured 10-13% faster per matmul at
    13B DiT shapes in an 8-weight scan (benches/w4_dequant_exp.py: 4.48 vs
    5.02 ms at 4096x4096, 8.30 vs 9.54 at the FF up), so the DiT path
    (_apply_linear_w4) passes bf16; f32 stays the signature default for
    oracle-exactness in tests and the bit-exact-carry T5 story."""
    kh, n = w_p.shape
    k = kh * 2
    assert k % qblock == 0 and s_w.shape == (k // qblock, n), (
        f"scales {s_w.shape} must be [{k}//{qblock}, {n}]"
    )
    lo = (w_p & jnp.uint8(0xF)).astype(compute_dtype)
    hi = (w_p >> jnp.uint8(4)).astype(compute_dtype)
    q = jnp.concatenate([lo, hi], axis=0).reshape(k // qblock, qblock, n)
    wf = q * s_w.astype(compute_dtype)[:, None, :] + \
        m_w.astype(compute_dtype)[:, None, :]
    out = jnp.dot(
        x.astype(jnp.bfloat16), wf.reshape(k, n).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Fused Pallas kernel (HBM-bandwidth-bound small-M regime)
# ---------------------------------------------------------------------------


def _kernel(x_lo_ref, x_hi_ref, wp_ref, slo_ref, mlo_ref, shi_ref, mhi_ref,
            o_ref, acc_scr, *, nk: int, qblock: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    bkp, bn = wp_ref.shape
    # nibble extraction in int32: Mosaic legalizes neither 8-bit vector
    # shifts (arith.shrui on i8) nor direct uint8->f32 casts
    wp = wp_ref[...].astype(jnp.int32)
    # two contiguous half-depth dequants — no sublane interleave (module doc)
    for half, x_ref, s_ref, m_ref in (
        (wp & 0xF, x_lo_ref, slo_ref, mlo_ref),
        (wp >> 4, x_hi_ref, shi_ref, mhi_ref),
    ):
        qf = half.astype(jnp.float32).reshape(bkp // qblock, qblock, bn)
        wf = (qf * s_ref[...].astype(jnp.float32)[:, None, :]
              + m_ref[...].astype(jnp.float32)[:, None, :])
        acc_scr[...] += jax.lax.dot(
            x_ref[...], wf.reshape(bkp, bn).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret",
                     "qblock"),
)
def w4_matmul(
    x,  # [M, K] bf16/f32 activations
    w_p,  # [K//2, N] uint8 packed nibbles (K-half planar)
    s_w,  # [K//qblock, N] scales
    m_w,  # [K//qblock, N] mins
    bias=None,  # [N]
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 1024,  # LOGICAL k rows per grid step (2*packed rows)
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    qblock: int = QBLOCK4,
):
    """Fused W4A16 matmul: 4-bit weights stream from HBM, dequantized in
    VMEM inside the k-loop.  Grid walks the PACKED k dim; each step feeds
    the MXU two half-depth tiles (lo-half rows, hi-half rows of K)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    m, k = x.shape
    kh, n = w_p.shape
    assert k == 2 * kh, f"x K={k} vs packed K/2={kh}"
    assert k % (2 * qblock) == 0 and s_w.shape == (k // qblock, n), (
        f"scales {s_w.shape} must be [{k}//{qblock}, {n}]"
    )
    block_m = min(block_m, _round_up(m, 32))
    block_n = min(block_n, _round_up(n, 128))
    bkp = block_k // 2  # packed rows per step
    bkp = min(bkp, _round_up(kh, 128))
    bkp = _round_up(bkp, qblock)

    mp = _round_up(m, block_m)
    khp = _round_up(kh, bkp)
    np_ = _round_up(n, block_n)
    nk = khp // bkp

    # x is laid out [M, K] = [M, lo-half ; hi-half]; pad each half to khp so
    # the hi half starts exactly at column khp (the kernel's index map)
    x = x.astype(jnp.bfloat16)
    x_pad = jnp.concatenate(
        [jnp.pad(x[:, :kh], ((0, mp - m), (0, khp - kh))),
         jnp.pad(x[:, kh:], ((0, mp - m), (0, khp - kh)))], axis=1)
    wp = jnp.pad(w_p, ((0, khp - kh), (0, np_ - n)))
    # scales indexed as two stacked halves (lo groups then hi groups), each
    # padded to gh groups; padded groups dequant to 0*s+0 and meet zero x
    gh = khp // qblock  # groups per half (padded)
    g_half = k // (2 * qblock)  # real groups per half

    def stack_halves(a):
        return jnp.concatenate(
            [jnp.pad(a[:g_half], ((0, gh - g_half), (0, np_ - n))),
             jnp.pad(a[g_half:], ((0, gh - g_half), (0, np_ - n)))], axis=0)

    sw2 = stack_halves(s_w)
    mw2 = stack_halves(m_w)

    grid = (mp // block_m, np_ // block_n, nk)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, qblock=qblock),
        grid=grid,
        in_specs=[
            # x lo-half tile and hi-half tile (hi starts at column khp)
            pl.BlockSpec((block_m, bkp), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_m, bkp),
                         lambda i, j, kk, _nk=nk: (i, kk + _nk)),
            pl.BlockSpec((bkp, block_n), lambda i, j, kk: (kk, j)),
            # scale/min tiles for the lo groups and the hi groups
            pl.BlockSpec((bkp // qblock, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bkp // qblock, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bkp // qblock, block_n),
                         lambda i, j, kk, _nk=nk: (kk + _nk, j)),
            pl.BlockSpec((bkp // qblock, block_n),
                         lambda i, j, kk, _nk=nk: (kk + _nk, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_pad, x_pad, wp, sw2, mw2, sw2, mw2)

    out = out[:m, :n]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# same regime boundary as the int8 path (benches/int8_mxu_exp.py)
W4_XLA_MIN_M = 1024


def w4_matmul_auto(x, w_p, s_w, m_w, bias=None, out_dtype=jnp.bfloat16,
                   qblock: int = QBLOCK4, compute_dtype=jnp.float32,
                   **pallas_kwargs):
    """Dispatch W4A16 by regime: fused Pallas kernel for small M (weight-
    bandwidth-bound — 4-bit HBM traffic), transient XLA dequant for large
    M (MXU-bound; ``compute_dtype`` forwarded there)."""
    if x.shape[0] >= W4_XLA_MIN_M:
        return w4_matmul_xla(
            x, w_p, s_w, m_w, bias=bias, out_dtype=out_dtype, qblock=qblock,
            compute_dtype=compute_dtype,
        )
    return w4_matmul(
        x, w_p, s_w, m_w, bias=bias, out_dtype=out_dtype, qblock=qblock,
        **pallas_kwargs,
    )
