"""Lane-blocked flash attention: heads packed along the lane dimension.

The classic TPU flash-attention layout ([B*H, S, D]) forces four 20 MB
transposes per layer around the kernel ([B,S,H*D] -> [B,H,S,D] for q/k/v and
back for the output) — measured ~34 ms/step at LTX 2B shapes, plus it keeps
the MXU at D=64 utilization.  This kernel instead reads q/k/v in their
NATURAL projection layout [B, S, H*D] and blocks the lane dimension in
128-lane groups = ceil(128/D) heads per program:

- D=64 (LTX 2B, 32 heads): 2 heads per program, zero layout changes,
- D=128 (LTX 13B): 1 head per program, still zero layout changes.

Two kernels share the layout:
- ONE-PASS (default, K_pad <= _ONEPASS_KP_MAX): exact one-pass softmax over
  the full key sequence; K/V lane-blocks are fetched once per
  (batch, head-pair).  Needs the [block_q, K_pad] f32 scores tile (plus the
  whole-K k/v residency) in VMEM.
- LONG (K_pad beyond the envelope — e.g. S=12672 at 512x768x257f): grid
  axis 2 walks key blocks; the Cauchy-Schwarz bound fixes the softmax
  shift so numerator/denominator are plain sums accumulated in VMEM
  scratch — K/V stream through in tiles and sequence length is unbounded.
  The wrapper routes automatically and logs the choice.

The q-side rotary embedding (``rope_q=(cos, sin)``) is applied INSIDE the
kernel — exact f32 math equivalent to ops/rope.py::apply_rotary_emb via the
roll identity ``x_rot = roll(x,-1)*(-sin*even) + roll(x,+1)*(sin*odd)``
(the even/odd masks come from an in-kernel iota, and also cancel roll
wrap-around across head/block boundaries) — so the rotated q never
materializes to HBM.  The k-side rotation stays outside: its full-length
f32 tables would keep ~5 MB resident and overflow VMEM at LTX shapes.

Reference call site: src/models/ltx_video/ltx_transformer.rs:699-712.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634
_SCORES_VMEM_BUDGET = 6 * 1024 * 1024


def _rotate(x, cos, sin):
    """Interleaved-pair rotation in f32 (== ops/rope.py apply_rotary_emb)."""
    xf = x.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, xf.shape, xf.ndim - 1)
    even = (lane % 2) == 0
    sin_e = jnp.where(even, -sin, 0.0)
    sin_o = jnp.where(even, 0.0, sin)
    out = xf * cos + jnp.roll(xf, -1, axis=-1) * sin_e
    out = out + jnp.roll(xf, 1, axis=-1) * sin_o
    return out.astype(x.dtype)


def _rotate_split(x, cs):
    """Split-layout rotation: one half-block roll, COMPACT tables.

    ``x`` [rows, 128] is one lane group in the split layout (pair-even
    elements in lanes [0,64), pair-odd in [64,128) — see
    ops/rope.py::rope_split_permutation); ``cs`` [rows, 128] packs the
    compact tables as [cos_pairs(64) | sin_pairs(64)].  Then
    ``out = x*[c|c] + roll(x,64)*[-s|s]`` is exactly the interleaved
    rotation, at half the table bandwidth and one roll instead of two.
    """
    xf = x.astype(jnp.float32)
    csf = cs.astype(jnp.float32)
    rcs = jnp.roll(csf, 64, axis=-1)  # [s | c]
    lane = jax.lax.broadcasted_iota(jnp.int32, csf.shape, csf.ndim - 1)
    lo = lane < 64
    ct = jnp.where(lo, csf, rcs)  # [c | c]
    st = jnp.where(lo, -rcs, csf)  # [-s | s]
    return (xf * ct + jnp.roll(xf, 64, axis=-1) * st).astype(x.dtype)


def _kernel(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    qcos_ref,
    qsin_ref,
    qcs_ref,
    kcs_ref,
    o_ref,
    krot_ref,
    kn_ref,
    *,
    scale,
    kv_len,
    head_dim,
    softmax_bound=None,
    scores_bf16=False,
    k_chunks=1,
):
    split = qcs_ref is not None
    q = q_ref[0]  # [bq, L]   (L = heads_per_block * D lanes)
    if split:
        # split layout: q AND k rotate in VMEM from compact [c|s] tables.
        # k rotates once per (batch, head-group) into scratch — its block
        # index is constant along the q grid axis.
        q = _rotate_split(q, qcs_ref[0])

        @pl.when(pl.program_id(1) == 0)
        def _():
            # rotate in 128-row chunks: a whole-block rotation would keep
            # ~6 full-length f32 temporaries live at once (~12 MB of scoped
            # vmem at S=4992)
            def body(i, _):
                sl = pl.ds(i * 128, 128)
                krot_ref[sl, :] = _rotate_split(k_ref[0, sl, :], kcs_ref[0, sl, :])
                return 0

            jax.lax.fori_loop(0, krot_ref.shape[0] // 128, body, 0)

        k = krot_ref[...]
    else:
        if qcos_ref is not None:
            # interleaved q-side rotation in VMEM (k is rotated outside: its
            # full-length f32 tables would overflow VMEM at these shapes)
            q = _rotate(q, qcos_ref[0], qsin_ref[0])
        k = k_ref[0]  # [Kp, L]
    v = v_ref[0]
    lanes = q.shape[-1]
    n_heads = lanes // head_dim
    if split and n_heads > 1:
        # split layout de-interleaves pairs per 128-lane group, so a head's
        # features are non-contiguous (quadrants 0,2 / 1,3).  Mask q per head
        # and contract over all 128 lanes — same MXU passes as the 64-deep
        # sliced dot (the systolic array is 128 deep either way).
        lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 1)
        head_of_lane = (lane // (head_dim // 2)) % n_heads

    if kn_ref is not None:
        # Fast softmax: a rigorous Cauchy-Schwarz upper bound replaces
        # the row max — softmax is shift-invariant, so any shift >= the
        # realized row max (and within the exp underflow headroom above
        # it, ~86 nats for the bf16 p below) gives the EXACT result,
        # and the full [bq, Kp] max reduction pass disappears.  The
        # per-group bound arrives precomputed in SMEM
        # (group_score_bounds — one fused square+reduce outside).
        bi = pl.program_id(0) // kn_ref.shape[1]
        grp = pl.program_id(0) % kn_ref.shape[1]
        m_fixed = kn_ref[bi, grp]
        if bias_ref is not None:
            m_fixed = m_fixed + jnp.max(bias_ref[0, 0].astype(jnp.float32))
    elif softmax_bound is not None:
        # Static variant (A/B hook): same shift-invariance argument;
        # the caller asserts the realized row max stays within ~40 of
        # the bound (f32/bf16 exp headroom).
        m_fixed = jnp.float32(softmax_bound)
    else:
        m_fixed = None  # per-row max (needs the full score tile at once)
    if k_chunks > 1 and m_fixed is None:
        raise ValueError("k_chunks > 1 requires a fixed softmax shift "
                         "(softmax_bound); the row max is a two-pass")
    kp_len = k.shape[0]
    ck = kp_len // k_chunks if k_chunks > 1 else kp_len

    outs = []
    for h in range(n_heads):
        lo = h * head_dim
        if split and n_heads > 1:
            qh = jnp.where(head_of_lane == h, q, jnp.zeros_like(q))
        else:
            qh = q[:, lo : lo + head_dim]

        def score(kh_c, col0):
            s = jax.lax.dot_general(
                qh, kh_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, ck]
            s = s * scale
            if bias_ref is not None:
                s = s + bias_ref[0, 0][None, col0 : col0 + s.shape[1]].astype(
                    jnp.float32)
            if col0 + s.shape[1] > kv_len:  # mask padded key columns
                col = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len, s, _NEG_INF)
            return s

        def softmax_pv(s, m, v_c):
            if scores_bf16:
                # exp2 at bf16: halves the transcendental-input VMEM
                # traffic; adds one bf16 rounding (quality-gated A/B)
                p = jnp.exp2(((s - m) * jnp.float32(_LOG2E)).astype(
                    jnp.bfloat16)).astype(jnp.float32)
            else:
                p = jnp.exp2((s - m) * jnp.float32(_LOG2E))
            l = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v_c,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, D]
            return pv, l

        if k_chunks == 1:
            kh = k if (split and n_heads > 1) else k[:, lo : lo + head_dim]
            s = score(kh, 0)
            m = m_fixed if m_fixed is not None else jnp.max(
                s, axis=-1, keepdims=True)
            pv, l = softmax_pv(s, m, v[:, lo : lo + head_dim])
        else:
            # Fixed-shift softmax decomposes over key chunks (l and pv are
            # plain sums), so the per-chunk exp2/sum (VPU) can overlap the
            # neighbouring chunks' score/PV matmuls (MXU) — the one-block
            # kernel serializes MXU → VPU → MXU per head instead.
            pv = jnp.zeros((qh.shape[0], head_dim), jnp.float32)
            l = jnp.zeros((qh.shape[0], 1), jnp.float32)
            for c in range(k_chunks):
                sl = slice(c * ck, (c + 1) * ck)
                kh_c = k[sl] if (split and n_heads > 1) else \
                    k[sl, lo : lo + head_dim]
                s = score(kh_c, c * ck)
                pv_c, l_c = softmax_pv(s, m_fixed, v[sl, lo : lo + head_dim])
                pv = pv + pv_c
                l = l + l_c
        outs.append(pv / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_long(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    qcos_ref,
    qsin_ref,
    qcs_ref,
    kcs_ref,
    kn_ref,
    o_ref,
    pv_acc,
    l_acc,
    *,
    scale,
    kv_len,
    head_dim,
    block_k,
):
    """Multi-k-block lane-packed attention (the long-sequence kernel).

    Grid axis 2 walks key blocks sequentially; the Cauchy-Schwarz score
    bound (SMEM, per batch x lane-group) fixes the softmax shift, so the
    numerator/denominator are PLAIN SUMS over key blocks — accumulated in
    VMEM scratch and finalized on the last block.  No online-max rescaling,
    no whole-K VMEM residency: K/V stream through in ``block_k`` tiles, so
    sequence length is unbounded (the one-pass kernel needs the full
    [block_q, K_pad] scores tile in VMEM, which caps it near S~8-10k).
    Exactness argument is the one-pass kernel's: softmax is shift-invariant
    and the bound stays within exp2's underflow headroom of the realized
    row max."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    split = qcs_ref is not None

    @pl.when(ki == 0)
    def _():
        pv_acc[...] = jnp.zeros_like(pv_acc)
        l_acc[...] = jnp.zeros_like(l_acc)

    q = q_ref[0]  # [bq, L]
    if split:
        # recomputed per key block: VPU cost is negligible next to the two
        # MXU passes, and it keeps the kernel scratch-free for q
        q = _rotate_split(q, qcs_ref[0])
    elif qcos_ref is not None:
        q = _rotate(q, qcos_ref[0], qsin_ref[0])
    k = _rotate_split(k_ref[0], kcs_ref[0]) if split else k_ref[0]
    v = v_ref[0]

    lanes = q.shape[-1]
    n_heads = lanes // head_dim
    if split and n_heads > 1:
        lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 1)
        head_of_lane = (lane // (head_dim // 2)) % n_heads

    # the fixed shift must be IDENTICAL across key blocks (partial sums with
    # different shifts don't add); when a bias rides along, its global max
    # was already folded into the SMEM bounds by the wrapper
    bi = pl.program_id(0) // kn_ref.shape[1]
    grp = pl.program_id(0) % kn_ref.shape[1]
    m_fixed = kn_ref[bi, grp]

    col0 = ki * block_k
    for h in range(n_heads):
        lo = h * head_dim
        if split and n_heads > 1:
            qh = jnp.where(head_of_lane == h, q, jnp.zeros_like(q))
            kh = k
        else:
            qh = q[:, lo : lo + head_dim]
            kh = k[:, lo : lo + head_dim]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bq, block_k]
        if bias_ref is not None:
            s = s + bias_ref[0, 0][None, :].astype(jnp.float32)
        if kv_len % block_k:  # static: the last key block carries padding
            col = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp2((s - m_fixed) * jnp.float32(_LOG2E))
        l = jnp.sum(p, axis=-1, keepdims=True)  # [bq, 1]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, lo : lo + head_dim],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, D]
        pv_acc[:, lo : lo + head_dim] += pv
        l_acc[:, lo : lo + head_dim] += jnp.broadcast_to(l, pv.shape)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (pv_acc[...] / l_acc[...]).astype(o_ref.dtype)


def score_head_map(inner: int, head_dim: int, split: bool) -> "np.ndarray":
    """Kernel head index for every lane of the packed [.., H*D] layout.

    Natural layout: lane // D.  Split rope layout
    (rope.py::rope_split_permutation): within each 128-lane group, a head's
    features occupy every (D//2)-lane quadrant with stride ``hp`` — the same
    mapping the kernel's masking uses (``(lane // (D//2)) % hp``).
    """
    import numpy as np

    lane = np.arange(inner)
    if not split:
        return lane // head_dim
    hp = 128 // head_dim
    return (lane // 128) * hp + (lane % 128) // (head_dim // 2) % hp


# m may exceed the realized row max by the f32->bf16 exp underflow headroom
# (~86 nats) without changing the result; clip far below that.
_BOUND_CLIP = 40.0


def _group_max_norms(x3, n_groups: int):
    """``max_j ||x_j,group||_2`` per (batch, 128-lane group): one fused
    square+reduce, no lane->head mapping needed."""
    b, s, inner = x3.shape
    xf = x3.astype(jnp.float32).reshape(b, s, n_groups, inner // n_groups)
    return jnp.sqrt(jnp.max(jnp.sum(xf * xf, axis=-1), axis=1))  # [B, G]


def group_score_bounds(q3, k3, scale, n_groups: int):
    """Rigorous per-(batch, 128-lane group) upper bound on the post-scale
    scores: ``scale * max_i||q_i,g|| * max_j||k_j,g||`` (Cauchy-Schwarz).
    A head's lanes are a subset of its group's, so the group norms
    upper-bound every per-head row norm (~2x looser for 2 heads/group —
    a few nats against the ~86-nat exp headroom).  The in-kernel RoPE
    rotations are orthogonal within each head's lanes, so pre-rotation
    norms remain valid.  Clipped to _BOUND_CLIP (clipping can only lower
    m; exp overflow then needs a realized score > clip + 88 — unreachable
    for RMS-normalized q/k)."""
    bound = jnp.float32(scale) * _group_max_norms(q3, n_groups) * \
        _group_max_norms(k3, n_groups)
    return jnp.minimum(bound, jnp.float32(_BOUND_CLIP))


# above this padded key length the one-pass kernel's whole-K VMEM residency
# (k + v + rotated-k scratch + tables + the [block_q, K_pad] scores tile)
# outgrows the 16 MB scoped-vmem budget; the multi-k-block long kernel takes
# over (K/V stream through in tiles, sequence length unbounded)
_ONEPASS_KP_MAX = 8192


def packed_viable(s_len: int, kv_len: int, num_heads: int, head_dim: int) -> bool:
    """True when the lane-packed kernels apply (one-pass or long: the lane
    grouping must work; sequence length no longer disqualifies — the
    multi-k-block kernel streams K/V)."""
    if head_dim > 128 or 128 % head_dim != 0:
        return False
    hp = 128 // head_dim
    return num_heads % hp == 0


def _packed_long(
    q, k, v, *, num_heads, scale, bias=None, rope_q=None, rope_split=None,
    block_q=None, block_k: int = 1024, interpret=None,
    lane_group_heads=None,
):
    """Long-sequence lane-packed attention (see _kernel_long).

    Same contract as flash_attention_packed; always uses the in-SMEM
    Cauchy-Schwarz bounds (the fixed shift is what makes the key-block
    sums exact), with the global bias max folded in when a bias rides."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    b, s_len, hd = q.shape
    kv_len = k.shape[1]
    head_dim = hd // num_heads
    hp = lane_group_heads or 128 // head_dim
    if rope_split is not None and hp * head_dim != 128:
        raise ValueError("rope_split requires 128-lane grouping")
    lanes = hp * head_dim
    n_groups = num_heads // hp
    if rope_split is not None and kv_len != s_len:
        raise ValueError("rope_split requires self-attention (kv_len == s_len)")

    if block_q is None:
        block_q = 512
    block_q = min(block_q, _round_up(s_len, 8))
    block_k = min(block_k, _round_up(kv_len, 128))
    # trace-time (once per compiled shape): no silent kernel switches
    logging.getLogger(__name__).info(
        "packed attention: LONG multi-k-block kernel (S=%d K=%d heads=%d "
        "block_q=%d block_k=%d split=%s)",
        s_len, kv_len, num_heads, block_q, block_k, rope_split is not None,
    )

    def pad(x, mult):
        n = x.shape[1]
        extra = (-n) % mult
        return jnp.pad(x, ((0, 0), (0, extra), (0, 0))) if extra else x

    qp = pad(q, block_q)
    kpad = pad(k, block_k)
    vp = pad(v, block_k)
    nq = qp.shape[1] // block_q
    nk = kpad.shape[1] // block_k

    grid = (b * n_groups, nq, nk)
    q_spec = pl.BlockSpec(
        (1, block_q, lanes), lambda bg, qi, ki, _g=n_groups: (bg // _g, qi, bg % _g)
    )
    kv_spec = pl.BlockSpec(
        (1, block_k, lanes), lambda bg, qi, ki, _g=n_groups: (bg // _g, ki, bg % _g)
    )

    in_specs = [q_spec, kv_spec, kv_spec]
    args = [qp, kpad, vp]
    has_bias = bias is not None
    has_rope = rope_q is not None
    has_split = rope_split is not None
    if has_bias:
        bias3 = bias.astype(jnp.float32).reshape(b, 1, kv_len)
        bias3 = pad(jnp.swapaxes(bias3, 1, 2), block_k)
        bias3 = jnp.swapaxes(bias3, 1, 2)
        in_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda bg, qi, ki, _g=n_groups: (bg // _g, 0, ki))
        )
        args.append(bias3)
    if has_rope:
        cos, sin = rope_q
        qcos_spec = pl.BlockSpec(
            (1, block_q, lanes), lambda bg, qi, ki, _g=n_groups: (0, qi, bg % _g)
        )
        in_specs.extend([qcos_spec, qcos_spec])
        args.extend([
            pad(cos.astype(jnp.float32), block_q),
            pad(sin.astype(jnp.float32), block_q),
        ])
    if has_split:
        cs = rope_split.astype(jnp.float32)
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, lanes), lambda bg, qi, ki, _g=n_groups: (0, qi, bg % _g)
            )
        )
        args.append(pad(cs, block_q))
        # k-side tables in bf16: the rotated k feeds a bf16 matmul operand
        # either way (same rounding as the one-pass kernel's bf16 scratch)
        in_specs.append(
            pl.BlockSpec(
                (1, block_k, lanes), lambda bg, qi, ki, _g=n_groups: (0, ki, bg % _g)
            )
        )
        args.append(pad(cs.astype(jnp.bfloat16), block_k))
    bounds = group_score_bounds(q, k, scale, n_groups)
    if has_bias:
        # fold the global bias max into the bound so the fixed shift is
        # identical across key blocks (required for the partial sums)
        bounds = bounds + jnp.max(
            bias.astype(jnp.float32).reshape(b, -1), axis=-1, keepdims=True
        )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(bounds)

    kernel = functools.partial(
        _kernel_long, scale=scale, kv_len=kv_len, head_dim=head_dim,
        block_k=block_k,
    )

    def body(q_r, k_r, v_r, *rest):
        i = 0
        b_r = qc_r = qs_r = qcs_r = kcs_r = None
        if has_bias:
            b_r = rest[i]
            i += 1
        if has_rope:
            qc_r, qs_r = rest[i : i + 2]
            i += 2
        if has_split:
            qcs_r, kcs_r = rest[i : i + 2]
            i += 2
        kn_r = rest[i]
        o_r, pv_acc, l_acc = rest[i + 1 : i + 4]
        kernel(q_r, k_r, v_r, b_r, qc_r, qs_r, qcs_r, kcs_r, kn_r,
               o_r, pv_acc, l_acc)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, lanes), jnp.float32),
            pltpu.VMEM((block_q, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    return out[:, :s_len]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "scale", "block_q", "interpret", "softmax_bound",
        "scores_bf16", "lane_group_heads", "k_chunks",
    ),
)
def flash_attention_packed(
    q,  # [B, S, H*D]
    k,  # [B, K, H*D]
    v,  # [B, K, H*D]
    *,
    num_heads: int,
    scale: float,
    bias=None,  # [B, 1, 1, K]
    rope_q=None,  # (cos, sin) each [1 or B, S, H*D] f32 — q not yet rotated
    rope_split=None,  # [1, S, H*D] compact [c|s] table — q AND k not rotated,
    #                   both in the split lane layout (rope.py::rope_split_*)
    block_q: int | None = None,
    interpret: bool | None = None,
    softmax_bound: float | str | None = None,  # "auto": in-kernel CS bound
    #   replaces the row-max pass; float: static bound (A/B); None: row max
    scores_bf16: bool = False,  # exp2 at bf16 (quality-gated A/B)
    k_chunks: int = 1,  # >1: fixed-shift softmax over key chunks so the
    #   per-chunk exp2/sum (VPU) overlaps adjacent chunks' matmuls (MXU);
    #   requires softmax_bound ("auto" or static)
    lane_group_heads: int | None = None,  # heads per lane group (default
    #   128//D).  num_heads = ALL heads in one program — the short-K
    #   cross-attention blocking: k/v resident once per batch, every head's
    #   scores+softmax+PV fused with no HBM roundtrip.
):
    """Returns [B, S, H*D]; exact one-pass softmax per head."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    if rope_q is not None and rope_split is not None:
        raise ValueError("rope_q and rope_split are mutually exclusive")
    b, s_len, hd = q.shape
    kv_len = k.shape[1]
    head_dim = hd // num_heads
    hp = lane_group_heads or 128 // head_dim  # heads per lane block
    if rope_split is not None and hp * head_dim != 128:
        raise ValueError("rope_split requires 128-lane grouping")
    lanes = hp * head_dim  # 128, or H*D in full-lanes mode
    n_groups = num_heads // hp
    if rope_split is not None and kv_len != s_len:
        raise ValueError("rope_split requires self-attention (kv_len == s_len)")

    kp = _round_up(kv_len, 128)
    if kp > _ONEPASS_KP_MAX or 64 * kp * 4 > _SCORES_VMEM_BUDGET:
        # long-sequence route: multi-k-block kernel, K/V streamed in tiles
        return _packed_long(
            q, k, v, num_heads=num_heads, scale=scale, bias=bias,
            rope_q=rope_q, rope_split=rope_split, block_q=block_q,
            interpret=interpret, lane_group_heads=lane_group_heads,
        )
    if k_chunks > 1 and (kp % k_chunks or (kp // k_chunks) % 128):
        raise ValueError(
            f"k_chunks={k_chunks} must split K_pad={kp} into 128-multiples")
    if block_q is None:
        budget = _SCORES_VMEM_BUDGET // (kp * 4)
        # split mode keeps the compact k-table + rotated-k scratch resident
        # (~3.75 MB at S=4992) — shrink the scores tile to stay under the
        # 16 MB scoped-vmem limit
        cap = 192 if rope_split is not None else 256
        block_q = max(64, min(cap, budget // 8 * 8))
    block_q = min(block_q, _round_up(s_len, 8))

    def pad(x, mult):
        n = x.shape[1]
        extra = (-n) % mult
        return jnp.pad(x, ((0, 0), (0, extra), (0, 0))) if extra else x

    qp = pad(q, block_q)
    kpad = pad(k, 128)
    vp = pad(v, 128)
    nq = qp.shape[1] // block_q

    grid = (b * n_groups, nq)
    q_spec = pl.BlockSpec(
        (1, block_q, lanes), lambda bg, qi, _g=n_groups: (bg // _g, qi, bg % _g)
    )
    kv_spec = pl.BlockSpec(
        (1, kp, lanes), lambda bg, qi, _g=n_groups: (bg // _g, 0, bg % _g)
    )
    o_spec = q_spec

    in_specs = [q_spec, kv_spec, kv_spec]
    args = [qp, kpad, vp]
    has_bias = bias is not None
    has_rope = rope_q is not None
    has_split = rope_split is not None
    if has_bias:
        bias3 = bias.astype(jnp.float32).reshape(b, 1, kv_len)
        if kp != kv_len:
            bias3 = jnp.pad(bias3, ((0, 0), (0, 0), (0, kp - kv_len)))
        in_specs.append(
            pl.BlockSpec((1, 1, kp), lambda bg, qi, _g=n_groups: (bg // _g, 0, 0))
        )
        args.append(bias3)
    if has_rope:
        cos, sin = rope_q
        qcos_spec = pl.BlockSpec(
            (1, block_q, lanes), lambda bg, qi, _g=n_groups: (0, qi, bg % _g)
        )
        in_specs.extend([qcos_spec, qcos_spec])
        args.extend(
            [pad(cos.astype(jnp.float32), block_q), pad(sin.astype(jnp.float32), block_q)]
        )
    if has_split:
        cs = rope_split.astype(jnp.float32)
        q_tab_dtype = (
            jnp.bfloat16
            if os.environ.get("CVT_SPLIT_QTAB_BF16")
            else jnp.float32
        )
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, lanes), lambda bg, qi, _g=n_groups: (0, qi, bg % _g)
            )
        )
        args.append(pad(cs.astype(q_tab_dtype), block_q))
        # k-side tables ride in BF16: the rotated k is stored to a BF16
        # scratch regardless, so table rounding is at the same level as the
        # unavoidable output rounding — and it halves the double-buffered
        # VMEM footprint of the full-length table block (scoped-vmem limit).
        in_specs.append(
            pl.BlockSpec((1, kp, lanes), lambda bg, qi, _g=n_groups: (0, 0, bg % _g))
        )
        args.append(pad(cs.astype(jnp.bfloat16), 128))
    auto_bound = softmax_bound == "auto"
    if auto_bound:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(group_score_bounds(q, k, scale, n_groups))
    kernel = functools.partial(
        _kernel, scale=scale, kv_len=kv_len, head_dim=head_dim,
        softmax_bound=None if auto_bound else softmax_bound,
        scores_bf16=scores_bf16, k_chunks=k_chunks,
    )

    def body(q_r, k_r, v_r, *rest):
        i = 0
        b_r = qc_r = qs_r = qcs_r = kcs_r = krot_r = kn_r = None
        if has_bias:
            b_r = rest[i]
            i += 1
        if has_rope:
            qc_r, qs_r = rest[i : i + 2]
            i += 2
        if has_split:
            qcs_r, kcs_r = rest[i : i + 2]
            i += 2
        if auto_bound:
            kn_r = rest[i]
            i += 1
        if has_split:
            krot_r = rest[i + 1]  # scratch ref follows the output ref
        kernel(q_r, k_r, v_r, b_r, qc_r, qs_r, qcs_r, kcs_r, rest[i],
               krot_r, kn_r)

    scratch_shapes = []
    if has_split:
        scratch_shapes.append(pltpu.VMEM((kp, lanes), k.dtype))
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    return out[:, :s_len]
