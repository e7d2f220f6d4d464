"""Video-coordinate 3-axis rotary position embeddings for the LTX DiT.

Exact frequency recipe of the reference (src/models/ltx_video/
ltx_transformer.rs:342-525):

- ``steps = dim // 6`` frequencies per axis: ``theta ** linspace(0, 1, steps)
  * pi/2`` (f32),
- the per-token grid (frame, height, width coords) is scaled to ``g*2 - 1``,
- angles are laid out freq-major interleaved across axes:
  ``[f0,h0,w0, f1,h1,w1, ...]`` then repeat_interleave(2),
- ``dim % 6`` leftover lanes are padded at the FRONT with cos=1 / sin=0,
- rotation is applied to the *full* inner dim before the head split, in f32
  (ltx_transformer.rs:314-339).

The (cos, sin) tables depend only on the coordinate grid, so the pipeline
precomputes them once per video shape instead of per forward.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def rope_freqs(dim: int, theta: float = 10000.0) -> np.ndarray:
    """The ``dim//6`` base angular frequencies, in f32 (host-side)."""
    steps = dim // 6
    if steps <= 1:
        lin = np.zeros((max(steps, 1),), dtype=np.float32)
    else:
        lin = (np.arange(steps, dtype=np.float32) / np.float32(steps - 1)).astype(
            np.float32
        )
    freqs = np.exp(lin * np.float32(math.log(theta))).astype(np.float32)
    return freqs * np.float32(math.pi / 2.0)


def video_coords_grid(num_frames: int, height: int, width: int) -> np.ndarray:
    """Default (f, h, w) integer grid, flattened to [seq, 3] (f-major)."""
    f = np.arange(num_frames, dtype=np.float32)
    h = np.arange(height, dtype=np.float32)
    w = np.arange(width, dtype=np.float32)
    gf, gh, gw = np.meshgrid(f, h, w, indexing="ij")
    return np.stack([gf, gh, gw], axis=-1).reshape(-1, 3)


@functools.partial(jax.jit, static_argnames=("dim", "theta"))
def rope_cos_sin(
    grid,
    dim: int,
    theta: float = 10000.0,
):
    """grid [..., seq, 3] (already normalized to base sizes) -> (cos, sin).

    Output shapes [..., seq, dim], f32.  Jitted (static dim/theta): the
    eager version cost ~8 tiny per-op XLA compiles per video shape on the
    remote-compile tunnel.
    """
    freqs = jnp.asarray(rope_freqs(dim, theta))  # [steps]
    steps = freqs.shape[0]

    g = grid.astype(jnp.float32)[..., None] * 2.0 - 1.0  # [..., seq, 3, 1]
    ang = g * freqs  # [..., seq, 3, steps]
    # freq-major across axes: transpose the last two dims then flatten
    ang = jnp.swapaxes(ang, -1, -2).reshape(*ang.shape[:-2], 3 * steps)

    cos = jnp.repeat(jnp.cos(ang), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(ang), 2, axis=-1)

    rem = dim % 6
    if rem:
        pad_shape = (*cos.shape[:-1], rem)
        cos = jnp.concatenate([jnp.ones(pad_shape, cos.dtype), cos], axis=-1)
        sin = jnp.concatenate([jnp.zeros(pad_shape, sin.dtype), sin], axis=-1)
    return cos, sin


def normalize_video_coords(coords, base_num_frames: int, base_height: int, base_width: int):
    """coords [..., seq, 3] -> normalized by (base_f, base_h, base_w)."""
    base = jnp.asarray(
        [float(base_num_frames), float(base_height), float(base_width)],
        dtype=jnp.float32,
    )
    return coords.astype(jnp.float32) / base


def default_grid_normalized(
    num_frames: int,
    height: int,
    width: int,
    base_num_frames: int,
    base_height: int,
    base_width: int,
    patch_size: int = 1,
    patch_size_t: int = 1,
    rope_interpolation_scale=None,
) -> np.ndarray:
    """The reference's ``prepare_video_coords`` path: raw grid scaled by
    (scale * patch / base) per axis (ltx_transformer.rs:373-433)."""
    grid = video_coords_grid(num_frames, height, width)
    if rope_interpolation_scale is not None:
        sf, sh, sw = rope_interpolation_scale
        scale = np.array(
            [
                sf * patch_size_t / base_num_frames,
                sh * patch_size / base_height,
                sw * patch_size / base_width,
            ],
            dtype=np.float32,
        )
        grid = grid * scale
    return grid


def rope_split_permutation(dim: int) -> np.ndarray:
    """Lane permutation for the SPLIT rope layout: within every 128-lane
    group, pair-even lanes first, pair-odd lanes second.

    Because attention scores are invariant under any lane permutation
    applied to BOTH q and k (and v/out are untouched), the permutation can
    be folded into the to_q/to_k projection weights once at setup — zero
    runtime cost.  In the split layout the interleaved rotation becomes a
    single half-group roll with COMPACT (half-width) tables
    (flash_attention_packed.py::_rotate_split) — half the rope-table HBM
    traffic and in-kernel k rotation.

    Returns ``perm`` with ``x_split[..., i] = x[..., perm[i]]``.
    """
    if dim % 128:
        raise ValueError(f"split rope layout needs dim % 128 == 0, got {dim}")
    idx = np.arange(dim).reshape(-1, 128)
    return np.concatenate([idx[:, 0::2], idx[:, 1::2]], axis=1).reshape(-1)


@jax.jit
def rope_split_tables(cos, sin):
    """Compact combined table for the split layout.

    Input: full-width interleaved (cos, sin) [..., S, dim] (pair-duplicated:
    ``cos[..., 2p] == cos[..., 2p+1]``).  Output: [..., S, dim] where each
    128-lane group holds ``[cos_pairs(64) | sin_pairs(64)]`` — the layout
    ``_rotate_split`` consumes.  (Width is preserved because cos and sin
    pack together; HBM traffic halves because ONE table replaces two.)
    """
    c = cos[..., 0::2]
    s = sin[..., 0::2]
    lead, half = c.shape[:-1], c.shape[-1]
    if half % 64:
        raise ValueError(f"split rope layout needs dim % 128 == 0, got {2 * half}")
    g = half // 64
    c = c.reshape(*lead, g, 64)
    s = s.reshape(*lead, g, 64)
    return jnp.concatenate([c, s], axis=-1).reshape(*lead, g * 128)


def apply_rotary_emb_split(x, cs):
    """XLA reference for the split-layout rotation (oracle for the kernel).

    ``x`` [..., S, dim] in the split lane layout, ``cs`` the
    ``rope_split_tables`` output.  f32 math, exact.
    """
    dtype = x.dtype
    lead, dim = x.shape[:-1], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(*lead, dim // 128, 128)
    csf = cs.astype(jnp.float32).reshape(*cs.shape[:-1], dim // 128, 128)
    c, s = csf[..., :64], csf[..., 64:]
    ct = jnp.concatenate([c, c], axis=-1)
    st = jnp.concatenate([-s, s], axis=-1)
    out = xf * ct + jnp.roll(xf, 64, axis=-1) * st
    return out.reshape(*lead, dim).astype(dtype)


def split_rope_sin(sin):
    """Split the interleaved sin table for roll-based in-kernel rotation.

    apply_rotary_emb computes ``out = x*cos + x_rot*sin`` with
    ``x_rot = (-x1, x0, -x3, x2, ...)``.  Equivalently:
    ``out = x*cos + roll(x,-1)*sin_e + roll(x,+1)*sin_o`` where
    ``sin_e[2i] = -sin[2i], sin_e[odd] = 0`` and
    ``sin_o[2i+1] = sin[2i+1], sin_o[even] = 0``.  The zeroed lanes also
    cancel roll wrap-around across head/block boundaries.  Exact (no
    approximation); lets the attention kernel rotate q in VMEM.
    """
    dim = sin.shape[-1]
    lane = np.arange(dim)
    even = jnp.asarray((lane % 2 == 0).astype(np.float32))
    odd = jnp.asarray((lane % 2 == 1).astype(np.float32))
    return -sin * even, sin * odd


def apply_rotary_emb(x, cos, sin):
    """x [..., S, C] with (cos, sin) [..., S, C]; rotation math in f32.

    Pairs are interleaved: (x0, x1) -> (x0*cos - x1*sin, x1*cos + x0*sin).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    shape = xf.shape
    half = shape[-1] // 2
    x2 = xf.reshape(*shape[:-1], half, 2)
    x_real, x_imag = x2[..., 0], x2[..., 1]
    x_rot = jnp.stack([-x_imag, x_real], axis=-1).reshape(shape)
    out = xf * cos.astype(jnp.float32) + x_rot * sin.astype(jnp.float32)
    return out.astype(dtype)
