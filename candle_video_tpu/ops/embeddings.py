"""Sinusoidal timestep embeddings (DDPM-style) used by AdaLN and the VAE.

Mirrors the reference's ``get_timestep_embedding`` with flip_sin_to_cos=True
and downscale_freq_shift=0 (reference:
src/models/ltx_video/ltx_transformer.rs:271-309 and vae.rs:172-198): the math
runs in f32, frequencies are 1/10000^(i/half), and the output ordering is
[cos, sin].
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sinusoidal_timestep_embedding(
    timesteps,
    embedding_dim: int = 256,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
):
    """timesteps [N] -> [N, embedding_dim] in f32 (caller casts)."""
    half = embedding_dim // 2
    exponent = -math.log(max_period) * np.arange(half, dtype=np.float32)
    exponent = exponent / np.float32(half - downscale_freq_shift)
    inv_freq = jnp.asarray(np.exp(exponent), dtype=jnp.float32)

    t = timesteps.astype(jnp.float32)[:, None]
    freqs = t * inv_freq[None, :]
    sin, cos = jnp.sin(freqs), jnp.cos(freqs)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
