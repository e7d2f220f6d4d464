"""Sequence-parallel attention over the mesh.

The reference has no long-sequence parallelism (SURVEY.md §2.3 — sequence
length is tamed by VAE tiling instead); this is the new capability for very
long clips whose token count exceeds one chip.  Two schemes:

- ``sequence_parallel_attention`` (all-gather): the query sequence shards
  over a mesh axis, K/V are all-gathered over ICI inside ``shard_map``, and
  each shard runs the flash kernel on its local q block against the full
  K/V.  Per-chip memory: O(S/n · S) scores + O(S) gathered K/V.
- ``ring_attention`` (streaming): K/V chunks stay sharded and rotate around
  the ring via ``ppermute`` while each chip accumulates blockwise-softmax
  partial results against its local q shard.  Per-chip memory:
  O(S/n · S/n) scores + O(S/n) resident K/V — nothing ever holds the full
  sequence, so max clip length scales linearly with the ring size.  The
  ppermute of chunk j+1 is independent of the attention math on chunk j,
  so XLA's latency-hiding scheduler overlaps communication with compute.
  Non-causal and bias-free (softmax over keys is permutation-invariant, so
  no global-position bookkeeping is needed); pass bias via the all-gather
  path instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import attention


def sequence_parallel_attention(
    q,
    k,
    v,
    scale: float,
    mesh: Mesh,
    axis_name: str = "tp",
    bias=None,
    impl: str = "auto",
):
    """q/k/v [B, S, H, D] with S divisible by the mesh axis size.

    The sequence axis shards over ``axis_name``; output has the same
    sharding as q.
    """
    n = mesh.shape[axis_name]
    if q.shape[1] % n != 0:
        raise ValueError(
            f"sequence length {q.shape[1]} not divisible by mesh axis "
            f"'{axis_name}' size {n}"
        )

    in_specs = (
        P(None, axis_name, None, None),
        P(None, axis_name, None, None),
        P(None, axis_name, None, None),
    )
    if bias is not None:
        in_specs = in_specs + (P(None, None, None, None),)
    out_spec = P(None, axis_name, None, None)

    def inner(qc, kc, vc, *rest):
        kg = jax.lax.all_gather(kc, axis_name, axis=1, tiled=True)
        vg = jax.lax.all_gather(vc, axis_name, axis=1, tiled=True)
        b = rest[0] if rest else None
        return attention(qc, kg, vg, scale, bias=b, impl=impl)

    shard = jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )
    args = (q, k, v) + ((bias,) if bias is not None else ())
    return shard(*args)


def ring_attention(
    q,
    k,
    v,
    scale: float,
    mesh: Mesh,
    axis_name: str = "tp",
    chunk_impl: str = "auto",
):
    """Streaming ring attention: q/k/v [B, S, H, D], S divisible by the
    mesh axis size.  K/V shards rotate around the ring; each chip holds only
    its S/n chunk at any moment.  Output sharding matches q.

    Exactness: the blockwise online-softmax combination is the standard
    flash-attention recurrence in log-space — results match the all-gather
    path to f32 accumulation error.

    ``chunk_impl``: "xla" materializes per-chunk scores [B,H,Sq,Sc] f32 in
    HBM; "pallas" fuses chunk attention AND the state update into one
    kernel (ops/pallas/ring_chunk.py) so scores live only as a
    [block_q, Sc] VMEM tile — per-chip memory O(Sq·block) instead of
    O(Sq·Sc).  "auto" = pallas on TPU, xla elsewhere.

    The per-shard body lives in ops/ring.py (ring_self_attention) so the
    sequence-parallel denoise loop (denoise_loop_sp) can call it from
    inside its own shard_map.
    """
    from ..ops.ring import ring_self_attention

    n = mesh.shape[axis_name]
    if q.shape[1] % n != 0:
        raise ValueError(
            f"sequence length {q.shape[1]} not divisible by mesh axis "
            f"'{axis_name}' size {n}"
        )

    spec = P(None, axis_name, None, None)
    shard = jax.shard_map(
        functools.partial(
            ring_self_attention, scale=scale, axis_name=axis_name,
            chunk_impl=chunk_impl,
        ),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return shard(q, k, v)


def denoise_loop_sp(
    transformer_params,
    tcfg,
    latents,  # [B, S, C] f32
    encoder_hidden_states,  # [num_conds*B, K, caption] (batched rows)
    encoder_attention_mask,  # [num_conds*B, K]
    sigmas,  # [N+1] f32
    timesteps,  # [N] f32
    rope_cos,  # [1, S, D] f32
    rope_sin,
    guidance_scale,
    guidance_rescale,
    stg_scale,
    skip_layer_mask,  # [L, num_conds*B] f32
    mesh: Mesh,
    num_conds: int = 1,
    attn_impl: str = "auto",
    use_skip: bool = False,
):
    """Sequence-parallel denoise scan: the WHOLE scan runs inside ONE
    ``shard_map`` with the video-token axis sharded over the mesh's 'sp'
    axis (optionally composed with batch over 'dp').  Self-attention K/V
    chunks rotate around the ring via ``ppermute`` (ops/ring.py) — no chip
    ever holds the full K/V sequence; cross-attention, norms, FF, AdaLN,
    and the Euler step are token-local, so they need no collectives at all.

    Parity: ≡ pipeline.denoise_loop to f32 accumulation error (asserted in
    tests/test_sp_pipeline.py and __graft_entry__.dryrun_multichip).

    Limitations (rejected in generate()): stochastic sampling (the oracle
    draws one full-sequence noise tensor; shards would need a different
    stream) and the split-rope packed layout (rope rotates locally before
    the ring instead).
    """
    from ..models.ltx_video import scheduler as S
    from ..models.ltx_video import transformer as TF

    if "sp" not in mesh.shape:
        raise ValueError(f"mesh {mesh.shape} has no 'sp' axis")
    sp = mesh.shape["sp"]
    dp = mesh.shape.get("dp", 1)
    b, s, _ = latents.shape
    if s % sp != 0:
        raise ValueError(f"sequence length {s} not divisible by sp={sp}")
    if b % dp != 0:
        raise ValueError(f"batch {b} not divisible by dp={dp}")

    # scalars close over the shard_map body as replicated constants
    guidance_scale = float(guidance_scale)
    guidance_rescale = float(guidance_rescale)
    stg_scale = float(stg_scale)

    n_steps = timesteps.shape[0]
    lat_spec = P("dp", "sp", None)
    # guidance rows regrouped [num_conds, B, ...] so dp shards matching rows
    enc4 = encoder_hidden_states.reshape(
        num_conds, b, *encoder_hidden_states.shape[1:]
    )
    mask3 = encoder_attention_mask.reshape(
        num_conds, b, encoder_attention_mask.shape[-1]
    )
    skip3 = skip_layer_mask.reshape(skip_layer_mask.shape[0], num_conds, b)
    rope_spec = P(None, "sp", None)
    rep = jax.tree.map(lambda _: P(), transformer_params)

    def inner(params, lat, enc4c, mask3c, skip3c, cos, sin, sig, ts):
        bl = lat.shape[0]
        enc_rows = enc4c.reshape(num_conds * bl, *enc4c.shape[2:])
        mask_rows = mask3c.reshape(num_conds * bl, mask3c.shape[-1])
        skip_rows = skip3c.reshape(skip3c.shape[0], num_conds * bl)
        cos_b = jnp.broadcast_to(cos, (num_conds * bl,) + cos.shape[1:])
        sin_b = jnp.broadcast_to(sin, (num_conds * bl,) + sin.shape[1:])

        def step_fn(carry, xs):
            t, sigma, sigma_next = xs
            lat_in = jnp.tile(carry, (num_conds, 1, 1))
            timestep = jnp.full((num_conds * bl,), t, jnp.float32)
            pred = TF.forward(
                params, tcfg, lat_in, enc_rows, timestep, cos_b, sin_b,
                encoder_attention_mask=mask_rows,
                skip_layer_mask=skip_rows if use_skip else None,
                attn_impl=attn_impl,
                ring_axis="sp",
            ).astype(jnp.float32)
            from ..models.ltx_video.pipeline import guidance_combine

            combined = guidance_combine(
                pred, bl, num_conds, guidance_scale, guidance_rescale,
                stg_scale,
            )
            return S.step(carry, combined, sigma, sigma_next), None

        xs = (ts, sig[:-1], sig[1:])
        final, _ = jax.lax.scan(
            step_fn, lat.astype(jnp.float32), xs, length=n_steps
        )
        return final

    shard = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(rep, lat_spec, P(None, "dp"), P(None, "dp"),
                  P(None, None, "dp"), rope_spec, rope_spec, P(None),
                  P(None)),
        out_specs=lat_spec,
        check_vma=False,
    )
    return jax.jit(shard)(
        transformer_params, latents,
        jnp.asarray(enc4), jnp.asarray(mask3), jnp.asarray(skip3),
        rope_cos, rope_sin, sigmas, timesteps,
    )
