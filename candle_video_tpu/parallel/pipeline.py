"""Pipeline parallelism (GPipe-style) for the DiT block stack.

The reference has no inter-device parallelism at all (NCCL is a dead feature
flag — SURVEY.md §2.3); TP in `parallel/mesh.py` is the primary 13B scale-out.
PP is the complementary option for meshes where TP alone would be ICI-bound
(docs/roadmap.md): the 48-layer block stack is split into ``pp`` contiguous
stages, the stacked block params' leading layer axis is sharded over the
``pp`` mesh axis, and microbatches stream through the stages inside one
``shard_map`` with ``lax.ppermute`` rotating activations stage-to-stage.

TPU-first design:
- the per-stage compute is the SAME stacked-``lax.scan`` block loop as the
  single-chip path (``transformer._block``), so numerics match the unsharded
  forward exactly — there is no separate "pipeline" implementation of the
  math;
- the schedule is the classic GPipe fill/steady/drain loop of
  ``M + pp - 1`` ticks for M microbatches; each tick every stage computes on
  its current activation buffer and then ``ppermute``s it to the next stage.
  The permute of tick t is independent of tick t+1's compute, so XLA's
  latency-hiding scheduler overlaps communication with the block math;
- everything outside the block stack (proj_in, caption projection, AdaLN
  timestep embedding, final modulation, proj_out) is tiny and runs
  replicated outside the ``shard_map``.

Bubble fraction is (pp-1)/(M+pp-1); CFG batching (uncond/cond/perturbed
rows) plus multi-video batches supply the microbatches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ltx_video import transformer as TF


def make_pipeline_mesh(pp: int, devices=None) -> Mesh:
    """A 1-axis ('pp',) mesh of ``pp`` stages."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < pp:
        raise ValueError(f"need {pp} devices for pp={pp}; have {len(devices)}")
    return Mesh(np.asarray(devices[:pp]), axis_names=("pp",))


def interleave_layer_order(num_layers: int, pp: int, interleave: int) -> np.ndarray:
    """Layer permutation for the interleaved (virtual-stage) schedule.

    With ``v = interleave`` virtual chunks per device, virtual stage
    ``vs = c*pp + s`` (chunk c, device s) owns layers
    ``[vs*Lc, (vs+1)*Lc)``.  The stacked layer axis is reordered so device
    s's contiguous shard holds its v chunks back to back:
    position ``s*(v*Lc) + c*Lc + l`` <- layer ``(c*pp + s)*Lc + l``.
    """
    lc = num_layers // (pp * interleave)
    order = np.empty(num_layers, np.int64)
    pos = 0
    for s in range(pp):
        for c in range(interleave):
            vs = c * pp + s
            order[pos : pos + lc] = np.arange(vs * lc, (vs + 1) * lc)
            pos += lc
    return order


def shard_transformer_params_pp(params, mesh: Mesh, axis_name: str = "pp",
                                tp_axis: str | None = None,
                                interleave: int = 1):
    """Place params for PP: block stack layer-sharded, the rest replicated.

    With ``tp_axis`` (PP x TP composition on a 2-axis mesh): block q/k/v and
    ff-in weights additionally shard their output dim over ``tp_axis``, and
    to_out / ff-out their input dim — the same TP layout as
    ``mesh.transformer_shardings``.  The pipelined forward keeps ``pp``
    manual (shard_map) and leaves ``tp`` to GSPMD, which inserts the tp
    all-reduces inside each stage.

    ``interleave`` > 1 reorders the layer axis so each device owns
    ``interleave`` non-contiguous chunks of the stack (virtual stages) —
    required by ``pipeline_transformer_forward(..., interleave=v)``.
    """
    rep = NamedSharding(mesh, P())
    stage = NamedSharding(mesh, P(axis_name))
    pp = mesh.shape[axis_name]
    order = None
    if interleave > 1:
        import numpy as _np

        ncfg_layers = None
        for leaf in jax.tree_util.tree_leaves(params["blocks"]):
            ncfg_layers = leaf.shape[0]
            break
        order = _np.asarray(interleave_layer_order(ncfg_layers, pp, interleave))

    def place(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if not keys or keys[0] != "blocks":
            return jax.device_put(leaf, rep)
        if order is not None:
            leaf = jnp.take(leaf, order, axis=0)
        if tp_axis is not None:
            if any(k in keys for k in ("to_q", "to_k", "to_v", "net_0_proj")):
                spec = (
                    P(axis_name, None, tp_axis)
                    if leaf.ndim == 3
                    else P(axis_name, tp_axis)
                )
                return jax.device_put(leaf, NamedSharding(mesh, spec))
            if any(k in keys for k in ("to_out", "net_2")):
                spec = (
                    P(axis_name, tp_axis, None)
                    if leaf.ndim == 3
                    else P(axis_name)
                )
                return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, stage)

    return jax.tree_util.tree_map_with_path(place, params)


def schedule_ticks(pp: int, num_microbatches: int, interleave: int = 1) -> dict:
    """Analytic schedule accounting (per-microbatch work normalized to 1).

    GPipe (interleave=1): M + pp - 1 ticks of a FULL per-device stage
    (L/pp layers) -> time = (M + pp - 1) * (L/pp); bubble (pp-1)/(M+pp-1).
    Interleaved: M + v*pp - 1 ticks of a 1/v stage (L/(v*pp) layers) ->
    time = (M + v*pp - 1) * L/(v*pp) = (M/v + pp - 1/v) * (L/pp) — the
    fill/drain cost shrinks by v.  Requires M <= pp (conflict-free naive
    interleaving).
    """
    m, v = num_microbatches, interleave
    ticks = m + v * pp - 1
    time_units = ticks / v  # in full-stage (L/pp-layer) units
    ideal = m  # M full-stage units of real work per device
    return {
        "ticks": ticks,
        "time_stage_units": time_units,
        "bubble_fraction": (time_units - ideal) / time_units,
    }


def pipeline_transformer_forward(
    params,
    cfg: TF.LtxTransformerConfig,
    hidden_states,  # [B, S, in_channels]
    encoder_hidden_states,  # [B, K, caption_channels]
    timestep,  # [B] f32
    rope_cos,  # [1, S, inner_dim] (shared across the batch)
    rope_sin,
    mesh: Mesh,
    axis_name: str = "pp",
    num_microbatches: int | None = None,
    encoder_attention_mask=None,  # [B, K]
    skip_layer_mask=None,  # [L, B], 1 = skip
    attn_impl: str = "xla",
    interleave: int = 1,
):
    """DiT forward with the block stack pipelined over ``axis_name``.

    Semantics identical to ``transformer.forward`` (same _block math, same
    pre/post processing); requires ``num_layers % pp == 0`` and
    ``B % num_microbatches == 0``.  ``rope_cos/sin`` must be batch-shared
    (leading dim 1).

    ``interleave=v`` runs the interleaved virtual-stage schedule: each
    device owns v non-contiguous chunks of the stack (params must be placed
    with ``shard_transformer_params_pp(..., interleave=v)``); ticks are
    1/v-sized, shrinking the fill/drain bubble from (pp-1)/(M+pp-1) to
    ~((pp-1)/v)/(M+pp-1/v) — see ``schedule_ticks``.  Requires M <= pp
    (conflict-free naive interleaving) and num_layers % (pp*v) == 0.
    """
    pp = mesh.shape[axis_name]
    v = int(interleave)
    L = cfg.num_layers
    if L % (pp * v) != 0:
        raise ValueError(f"num_layers {L} not divisible by pp*v={pp * v}")
    B = hidden_states.shape[0]
    M = num_microbatches if num_microbatches is not None else min(B, pp)
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by num_microbatches={M}")
    if v > 1 and M > pp:
        raise ValueError(
            f"interleave={v} needs num_microbatches<={pp} (got {M})"
        )
    if rope_cos.shape[0] != 1 or rope_sin.shape[0] != 1:
        raise ValueError("pipeline forward needs batch-shared rope tables "
                         "(leading dim 1)")
    mb = B // M

    # --- replicated pre-block compute (identical to transformer.forward) ---
    dtype = params["proj_in"]["weight"].dtype
    x = TF._apply_linear(params["proj_in"], hidden_states.astype(dtype))
    enc = TF._apply_linear(
        params["caption_projection"]["linear_2"],
        TF.gelu_tanh(
            TF._apply_linear(
                params["caption_projection"]["linear_1"],
                encoder_hidden_states.astype(dtype),
            )
        ),
    )
    temb6, embedded_timestep = TF._timestep_embedding(
        params["time_embed"], timestep.reshape(-1).astype(jnp.float32), dtype
    )
    # _block consumes [B, T, 6D]; PP carries scalar timesteps only (T=1)
    temb6 = temb6.reshape(B, 1, temb6.shape[-1])
    if encoder_attention_mask is not None:
        mask = encoder_attention_mask.astype(jnp.float32)
        enc_bias = ((1.0 - mask) * -10000.0)[:, None, None, :]  # [B,1,1,K]
    else:
        enc_bias = jnp.zeros((B, 1, 1, enc.shape[1]), jnp.float32)
    if skip_layer_mask is None:
        skip = jnp.zeros((L, B), jnp.float32)
    else:
        skip = jnp.asarray(skip_layer_mask, jnp.float32)
    if v > 1:
        # the block stack was layer-permuted for the interleaved placement
        # (shard_transformer_params_pp(interleave=v)); the per-layer skip
        # mask must follow the same order
        skip = skip[jnp.asarray(interleave_layer_order(L, pp, v))]

    # microbatch views: leading axis M
    def split(a):
        return a.reshape((M, mb) + a.shape[1:])

    x_mb = split(x)
    enc_mb = split(enc)
    temb_mb = split(temb6)
    bias_mb = split(enc_bias)
    skip_mb = skip.reshape(L, M, mb)

    perm = [(i, (i + 1) % pp) for i in range(pp)]
    lc = L // (pp * v)  # layers per chunk (per virtual stage)

    def inner(blocks_local, skip_local, x_mb, enc_mb, temb_mb, bias_mb, cos, sin):
        stage = jax.lax.axis_index(axis_name)

        # device-local stack [L/pp, ...] viewed as v chunks of lc layers
        blocks_r = jax.tree_util.tree_map(
            lambda a: a.reshape((v, lc) + a.shape[1:]), blocks_local
        )
        skip_r = skip_local.reshape((v, lc) + skip_local.shape[1:])

        def chunk_apply(chunk_idx, x, mb_idx):
            enc_t = jax.lax.dynamic_index_in_dim(enc_mb, mb_idx, 0, False)
            temb_t = jax.lax.dynamic_index_in_dim(temb_mb, mb_idx, 0, False)
            bias_t = jax.lax.dynamic_index_in_dim(bias_mb, mb_idx, 0, False)

            def body(c, xs):
                bp, srow = xs
                out = TF._block(
                    bp, cfg, c, enc_t, temb_t, (cos, sin), bias_t, srow,
                    attn_impl,
                )
                return out, None

            def make_branch(ci):
                def branch(x):
                    bl = jax.tree_util.tree_map(lambda a: a[ci], blocks_r)
                    sk = jax.lax.dynamic_index_in_dim(skip_r[ci], mb_idx, 1, False)
                    out, _ = jax.lax.scan(body, x, (bl, sk))
                    return out

                return branch

            if v == 1:
                return make_branch(0)(x)
            return jax.lax.switch(chunk_idx, [make_branch(ci) for ci in range(v)], x)

        def tick(t, carry):
            buf, outs = carry
            # device s at tick t runs the unique chunk c with
            # microbatch m = t - s - c*pp in [0, M)  (unique since M <= pp)
            cand = t - stage - jnp.arange(v) * pp
            valid_c = jnp.logical_and(cand >= 0, cand < M)
            c = jnp.argmax(valid_c)
            mb_idx = jnp.clip(t - stage - c * pp, 0, M - 1)
            first_in = jax.lax.dynamic_index_in_dim(x_mb, mb_idx, 0, False)
            inp = jnp.where(jnp.logical_and(stage == 0, c == 0), first_in, buf)
            y = chunk_apply(c, inp, mb_idx)
            valid = jnp.logical_and(
                jnp.logical_and(stage == pp - 1, c == v - 1),
                jnp.any(valid_c),
            )
            updated = jax.lax.dynamic_update_index_in_dim(outs, y, mb_idx, 0)
            outs = jnp.where(valid, updated, outs)
            buf = jax.lax.ppermute(y, axis_name, perm)
            return buf, outs

        buf0 = jnp.zeros_like(x_mb[0])
        outs0 = jnp.zeros_like(x_mb)
        _, outs = jax.lax.fori_loop(0, M + v * pp - 1, tick, (buf0, outs0))
        # only the last stage holds real outputs; zero elsewhere and
        # all-reduce to replicate (validation path; production would keep
        # the result on the last stage and reduce-scatter into the decode)
        outs = jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis_name)

    # manual ONLY over the pp axis: any other mesh axes (e.g. 'tp') stay
    # under GSPMD, so tp-sharded block params keep their sharding inside
    # each stage and XLA inserts the tp collectives (PP x TP composition)
    shard = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        axis_names=frozenset({axis_name}),
        check_vma=False,
    )
    out = shard(
        params["blocks"], skip_mb, x_mb, enc_mb, temb_mb, bias_mb,
        rope_cos, rope_sin,
    )
    x = out.reshape((B,) + out.shape[2:])

    # --- replicated post-block compute (identical to transformer.forward) ---
    table = params["scale_shift_table"].astype(embedded_timestep.dtype)
    scale_shift = table[None] + embedded_timestep[:, None, :]
    shift, scale = scale_shift[:, 0, None, :], scale_shift[:, 1, None, :]
    x = TF.layer_norm(x, eps=1e-6)
    x = x * (1.0 + scale) + shift
    return TF._apply_linear(params["proj_out"], x)


# ---------------------------------------------------------------------------
# PP as a real pipeline mode: the full denoise scan under PP
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _build_pp_denoise(cfg, mesh, axis_name, num_conds, stochastic, attn_impl,
                      use_skip, num_microbatches, interleave):
    """Compile-once denoise scan whose transformer forward is pipelined.

    Numerics are identical to models.pipeline.denoise_loop: same
    guidance_combine, same scheduler step; only the DiT forward inside the
    scan runs under the PP schedule."""
    from ..models.ltx_video import pipeline as MP
    from ..models.ltx_video import scheduler as S

    @jax.jit
    def loop(params, latents, enc_states, enc_mask, sigmas, timesteps,
             rope_cos, rope_sin, guidance_scale, guidance_rescale, stg_scale,
             skip_layer_mask, noise_key):
        b = latents.shape[0]
        n_steps = timesteps.shape[0]

        def step_fn(carry, xs):
            lat, key = carry
            t, sigma, sigma_next = xs
            lat_in = jnp.tile(lat, (num_conds, 1, 1))
            timestep = jnp.full((num_conds * b,), t, jnp.float32)
            pred = pipeline_transformer_forward(
                params, cfg, lat_in, enc_states, timestep,
                rope_cos, rope_sin,
                mesh=mesh, axis_name=axis_name,
                num_microbatches=num_microbatches,
                encoder_attention_mask=enc_mask,
                skip_layer_mask=skip_layer_mask if use_skip else None,
                attn_impl=attn_impl,
                interleave=interleave,
            ).astype(jnp.float32)
            combined = MP.guidance_combine(
                pred, b, num_conds, guidance_scale, guidance_rescale, stg_scale
            )
            if stochastic:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, lat.shape, jnp.float32)
                new_lat = S.step(lat, combined, sigma, sigma_next,
                                 stochastic=True, noise=noise)
            else:
                new_lat = S.step(lat, combined, sigma, sigma_next)
            return (new_lat, key), None

        xs = (timesteps, sigmas[:-1], sigmas[1:])
        (final, _), _ = jax.lax.scan(
            step_fn, (latents.astype(jnp.float32), noise_key), xs,
            length=n_steps,
        )
        return final

    return loop


def denoise_loop_pp(
    params,  # placed with shard_transformer_params_pp(..., interleave=v)
    cfg: TF.LtxTransformerConfig,
    latents,  # [B, S, C] f32
    encoder_hidden_states,  # [num_conds*B, K, caption]
    encoder_attention_mask,  # [num_conds*B, K]
    sigmas,  # [N+1]
    timesteps,  # [N]
    rope_cos,  # [1, S, D] (batch-shared)
    rope_sin,
    guidance_scale,
    guidance_rescale,
    stg_scale,
    skip_layer_mask,  # [L, num_conds*B]
    noise_key,
    *,
    mesh: Mesh,
    axis_name: str = "pp",
    num_conds: int = 1,
    stochastic: bool = False,
    attn_impl: str = "xla",
    use_skip: bool = False,
    num_microbatches: int | None = None,
    interleave: int = 1,
):
    """Full denoising scan with the transformer pipelined over ``axis_name``
    — PP as a first-class pipeline mode, not a one-forward side module.
    The CFG/STG guidance rows (num_conds*B) are the microbatches."""
    b = latents.shape[0]
    M = num_microbatches if num_microbatches is not None else min(
        num_conds * b, mesh.shape[axis_name]
    )
    loop = _build_pp_denoise(
        cfg, mesh, axis_name, num_conds, bool(stochastic), attn_impl,
        bool(use_skip), M, int(interleave),
    )
    return loop(
        params, latents, encoder_hidden_states, encoder_attention_mask,
        jnp.asarray(sigmas, jnp.float32), jnp.asarray(timesteps, jnp.float32),
        rope_cos, rope_sin,
        jnp.float32(guidance_scale), jnp.float32(guidance_rescale),
        jnp.float32(stg_scale), jnp.asarray(skip_layer_mask, jnp.float32),
        noise_key,
    )
