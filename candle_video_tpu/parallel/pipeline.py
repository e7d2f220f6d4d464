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


def shard_transformer_params_pp(params, mesh: Mesh, axis_name: str = "pp",
                                tp_axis: str | None = None):
    """Place params for PP: block stack layer-sharded, the rest replicated.

    With ``tp_axis`` (PP x TP composition on a 2-axis mesh): block q/k/v and
    ff-in weights additionally shard their output dim over ``tp_axis``, and
    to_out / ff-out their input dim — the same TP layout as
    ``mesh.transformer_shardings``.  The pipelined forward keeps ``pp``
    manual (shard_map) and leaves ``tp`` to GSPMD, which inserts the tp
    all-reduces inside each stage.
    """
    rep = NamedSharding(mesh, P())
    stage = NamedSharding(mesh, P(axis_name))

    def place(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if not keys or keys[0] != "blocks":
            return jax.device_put(leaf, rep)
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
):
    """DiT forward with the block stack pipelined over ``axis_name``.

    Semantics identical to ``transformer.forward`` (same _block math, same
    pre/post processing); requires ``num_layers % pp == 0`` and
    ``B % num_microbatches == 0``.  ``rope_cos/sin`` must be batch-shared
    (leading dim 1).
    """
    pp = mesh.shape[axis_name]
    L = cfg.num_layers
    if L % pp != 0:
        raise ValueError(f"num_layers {L} not divisible by pp={pp}")
    B = hidden_states.shape[0]
    M = num_microbatches if num_microbatches is not None else min(B, pp)
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by num_microbatches={M}")
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
    if encoder_attention_mask is not None:
        mask = encoder_attention_mask.astype(jnp.float32)
        enc_bias = ((1.0 - mask) * -10000.0)[:, None, None, :]  # [B,1,1,K]
    else:
        enc_bias = jnp.zeros((B, 1, 1, enc.shape[1]), jnp.float32)
    if skip_layer_mask is None:
        skip = jnp.zeros((L, B), jnp.float32)
    else:
        skip = jnp.asarray(skip_layer_mask, jnp.float32)

    # microbatch views: leading axis M
    def split(a):
        return a.reshape((M, mb) + a.shape[1:])

    x_mb = split(x)
    enc_mb = split(enc)
    temb_mb = split(temb6)
    bias_mb = split(enc_bias)
    skip_mb = skip.reshape(L, M, mb)

    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def inner(blocks_local, skip_local, x_mb, enc_mb, temb_mb, bias_mb, cos, sin):
        stage = jax.lax.axis_index(axis_name)

        def stage_apply(x, mb_idx):
            enc_t = jax.lax.dynamic_index_in_dim(enc_mb, mb_idx, 0, False)
            temb_t = jax.lax.dynamic_index_in_dim(temb_mb, mb_idx, 0, False)
            bias_t = jax.lax.dynamic_index_in_dim(bias_mb, mb_idx, 0, False)
            skip_t = jax.lax.dynamic_index_in_dim(skip_local, mb_idx, 1, False)

            def body(c, xs):
                bp, srow = xs
                out = TF._block(
                    bp, cfg, c, enc_t, temb_t, (cos, sin), bias_t, srow,
                    attn_impl,
                )
                return out, None

            out, _ = jax.lax.scan(body, x, (blocks_local, skip_t))
            return out

        def tick(t, carry):
            buf, outs = carry
            # stage s works on microbatch t - s during the valid window
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            first_in = jax.lax.dynamic_index_in_dim(x_mb, mb_idx, 0, False)
            inp = jnp.where(stage == 0, first_in, buf)
            y = stage_apply(inp, mb_idx)
            oidx = t - (pp - 1)
            valid = jnp.logical_and(
                stage == pp - 1, jnp.logical_and(oidx >= 0, oidx < M)
            )
            updated = jax.lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(oidx, 0, M - 1), 0
            )
            outs = jnp.where(valid, updated, outs)
            buf = jax.lax.ppermute(y, axis_name, perm)
            return buf, outs

        buf0 = jnp.zeros_like(x_mb[0])
        outs0 = jnp.zeros_like(x_mb)
        _, outs = jax.lax.fori_loop(0, M + pp - 1, tick, (buf0, outs0))
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
