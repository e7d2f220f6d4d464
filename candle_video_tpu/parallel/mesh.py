"""Device-mesh scale-out: tensor-parallel DiT over ICI.

The reference declares an NCCL feature but never uses it (Cargo.toml:57,
zero call sites — SURVEY.md §2.3); multi-chip is this framework's new
capability.  Design:

- one ``Mesh(('dp', 'tp'))`` covers both models: the 2B runs replicated
  (tp=1) on one chip, the 13B (48 layers, 32 heads x 128) shards attention
  heads and the FF hidden dim over ``tp``,
- weights are annotated with NamedShardings and placed once; GSPMD inserts
  the collectives (all-gather for the full-inner-dim QK-RMSNorm/RoPE,
  reduce-scatter after to_out/net_2),
- the batch axis (CFG rows x videos) shards over ``dp``.

Validated on a virtual 8-device CPU mesh in tests and via
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Mesh over (dp, tp) or (dp, sp) — tp shards weights (attention heads
    + FF hidden), sp shards the video-token sequence (ring attention,
    parallel/sequence.py).  tp and sp are mutually exclusive axes of the
    same physical ring in this build; compose either with dp."""
    devices = devices if devices is not None else jax.devices()
    if tp > 1 and sp > 1:
        raise ValueError(
            "tp and sp cannot be combined in one mesh (weight sharding "
            "inside the ring shard_map is not wired); use dp x tp or dp x sp"
        )
    need = dp * tp * sp
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for dp={dp}, tp={tp}, sp={sp}; "
            f"have {len(devices)}"
        )
    if sp > 1:
        arr = np.asarray(devices[:need]).reshape(dp, sp)
        return Mesh(arr, axis_names=("dp", "sp"))
    arr = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def transformer_shardings(mesh: Mesh):
    """NamedSharding pytree matching the stacked-block transformer params.

    Layout (weights are [in, out]; blocks carry a leading layer axis L):
    - to_q/to_k/to_v: output (head) dim over tp  -> [L, D, D@tp]
    - to_out:        input (head) dim over tp    -> [L, D@tp, D]
    - ff net_0_proj: hidden dim over tp          -> [L, D, 4D@tp]
    - ff net_2:      hidden dim over tp          -> [L, 4D@tp, D]
    - everything else replicated.
    """

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    col = {"weight": ns(None, None, "tp"), "bias": ns(None, "tp")}
    row = {"weight": ns(None, "tp", None), "bias": ns(None, None)}
    rep_l = {"weight": ns(None, None)}  # [L, D] norms
    rep_lin = {"weight": ns(None, None), "bias": ns(None)}

    def attn():
        return {
            "norm_q": dict(rep_l),
            "norm_k": dict(rep_l),
            "to_q": dict(col),
            "to_k": dict(col),
            "to_v": dict(col),
            "to_out": dict(row),
        }

    blocks = {
        "attn1": attn(),
        "attn2": attn(),
        "ff": {"net_0_proj": dict(col), "net_2": dict(row)},
        "scale_shift_table": ns(None, None, None),
    }

    return {
        "proj_in": dict(rep_lin),
        "time_embed": {
            "emb": {
                "timestep_embedder": {
                    "linear_1": dict(rep_lin),
                    "linear_2": dict(rep_lin),
                }
            },
            "linear": dict(rep_lin),
        },
        "caption_projection": {
            "linear_1": dict(rep_lin),
            "linear_2": dict(rep_lin),
        },
        "blocks": blocks,
        "scale_shift_table": ns(None, None),
        "proj_out": dict(rep_lin),
    }


def _prune_missing(shardings, params):
    """Drop sharding entries whose param is absent (e.g. bias-less linears)."""
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            if k not in shardings:
                if k in ("w8", "w8_scale", "weight_q", "scale"):
                    raise ValueError(
                        f"no TP sharding rule for quantized param leaf "
                        f"{k!r}: int8 trees are a SINGLE-CHIP capacity "
                        "path; with 2+ chips the BF16 tree already fits "
                        "sharded (13 GiB/chip at tp=2) and runs ~10% "
                        "faster than int8 dequant. Load dense params for "
                        "multi-chip meshes."
                    )
                raise ValueError(f"no TP sharding rule for param leaf {k!r}")
            out[k] = _prune_missing(shardings[k], v)
        return out
    return shardings


def shard_transformer_params(params, mesh: Mesh):
    """Place transformer params onto the mesh with TP shardings."""
    sh = _prune_missing(transformer_shardings(mesh), params)
    return jax.device_put(params, sh)


def shard_batch(x, mesh: Mesh, axis: int = 0):
    """Shard a batched array over the dp axis."""
    spec = [None] * x.ndim
    spec[axis] = "dp"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
