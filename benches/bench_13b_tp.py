"""13B BF16 multi-chip (tp=2/4) per-chip step time: measured compute proxy
+ explicit ICI collective model, on ONE real chip.

Only one chip is reachable through this tunnel, so the tp=N per-chip step
time is split into its two components:

1. COMPUTE (measured): under the TP layout (parallel/mesh.py — heads + FF
   hidden sharded, residual stream replicated) each chip executes exactly
   1/N of every block's FLOPs with the block structure unchanged.  A
   DEPTH-SLICED model (48/N full-width layers) has identical per-op shapes
   and identical total per-chip FLOPs, and — unlike a width-sliced proxy —
   every matmul keeps the production [4096 x 4096]/[4096 x 16384] MXU
   tiling.  We run the production denoise scan (7 distilled steps, packed
   attention kernel, split-rope) on 24 and 12 full-width layers in BF16.
   Small systematic optimism: the proxy's attention runs 32 heads on 1/N
   of the layers instead of 32/N heads on all layers (same FLOPs, larger
   kernel grids), and QK-norm/RoPE run 1/N as often while TP replicates
   them per layer (<2% of step time).

2. COMMUNICATION (modeled, stated, not hidden): the TP layout needs one
   all-reduce of the [B, S, D] residual after to_out and one after net_2
   (GSPMD lowers the pair to reduce-scatter + all-gather) — 48 layers x 2
   tensors x [1, 4992, 4096] bf16 = 40.9 MB each.  A ring all-reduce moves
   2(N-1)/N x V bytes per chip: 3.93 GB/step at tp=2.  At v5e's published
   1600 Gbps (200 GB/s) aggregate ICI per chip that is ~20 ms/step fully
   exposed, ~0 fully overlapped (XLA's latency-hiding scheduler overlaps
   collectives with the next block's matmuls); both bounds are printed.

Memory: a tp=2 shard of the 13B BF16 tree is ~13.1 GiB/chip (+ scan
activations) — the depth-24 proxy materializes exactly that footprint, so
this bench doubles as the capacity proof for BF16-sharded 13B.

Run: python -m benches.bench_13b_tp   (one JSON line per metric)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/candle_video_tpu_xla"),
)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

T0 = time.perf_counter()


def log(msg):
    print(f"[13b-tp +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


# ICI model constants (stated openly; see module docstring)
S_TOKENS = 4992
D_MODEL = 4096
N_LAYERS_FULL = 48
ICI_GBPS = 200.0  # v5e published aggregate 1600 Gbps per chip


def comm_model_ms(tp: int, batch_rows: int = 1) -> float:
    """Fully-exposed ring all-reduce time per denoise step, ms."""
    v = batch_rows * S_TOKENS * D_MODEL * 2  # bf16 bytes
    per_chip = 2 * (tp - 1) / tp * v
    total = N_LAYERS_FULL * 2 * per_chip  # 2 all-reduces per layer
    return total / (ICI_GBPS * 1e9) * 1e3


def main():
    from candle_video_tpu.models.ltx_video import configs as C
    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video.zeros_init import (
        zeros_transformer_params,
    )
    from candle_video_tpu.ops.pallas.flash_attention_packed import packed_viable
    from candle_video_tpu.ops.rope import rope_cos_sin, rope_split_tables

    full = C.v0_9_8_distilled_13b()
    base = full.transformer
    f, h, w = 13, 16, 24
    s = f * h * w
    assert s == S_TOKENS and base.inner_dim == D_MODEL
    assert base.num_layers == N_LAYERS_FULL

    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(1, s, base.in_channels)),
                          jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 128, base.caption_channels)) * 0.02,
                      jnp.float32)
    mask = jnp.ones((1, 128), jnp.float32)
    coords = P.build_video_coords(f, h, w, frame_rate=25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [base.rope_base_num_frames, base.rope_base_height,
         base.rope_base_width], jnp.float32,
    )
    cos, sin = rope_cos_sin(grid, base.inner_dim, base.rope_theta)
    sch = S.set_timesteps(full.scheduler, num_inference_steps=7, mu=0.0)
    key = jax.random.PRNGKey(0)
    n_steps = int(sch.timesteps.shape[0])

    use_split = (
        jax.devices()[0].platform in ("tpu", "axon")
        and packed_viable(s, s, base.num_attention_heads,
                          base.attention_head_dim)
    )
    rope_split = rope_split_tables(cos, sin) if use_split else None

    for tp in (2, 4):
        n_layers = N_LAYERS_FULL // tp
        cfg = __import__("dataclasses").replace(base, num_layers=n_layers)
        params = zeros_transformer_params(cfg, jnp.bfloat16)
        jax.block_until_ready(params)
        nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
        log(f"tp={tp} proxy: {n_layers} full-width layers, "
            f"{nbytes / 2**30:.2f} GiB/chip resident")
        skip = jnp.zeros((cfg.num_layers, 1), jnp.float32)

        run_params = (
            TF.permute_params_rope_split(params, cfg) if use_split else params
        )
        params = None

        def run():
            return P.denoise_loop(
                run_params, cfg, latents, enc, mask,
                sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
                jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
                skip, key, num_conds=1, attn_impl="auto",
                rope_split=rope_split,
            )

        out = run()
        np.asarray(out[0, 0, 0])
        log(f"tp={tp} proxy compiled + first run done")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            np.asarray(out[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        compute_ms = best / n_steps * 1000.0
        comm_ms = comm_model_ms(tp)
        log(f"tp={tp}: per-chip compute {compute_ms:.1f} ms/step, modeled "
            f"ICI {comm_ms:.1f} ms/step exposed (0 overlapped)")
        print(json.dumps({
            "metric": f"denoise_step_ms_13b_bf16_tp{tp}_projected",
            "value": round(compute_ms + comm_ms, 1),
            "unit": "ms/step",
            "vs_baseline": None,
            "compute_measured_ms": round(compute_ms, 1),
            "ici_modeled_ms_exposed": round(comm_ms, 1),
            "note": "compute measured on one chip via depth-sliced proxy "
                    f"({n_layers} full-width layers = per-chip FLOPs of "
                    f"tp={tp}); ICI modeled at 200 GB/s, 0 if overlapped",
        }), flush=True)
        run_params = out = None

    print(json.dumps({
        "metric": "hbm_gib_13b_bf16_tp2_per_chip",
        "value": round(
            (N_LAYERS_FULL // 2) * (12 * D_MODEL * D_MODEL + 2 * D_MODEL * 4
                                    * D_MODEL) * 2 / 2**30, 1),
        "unit": "GiB",
        "vs_baseline": None,
    }), flush=True)


if __name__ == "__main__":
    main()
