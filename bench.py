"""Headline benchmark suite for the driver: 2B LTX at 512x768x97f (S=4992).

Prints one JSON line per metric; the HEADLINE (denoise step latency on the
production jitted ``lax.scan`` path) is printed LAST so the driver's tail
capture records every row:

1. t5_encode_ms_xxl_int8_128tok — FULL-SIZE T5-XXL (24L, d=4096, d_ff=10240)
   with int8 weights resident in HBM (~5.1 GiB) and dequant fused into the
   Pallas matmul (reference memory semantics, quantized_t5_encoder.rs:60-71).
2. vae_decode_ms_512x768x97f    — untiled 3D VAE decode (the reference needs
   30-60 s tiled on its 12 GB card; one v5e chip decodes untiled).
3. e2e_s_512x768x97f            — full generate(): T5-XXL int8 encode ->
   7-step distilled denoise -> untiled VAE decode -> uint8 video.
4. denoise_step_ms_2b_512x768x97f (HEADLINE) — per-step latency of the
   jitted 7-step denoise scan.

Plus, first (subprocess — needs the whole chip to itself):
0. denoise_step_ms_13b_int8_512x768x97f — the FULL 13B DiT (48L, 32x128
   heads, d=4096, ~26 GiB BF16) on ONE 16 GiB chip via weight-only int8
   (W8A16, ~12.7 GiB) with dequant fused into the Pallas matmul k-loop.
   The reference cannot run 13B on its 12 GB card at any precision —
   vs_baseline is null.

Baselines (reference docs/benchmark_results.md): denoise ~312.5 ms/step
(260 @ seq 4096 / 500 @ seq 8192 on RTX 3060, interpolated to S=4992);
VAE decode 30 s (lower bound of its 30-60 s range); e2e 35 s (lower bound
of 35-65 s).  vs_baseline = baseline / ours (>1 = faster).  T5 has no
reference GPU number (its softmax ran on the CPU) — vs_baseline is null.

Timing note: on the axon backend block_until_ready may return early and
buffer donation crashes the runtime; timing uses forced host fetches.
"""

from __future__ import annotations

import functools
import json
import os
import time

DENOISE_BASELINE_MS = 260.0 + (4992 - 4096) * (500.0 - 260.0) / (8192 - 4096)
VAE_BASELINE_MS = 30_000.0
E2E_BASELINE_S = 35.0

# persistent XLA compilation cache: amortizes the one-time remote compiles
# across driver rounds (measured 230 s -> 23 s cold-start in round 1)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/candle_video_tpu_xla"))


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
    }), flush=True)


_T0 = time.time()


def _stage(name):
    # wall-clock stage marker on stderr (diagnoses compile/tunnel overhead
    # between measurements without touching the JSON contract on stdout)
    import sys

    print(f"[bench +{time.time() - _T0:7.1f}s] {name}", file=sys.stderr,
          flush=True)


def _timed_best(fn, sync, n=3):
    out = fn()
    sync(out)
    best = float("inf")
    for _ in range(n):
        # release the previous output before re-running: holding a ~0.5 GiB
        # video across iterations pushed the T5-resident e2e peak into OOM
        out = None
        t0 = time.time()
        out = fn()
        sync(out)
        best = min(best, time.time() - t0)
    return best, out


def build_t5_int8_params(cfg):
    """Full-size T5-XXL int8 params built ON-DEVICE (deterministic fill) —
    a 5 GiB host->device transfer over the tunnel would dominate setup."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k", "n"))
    def wq(seed, k, n):
        i = jax.lax.iota(jnp.uint32, k * n).reshape(k, n)
        return ((i * jnp.uint32(2654435761) + seed) % 255).astype(jnp.int8) - 64

    @functools.partial(jax.jit, static_argnames=("k", "n"))
    def sc(k, n):
        return jnp.full((k // 32, n), 1e-4, jnp.float32)

    def qlin(seed, k, n):
        return {"w_q": wq(jnp.uint32(seed), k, n), "s": sc(k, n)}

    d, ff = cfg.d_model, cfg.d_ff
    blocks = []
    for i in range(cfg.num_layers):
        blk = {
            "attn": {
                "q": qlin(7 * i + 1, d, d),
                "k": qlin(7 * i + 2, d, d),
                "v": qlin(7 * i + 3, d, d),
                "o": qlin(7 * i + 4, d, d),
            },
            "attn_norm": {"weight": jnp.ones((d,), jnp.float32)},
            "ffn": {
                "wi_0": qlin(7 * i + 5, d, ff),
                "wi_1": qlin(7 * i + 6, d, ff),
                "wo": qlin(7 * i + 7, ff, d),
            },
            "ffn_norm": {"weight": jnp.ones((d,), jnp.float32)},
        }
        if i == 0:
            blk["attn"]["relative_attention_bias"] = jnp.zeros(
                (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32
            )
        blocks.append(blk)
    return {
        "embedding": (
            wq(jnp.uint32(99), cfg.vocab_size, d).astype(jnp.bfloat16) * 0.02
        ),
        "blocks": blocks,
        "final_norm": {"weight": jnp.ones((d,), jnp.float32)},
    }


def bench_13b_subprocess(module="benches.bench_13b"):
    """13B single-chip denoise/e2e (benches/bench_13b.py W8A16 staged-T5,
    benches/bench_13b_w4.py W4A16 resident-T5) in a SUBPROCESS: the
    8-13 GiB quantized param trees need the whole chip, so they run before
    this process touches the device and release everything on exit.
    Failure is non-fatal — the 2B suite below is the contract."""
    import subprocess
    import sys

    try:
        res = subprocess.run(
            [sys.executable, "-m", module],
            # the remote compile server's latency varies by hours-long
            # phases (measured 90 s..700 s for the same program); 1500 s
            # was enough in a fast phase and timed out in a slow one
            capture_output=True, text=True, timeout=2200, cwd=os.path.dirname(
                os.path.abspath(__file__)),
        )
        emitted = 0
        for line in res.stdout.strip().splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
                _emit(rec["metric"], float(rec["value"]), rec["unit"],
                      rec.get("vs_baseline"))
            except Exception:
                continue  # stray JSON-ish line must not drop later metrics
            emitted += 1
        if not emitted:
            raise RuntimeError(
                f"no metrics in {module} output (rc={res.returncode}): "
                f"{res.stderr.strip().splitlines()[-1] if res.stderr.strip() else ''}"
            )
    except Exception as e:  # noqa: BLE001 — bench must survive 13B hiccups
        print(f"[bench] {module} skipped: {e}", file=__import__("sys").stderr,
              flush=True)


def bench_long_subprocess():
    """Long-clip flagship (512x768x257f, S=12672 — the multi-k-block
    attention kernel + policy-streamed decode) in a SUBPROCESS: the
    257-frame video + decode stream want the whole chip.  Failure is
    non-fatal."""
    import subprocess
    import sys

    try:
        res = subprocess.run(
            [sys.executable, "-m", "benches.bench_long"],
            capture_output=True, text=True, timeout=2400,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for sl in res.stderr.splitlines():
            if sl.startswith("[bench_long") or "packed attention" in sl:
                print(f"[bench] {sl}", file=sys.stderr, flush=True)
        emitted = 0
        for line in res.stdout.strip().splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
                _emit(rec["metric"], float(rec["value"]), rec["unit"],
                      rec.get("vs_baseline"))
                emitted += 1
            except Exception:
                continue
        if not emitted:
            raise RuntimeError(
                f"no metrics in long-clip sub-bench output (rc={res.returncode}): "
                f"{res.stderr.strip().splitlines()[-1] if res.stderr.strip() else ''}"
            )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] long-clip sub-bench skipped: {e}",
              file=__import__("sys").stderr, flush=True)


def bench_coldstart_subprocess():
    """Time-to-first-frame of a fresh CLI-equivalent process at the default
    preset (512x768x97f, 7 steps) — benches/coldstart.py, run TWICE:
    the first run pays any not-yet-cached XLA compiles (coldstart_cold_s),
    the second is the warm start a repeat user sees (coldstart_s; the
    reference claims ~2 s on prebuilt CUDA binaries, README.md:57).  Runs
    BEFORE this process touches the device."""
    import subprocess
    import sys

    def relay_stages(stderr_text, tag):
        for sl in (stderr_text or "").splitlines():  # stage attribution
            if sl.startswith("[coldstart"):
                print(f"[bench {tag}] {sl}", file=sys.stderr, flush=True)

    here = os.path.dirname(os.path.abspath(__file__))
    results = []
    for tag in ("coldstart_cold_s", "coldstart_s"):
        try:
            res = subprocess.run(
                [sys.executable, "-m", "benches.coldstart"],
                capture_output=True, text=True, cwd=here,
                # the cold run compiles the whole preset through the remote
                # compiler (~400-900 s on a fresh VM); the warm run must be
                # cache-bound, so a hang there should fail fast
                timeout=2400 if tag == "coldstart_cold_s" else 1200,
            )
            # relay stage lines BEFORE parsing stdout: on a missing JSON
            # line the stages show which stage stalled (ADVICE r4)
            relay_stages(res.stderr, tag)
            line = [l for l in res.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            results.append((tag, float(json.loads(line)["elapsed_s"])))
        except subprocess.TimeoutExpired as e:
            # TimeoutExpired carries the captured output up to the kill
            relay_stages(e.stderr if isinstance(e.stderr, str) else
                         (e.stderr or b"").decode(errors="replace"), tag)
            print(f"[bench] {tag} skipped: {e}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — bench must survive
            print(f"[bench] {tag} skipped: {e}", file=sys.stderr, flush=True)
    for tag, v in results:
        _emit(tag, v, "s", None)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video import t5 as T5
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params
    from candle_video_tpu.models.ltx_video.zeros_init import zeros_transformer_params
    from candle_video_tpu.ops.rope import rope_cos_sin

    # dev iteration: CVT_BENCH_SKIP="13b,13b_w4,coldstart,long" skips the
    # subprocess sections (each needs the whole chip for 10-25 min); the
    # driver runs with it unset — all sections on.
    skip = {t.strip() for t in os.environ.get("CVT_BENCH_SKIP", "").split(",")}
    if "13b" not in skip:
        bench_13b_subprocess()  # BEFORE any device work in this process
    if "13b_w4" not in skip:
        bench_13b_subprocess("benches.bench_13b_w4")  # W4A16 resident-T5 tier
    if "coldstart" not in skip:
        bench_coldstart_subprocess()  # also pre-device (fresh-process timing)
    if "long" not in skip:
        bench_long_subprocess()  # 257f long clip — also wants the whole chip

    full = get_config_by_version("0.9.8-2b-distilled")
    cfg = full.transformer
    params = zeros_transformer_params(cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)

    def fetch(x):
        # force full device execution but transfer ONE element: the output
        # buffer must be complete before any part is readable.  (A plain
        # ``[:1]`` slices nothing on batch-1 outputs — that bug shipped a
        # full ~200-400 MB host fetch through the tunnel per measurement
        # and inflated the VAE metric ~10x.)
        leaf = jax.tree.leaves(x)[0]
        idx = tuple(0 for _ in range(leaf.ndim - 1)) + (slice(0, 1),)
        np.asarray(leaf[idx])

    _stage("setup: configs + zeros DiT done")
    # ---- 1. untiled VAE decode (before the 5 GiB encoder is resident —
    # untiled 512x768x97f decode peaks ~9 GiB of activations) ----------------------------------------------
    vcfg = V.LtxVaeConfig()
    vae_params = init_vae_params(jax.random.PRNGKey(0), vcfg, jnp.bfloat16)
    _stage("vae params built")
    f, h, w = 13, 16, 24  # 512x768x97f latents -> S=4992
    z = jnp.asarray(rng.normal(size=(1, 128, f, h, w)) * 0.3, jnp.bfloat16)
    temb = jnp.asarray([0.05], jnp.float32)
    dec = jax.jit(functools.partial(V.decoder_forward, cfg=vcfg))
    vae_s, _ = _timed_best(
        lambda: dec(vae_params["decoder"], z=z, temb=temb), fetch
    )
    _stage("vae decode measured")
    _emit("vae_decode_ms_512x768x97f", vae_s * 1000.0,
          "ms", VAE_BASELINE_MS / (vae_s * 1000.0))

    # ---- 1b. VAE encode (parity-tested path, first perf record) ------------
    # BEFORE the 5.1 GiB T5 is resident: the untiled encode peaks ~9 GiB of
    # activations (the round-5 first cut ran it after e2e with everything
    # resident and RESOURCE_EXHAUSTED'd the chip).  UNTILED is the TPU
    # production path (same argument as decode — the reference must tile at
    # this size on 12 GB, vae.rs:1426-1467; one v5e fits it whole), on the
    # round-5 channels-last encoder (907 ms vs 1187 NCDHW vs 1843 tiled).
    x97 = jnp.asarray(rng.normal(size=(1, 3, 97, 512, 768)) * 0.5, jnp.bfloat16)
    try:
        enc_s, _ = _timed_best(
            lambda: V.encode(vae_params, vcfg, x97, use_tiling=False), fetch
        )
        _stage("vae encode measured")
        _emit("vae_encode_ms_512x768x97f", enc_s * 1000.0, "ms", None)
    except Exception as e:  # noqa: BLE001 — encode metric must not kill later rows
        print(f"[bench] vae encode skipped: {e}", file=__import__("sys").stderr,
              flush=True)
    x97 = None

    # ---- 2. full-size T5-XXL int8 encode -----------------------------------
    t5_cfg = T5.t5_xxl()
    t5_params = build_t5_int8_params(t5_cfg)
    _stage("t5 params built")
    t5_bytes = sum(x.nbytes for x in jax.tree.leaves(t5_params))
    ids = jnp.asarray(rng.integers(0, t5_cfg.vocab_size, size=(1, 128)), jnp.int32)
    pos_bias = T5.position_bias(t5_params, t5_cfg, 128)
    t5_fwd = jax.jit(lambda p, i, b: T5.forward(p, t5_cfg, i, pos_bias=b))
    t5_s, embeds = _timed_best(lambda: t5_fwd(t5_params, ids, pos_bias), fetch)
    _stage("t5 encode measured")
    _emit("t5_encode_ms_xxl_int8_128tok", t5_s * 1000.0, "ms", None)
    _emit("t5_hbm_gib_xxl_int8", t5_bytes / 2**30, "GiB", None)

    # ---- 3. end-to-end generate(): T5 -> denoise -> decode -> uint8 --------
    pipe = P.LtxPipeline(
        config=full,
        transformer_params=params,
        vae_params=vae_params,
        t5_params=t5_params,
        t5_config=t5_cfg,
        tokenizer=None,
    )
    mask = jnp.ones((1, 128), jnp.float32)

    def e2e():
        # T5-XXL int8 stays RESIDENT through the whole generation (reference
        # semantics: the GGUF encoder lives in device memory).  The decode
        # runs UNTILED with the exact STREAMING tail (2 overlap-save chunks,
        # zero recompute — 29 ms faster than the halo-chunked tail it
        # replaces and a lower peak: per-chunk ~50 frames vs halo's 74), so
        # 5.1 GiB T5 + 3.9 GiB DiT + the full-frame decode fit the 16 GiB
        # chip together (round-2 had to fall back to tiled decode, ~1.5 s
        # slower).
        emb = t5_fwd(t5_params, ids, pos_bias)
        return P.generate(
            pipe,
            prompt_embeds=emb,
            prompt_attention_mask=mask,
            height=512,
            width=768,
            num_frames=97,
            output_type="tensor",
            use_pcg_rng=False,
            vae_tail_stream_chunks=2,
        )

    e2e_s, video = _timed_best(e2e, fetch, n=2)
    assert video.shape[0] == 1 and 512 in video.shape and 768 in video.shape, (
        video.shape
    )
    _stage("e2e measured")
    _emit("e2e_s_512x768x97f", e2e_s, "s", E2E_BASELINE_S / e2e_s)
    video = None

    # ---- free the 5.1 GiB T5 before the i2v/serving/headline sections ------
    # (keeping it resident through i2v + serving RESOURCE_EXHAUSTED the chip
    # on the round-5 first cut: each section compiles fresh executables whose
    # workspaces stack on top of DiT + VAE + T5).  The embeds are tiny;
    # i2v/serving consume them precomputed — their timings cover denoise +
    # decode (+ anchor encode for i2v), not the 37 ms T5 encode.
    embeds = t5_fwd(t5_params, ids, pos_bias)
    jax.block_until_ready(embeds)
    pipe.t5_params = None
    t5_params = None
    t5_fwd = None
    _stage("t5 freed (embeds kept)")

    # ---- 3c. i2v e2e: one image anchor on the first latent frame ------------
    def e2e_i2v():
        img = jnp.asarray(rng.normal(size=(1, 3, 512, 768)) * 0.5, jnp.float32)
        return P.generate(
            pipe,
            prompt_embeds=embeds,
            prompt_attention_mask=mask,
            image=img,
            height=512, width=768, num_frames=97,
            output_type="tensor",
            use_pcg_rng=False,
            vae_tail_stream_chunks=2,
        )

    try:
        i2v_s, vid2 = _timed_best(e2e_i2v, fetch, n=2)
        assert vid2.shape[0] == 1 and 512 in vid2.shape, vid2.shape
        vid2 = None
        _stage("i2v e2e measured")
        _emit("e2e_i2v_s_512x768x97f", i2v_s, "s", None)
    except Exception as e:  # noqa: BLE001
        print(f"[bench] i2v e2e skipped: {e}", file=__import__("sys").stderr,
              flush=True)

    # ---- 3d. serving throughput/latency (beyond the reference) -------------
    try:
        from benches import serving_bench

        serving_bench.run(pipe, embeds, mask,
                          n_requests=4, max_batch=2, emit=print)
        _stage("serving measured")
    except Exception as e:  # noqa: BLE001
        print(f"[bench] serving bench skipped: {e}",
              file=__import__("sys").stderr, flush=True)

    # ---- 4. HEADLINE: production denoise scan -------------------------------
    s = f * h * w
    latents = jnp.asarray(rng.normal(size=(1, s, cfg.in_channels)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 128, cfg.caption_channels)) * 0.02,
                      jnp.float32)
    coords = P.build_video_coords(f, h, w, frame_rate=25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [cfg.rope_base_num_frames, cfg.rope_base_height, cfg.rope_base_width],
        jnp.float32,
    )
    cos, sin = rope_cos_sin(grid, cfg.inner_dim, cfg.rope_theta)
    sch = S.set_timesteps(
        full.scheduler, num_inference_steps=7,
        sigmas=list(full.inference.timesteps), mu=0.0,
    )
    skip = jnp.zeros((cfg.num_layers, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    n_steps = sch.timesteps.shape[0]

    # split rope layout: same fast path generate() takes on TPU
    rope_split = None
    run_params = params
    if P._use_split_rope(pipe, cfg, s, "auto"):
        from candle_video_tpu.ops.rope import rope_split_tables

        rope_split = rope_split_tables(cos, sin)
        run_params = pipe.split_rope_params()

    def run():
        return P.denoise_loop(
            run_params, cfg, latents, enc, mask,
            sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            skip, key, num_conds=1, attn_impl="auto",
            rope_split=rope_split,
        )

    step_s, _ = _timed_best(run, fetch)
    step_ms = step_s / n_steps * 1000.0
    _stage("denoise measured")
    _emit("denoise_step_ms_2b_512x768x97f", step_ms,
          "ms/step", DENOISE_BASELINE_MS / step_ms)


if __name__ == "__main__":
    main()
