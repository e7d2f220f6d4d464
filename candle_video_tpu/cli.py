"""LTX-Video text-to-video CLI.

Mirror of the reference CLI's flag surface (examples/ltx-video/
main.rs:17-107): version presets, local/unified weight resolution, prompt /
negative prompt, resolution/frames/steps/guidance knobs, precomputed
embedding + initial-latent injection, latent saving, PNG/GIF export.

Run: python -m candle_video_tpu.cli --help
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="candle-video-tpu",
        description="LTX-Video text-to-video on TPU (JAX/Pallas)",
    )
    p.add_argument("--prompt", type=str, default="A cat walking on grass")
    p.add_argument("--negative-prompt", type=str,
                   default="worst quality, inconsistent motion, blurry, jittery, distorted")
    p.add_argument("--version", type=str, default="0.9.8-2b-distilled",
                   help="preset: 0.9.5 | 0.9.6-dev | 0.9.6-distilled | "
                        "0.9.8-2b-distilled | 0.9.8-13b-dev | 0.9.8-13b-distilled")
    p.add_argument("--weights-path", type=str, default=None,
                   help="diffusers-style model dir OR unified .safetensors file")
    p.add_argument("--from-hub", action="store_true",
                   help="resolve the version's unified checkpoint from the "
                        "HuggingFace hub (examples/ltx-video/main.rs hub path)")
    p.add_argument("--t5-gguf", type=str, default=None,
                   help="GGUF file for the quantized T5-XXL encoder")
    p.add_argument("--t5-keep-quantized", action="store_true",
                   help="keep GGUF T5 weights int8 in HBM with dequant fused "
                        "into the matmul (reference memory semantics, ~5.1 vs "
                        "9.5 GiB for T5-XXL); default dequantizes once to BF16")
    p.add_argument("--dit-int8", action="store_true",
                   help="quantize the DiT block linears to weight-only int8 "
                        "(W8A16) at load, with dequant fused into the Pallas "
                        "matmul k-loop — runs the 13B model (~26 GiB BF16) on "
                        "one 16 GiB chip at ~12.7 GiB")
    p.add_argument("--dit-int4", action="store_true",
                   help="quantize the DiT block linears to weight-only int4 "
                        "(W4A16, GGUF-Q4_K-form affine group-32) at load — "
                        "~8.1 GiB at 13B, small enough for the int8 T5-XXL "
                        "to stay resident next to the DiT on a 16 GiB chip "
                        "(~2x the weight rounding of --dit-int8)")
    p.add_argument("--t5-dir", type=str, default=None,
                   help="HF text_encoder dir (safetensors, BF16 path)")
    p.add_argument("--tokenizer", type=str, default=None,
                   help="tokenizer.json path")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--num-frames", type=int, default=97)
    p.add_argument("--frame-rate", type=float, default=25.0)
    p.add_argument("--num-inference-steps", type=int, default=None)
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--guidance-rescale", type=float, default=None)
    p.add_argument("--stg-scale", type=float, default=None)
    p.add_argument("--skip-block-list", type=int, nargs="*", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-videos-per-prompt", type=int, default=1)
    p.add_argument("--output-dir", type=str, default="output")
    p.add_argument("--serve", action="store_true",
                   help="interactive serving loop: compile the "
                        "(--height/--width/--num-frames/steps) bucket once, "
                        "then read one prompt per stdin line and write "
                        "output-dir/serve_NNN.mp4 per request (GIF when no ffmpeg) "
                        "(serving.VideoGenerationServer; EOF or 'quit' ends)")
    p.add_argument("--serve-max-batch", type=int, default=1,
                   help="continuous-batching width for --serve; 1 is optimal "
                        "at chip-saturating buckets (512x768x97f on one v5e "
                        "— benchmarked in docs/benchmark_results.md), >1 "
                        "pays on small buckets")
    p.add_argument("--save-frames", action="store_true")
    p.add_argument("--gif", action="store_true")
    p.add_argument("--mp4", action="store_true", default=True)
    p.add_argument("--output-type", type=str, default="tensor",
                   choices=["tensor", "latent"])
    p.add_argument("--embeddings-file", type=str, default=None,
                   help="safetensors with prompt_embeds/prompt_attention_mask "
                        "(and negative_*) to skip the text encoder")
    p.add_argument("--initial-latents-file", type=str, default=None,
                   help="safetensors with an 'latents' tensor")
    p.add_argument("--image", type=str, action="append", default=None,
                   help="conditioning image for image/video-conditioned "
                        "generation, resized to --height x --width; "
                        "repeatable; 'path[:frame[:strength]]' places the "
                        "anchor at a latent frame index (default 0) with "
                        "strength (default 1.0) — e.g. --image a.png "
                        "--image b.png:12:0.9 for first+last interpolation")
    p.add_argument("--save-final-latents", type=str, default=None)
    p.add_argument("--max-sequence-length", type=int, default=128)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--vae-slicing", action="store_true",
                   help="decode batch elements one at a time (vae.rs slicing)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (reference --cpu flag)")
    p.add_argument("--vae-stream-chunks", type=int, default=0,
                   help="decode with the exact streaming tail in N temporal "
                        "chunks (overlap-save conv caches, zero recompute): "
                        "O(chunk) decode memory at unchunked cost")
    p.add_argument("--vae-tiling", action="store_true",
                   help="enable spatial+temporal VAE tiling (off by default: "
                        "one v5e chip decodes 512x768x97f untiled)")
    p.add_argument("--attn-impl", type=str, default="auto",
                   choices=["auto", "pallas", "xla"])
    p.add_argument("--pcg-rng", action="store_true", default=True,
                   help="use the deterministic PCG32 latent RNG (cross-impl "
                        "reproducibility with the reference)")
    p.add_argument("--progress", action="store_true",
                   help="per-step progress lines + Ctrl-C cooperative "
                        "interrupt (runs the step-wise denoise path)")
    p.add_argument("--compilation-cache", type=str,
                   default=os.path.expanduser("~/.cache/candle_video_tpu/xla"),
                   help="persistent XLA compilation cache dir ('' disables); "
                        "makes repeat cold-starts fast")
    p.add_argument("--no-decode-warmup", action="store_true",
                   help="disable the background decode-program compile that "
                        "overlaps with the denoise scan on cold starts")
    p.add_argument("--mesh", type=str, default=None,
                   help="device mesh spec: 'dp=1,tp=4' (tensor-parallel 13B), "
                        "'pp=4[,interleave=2]' (pipelined denoise), or "
                        "'sp=4[,dp=2]' (sequence-parallel ring attention — "
                        "video tokens shard over the mesh, K/V rotate via "
                        "collective-permute)")
    return p


def parse_image_spec(spec: str) -> tuple:
    """'path[:frame[:strength]]' -> (path, frame_index, strength).

    Trailing pieces count only when they parse as numbers, so paths
    containing ':' still resolve (e.g. 'C:/img.png', 'img.png:12:0.9')."""
    parts = spec.rsplit(":", 2)
    if len(parts) == 3:
        try:
            return parts[0], int(parts[1]), float(parts[2])
        except ValueError:
            pass
    if len(parts) >= 2:
        try:
            return spec.rsplit(":", 1)[0], int(parts[-1]), 1.0
        except ValueError:
            pass
    return spec, 0, 1.0


def _gen_seq_len(args, cfg) -> int:
    """Latent sequence length of the requested generation (the dispatch
    decisions — split-rope folding at load — need it before any tree exists)."""
    vae_cfg = cfg.vae
    return (
        ((args.num_frames - 1) // vae_cfg.temporal_compression_ratio + 1)
        * (args.height // vae_cfg.spatial_compression_ratio)
        * (args.width // vae_cfg.spatial_compression_ratio)
    )


def load_pipeline(args):
    import jax.numpy as jnp

    from .models.ltx_video import t5 as T5
    from .models.ltx_video import transformer as TF
    from .models.ltx_video.configs import get_config_by_version
    from .models.ltx_video.loader import (
        load_safetensors,
        load_sharded,
        transformer_params_from_state_dict,
        vae_params_from_state_dict,
    )
    from .models.ltx_video.pipeline import LtxPipeline
    from .models.ltx_video.weight_format import detect_format, split_unified_state_dict
    from .utils.tokenizer import MockTokenizer, T5TokenizerWrapper

    cfg = get_config_by_version(args.version)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.from_hub and not args.weights_path:
        from .utils.hub import resolve_weights

        args.weights_path = resolve_weights(args.version)

    tparams = vparams = None
    rope_presplit = False
    if args.weights_path:
        fmt = detect_format(args.weights_path)
        print(f"Loading weights ({fmt}): {args.weights_path}")
        if fmt == "official":
            sd = load_safetensors(args.weights_path)
            tsd, vsd = split_unified_state_dict(sd)
        else:
            tsd = load_sharded(os.path.join(args.weights_path, "transformer"))
            vsd = load_sharded(os.path.join(args.weights_path, "vae"))
        if args.dit_int8 or args.dit_int4:
            # streaming host-side quantization: the BF16 block tree (26 GiB
            # at 13B) never exists on device; fold the split-rope
            # permutation in at load (free) when the run will dispatch the
            # packed kernel
            from .models.ltx_video.loader import (
                transformer_params_w4_from_state_dict,
                transformer_params_w8_from_state_dict,
            )
            from .models.ltx_video.pipeline import split_rope_viable

            presplit = split_rope_viable(cfg.transformer,
                                         _gen_seq_len(args, cfg),
                                         args.attn_impl)
            wload = (transformer_params_w4_from_state_dict if args.dit_int4
                     else transformer_params_w8_from_state_dict)
            print(f"Loading DiT as weight-only int{4 if args.dit_int4 else 8} "
                  f"(W{4 if args.dit_int4 else 8}A16"
                  f"{', split-rope folded in' if presplit else ''})")
            tparams = wload(tsd, cfg.transformer, dtype, rope_split=presplit)
            rope_presplit = presplit
        else:
            tparams = transformer_params_from_state_dict(
                tsd, cfg.transformer, dtype
            )
        vparams = vae_params_from_state_dict(vsd, dtype)
    else:
        print("No --weights-path: using random-init models (smoke mode)")
        import jax

        if args.dit_int8 or args.dit_int4:
            # direct-quantized device init: never materializes the BF16 tree
            # (26 GiB at 13B — would not fit the chip it is meant to enable)
            init_q = TF.init_params_w4 if args.dit_int4 else TF.init_params_w8
            tparams = init_q(jax.random.PRNGKey(0), cfg.transformer,
                             dtype=dtype)
            # uniform-byte payloads are permutation-invariant: mark them
            # split-rope laid out so generate() never caches a SECOND
            # permuted copy of the q/k stacks (+1.6 GiB at 13B)
            from .models.ltx_video.pipeline import split_rope_viable

            rope_presplit = split_rope_viable(
                cfg.transformer, _gen_seq_len(args, cfg), args.attn_impl
            )
        else:
            tparams = TF.init_params(jax.random.PRNGKey(0), cfg.transformer,
                                     dtype)
        from .models.ltx_video.vae_init import init_vae_params

        vparams = init_vae_params(jax.random.PRNGKey(1), cfg.vae, dtype)

    t5_params = None
    t5_cfg = T5.t5_xxl()
    if args.t5_gguf:
        print(f"Loading GGUF T5: {args.t5_gguf}")
        t5_params = T5.params_from_gguf(
            args.t5_gguf, t5_cfg, dtype,
            keep_quantized=args.t5_keep_quantized,
            stacked=True,  # scan layout: 24x smaller HLO, fast cold start
        )
    elif args.t5_dir:
        print(f"Loading T5 dir: {args.t5_dir}")
        sd = load_sharded(args.t5_dir)
        t5_params = T5.params_from_hf_state_dict(sd, t5_cfg, dtype, stacked=True)

    if args.tokenizer:
        tokenizer = T5TokenizerWrapper(args.tokenizer, args.max_sequence_length)
    else:
        tokenizer = MockTokenizer(model_max_length=args.max_sequence_length)

    pipe = LtxPipeline(
        config=cfg,
        transformer_params=tparams,
        vae_params=vparams,
        t5_params=t5_params,
        t5_config=t5_cfg,
        tokenizer=tokenizer,
    )
    if rope_presplit:
        pipe.mark_rope_presplit()
    return pipe


def run_serve(args, pipe) -> int:
    """Interactive serving REPL over the serving runtime: the CLI-shaped
    bucket compiles ONCE at warmup (single-request program + the
    max_batch-row one when batching), then each stdin line is a request
    and each result lands as ``output_dir/serve_NNN.mp4``.  The reference
    has no serving story (one-shot CLI); this is the user-facing face of
    serving.VideoGenerationServer (shape buckets, continuous batching,
    no-starvation pending list — measured in benches/serving_bench.py)."""
    import numpy as np
    import jax.numpy as jnp

    from .serving import Request, ShapeBucket, VideoGenerationServer
    from .utils import video_io

    inf = pipe.config.inference
    steps = args.num_inference_steps or inf.num_inference_steps
    g = (args.guidance_scale if args.guidance_scale is not None
         else inf.guidance_scale)
    mock = pipe.t5_params is None or pipe.tokenizer is None
    guidance = bool(g and g > 1.0) and not mock
    bucket = ShapeBucket(args.height, args.width, args.num_frames, steps,
                         guidance)
    if mock:
        print("[serve] no T5 weights: prompts map to hash-seeded random "
              "embeddings (smoke mode — pass --t5-gguf/--t5-dir for real "
              "serving)")
    server = VideoGenerationServer(
        pipe, [bucket], max_batch=args.serve_max_batch,
        use_pcg_rng=args.pcg_rng,
        vae_tail_stream_chunks=args.vae_stream_chunks,
        attn_impl=args.attn_impl,
    )  # steps/guidance ride the bucket (server._bucket_kwargs)
    print(f"[serve] warming bucket {bucket.key()} (one-time compiles)...")
    t0 = time.time()
    server.warmup()
    print(f"[serve] warm in {time.time() - t0:.1f}s — one prompt per line "
          "(EOF or 'quit' ends)")
    server.start()
    os.makedirs(args.output_dir, exist_ok=True)
    n = 0
    try:
        for line in sys.stdin:
            prompt = line.strip()
            if prompt in ("quit", "exit"):
                break
            if not prompt:
                continue
            if mock:
                rngk = np.random.default_rng(abs(hash(prompt)) % (2 ** 32))
                cap = pipe.config.transformer.caption_channels
                req = Request(
                    prompt_embeds=jnp.asarray(
                        rngk.normal(size=(1, args.max_sequence_length, cap))
                        * 0.02, jnp.float32),
                    prompt_attention_mask=jnp.ones(
                        (1, args.max_sequence_length), jnp.float32),
                    bucket=bucket, seed=args.seed + n,
                )
            else:
                req = Request(
                    prompt=prompt,
                    negative_prompt=args.negative_prompt if guidance else None,
                    bucket=bucket, seed=args.seed + n,
                )
            t0 = time.time()
            out = server.generate_sync(req, timeout=1800)
            np.asarray(out[(0,) * out.ndim])  # forced sync (axon quirk)
            path = video_io.save_mp4(
                out, os.path.join(args.output_dir, f"serve_{n:03d}.mp4"),
                args.frame_rate,
            )
            print(f"[serve] #{n} {prompt[:48]!r} -> {path} "
                  f"({time.time() - t0:.2f}s)")
            n += 1
    except KeyboardInterrupt:
        print("\n[serve] interrupted")
    server.stop()
    print(f"[serve] served {server.stats()['served']} videos")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if (args.dit_int8 or args.dit_int4) and args.mesh:
        flag = "--dit-int4" if args.dit_int4 else "--dit-int8"
        raise SystemExit(
            f"{flag} is a single-chip capacity path and does not compose "
            "with --mesh: with 2+ chips the BF16 tree already fits sharded "
            "(13 GiB/chip at tp=2) and runs faster than quantized dequant — "
            f"drop {flag} for multi-chip runs."
        )
    if args.dit_int8 and args.dit_int4:
        raise SystemExit("--dit-int8 and --dit-int4 are mutually exclusive")
    if args.serve and args.mesh:
        raise SystemExit(
            "--serve is the single-chip serving loop and does not compose "
            "with --mesh (multi-chip serving needs multi-host routing — "
            "docs/roadmap.md)"
        )
    if args.serve and (args.image or args.output_type == "latent"):
        raise SystemExit(
            "--serve serves text prompts to video files; --image and "
            "--output-type latent go through the one-shot CLI path"
        )
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.compilation_cache:
        from .utils.compile_cache import enable_persistent_cache

        os.makedirs(args.compilation_cache, exist_ok=True)
        # gated: on the axon tunnel plugin a persistent-cache HIT hangs at
        # first execution (utils/compile_cache.py), so the helper refuses
        # to enable it there rather than wedging the repeat run
        if not enable_persistent_cache(args.compilation_cache):
            print("[cli] persistent XLA cache disabled: backend cannot "
                  "load serialized executables")
    import jax.numpy as jnp
    import numpy as np

    from .models.ltx_video.pipeline import generate
    from .utils import video_io

    print(f"candle-video-tpu | version preset {args.version}")
    print(f"devices: {jax.devices()}")

    pipe = load_pipeline(args)

    if args.serve:
        return run_serve(args, pipe)

    mesh_ctx = None
    pp_kwargs = {}
    if args.mesh:
        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        pp = int(spec.get("pp", 1))
        sp = int(spec.get("sp", 1))
        if pp > 1:
            # pipeline-parallel mode: generate() shards the block stack over
            # the 'pp' axis and runs the pipelined denoise scan
            from .parallel import make_pipeline_mesh

            pp_kwargs = dict(
                pp_mesh=make_pipeline_mesh(pp),
                pp_interleave=int(spec.get("interleave", 1)),
            )
            print(f"mesh: pp={pp} interleave={spec.get('interleave', 1)}")
        elif sp > 1:
            # sequence-parallel mode: generate() shards the video-token
            # sequence over the 'sp' axis; self-attention K/V rotate around
            # the ring via ppermute (parallel/sequence.denoise_loop_sp)
            from .parallel import make_mesh

            pp_kwargs = dict(
                sp_mesh=make_mesh(dp=int(spec.get("dp", 1)), sp=sp),
            )
            print(f"mesh: dp={spec.get('dp', 1)} sp={sp} (ring attention)")
        else:
            from .parallel import make_mesh, shard_transformer_params

            mesh_ctx = make_mesh(dp=int(spec.get("dp", 1)), tp=int(spec.get("tp", 1)))
            print(f"mesh: dp={spec.get('dp', 1)} tp={spec.get('tp', 1)}")
            with mesh_ctx:
                pipe.transformer_params = shard_transformer_params(
                    pipe.transformer_params, mesh_ctx
                )

    kwargs = {}
    if args.embeddings_file:
        from .models.ltx_video.loader import load_safetensors

        emb = load_safetensors(args.embeddings_file)
        kwargs["prompt_embeds"] = jnp.asarray(emb["prompt_embeds"])
        kwargs["prompt_attention_mask"] = jnp.asarray(emb["prompt_attention_mask"])
        if "negative_prompt_embeds" in emb:
            kwargs["negative_prompt_embeds"] = jnp.asarray(emb["negative_prompt_embeds"])
            kwargs["negative_prompt_attention_mask"] = jnp.asarray(
                emb["negative_prompt_attention_mask"]
            )
    else:
        kwargs["prompt"] = args.prompt
        kwargs["negative_prompt"] = args.negative_prompt
        if pipe.t5_params is None:
            print("WARNING: no T5 weights given; using random embeddings via mock "
                  "tokenizer (smoke mode). Pass --t5-gguf/--t5-dir or "
                  "--embeddings-file for real runs.")
            rngk = np.random.default_rng(0)
            kwargs.pop("prompt")
            kwargs.pop("negative_prompt")
            kwargs["prompt_embeds"] = jnp.asarray(
                rngk.normal(size=(1, args.max_sequence_length,
                                  pipe.config.transformer.caption_channels)) * 0.02,
                jnp.float32,
            )
            kwargs["prompt_attention_mask"] = jnp.ones(
                (1, args.max_sequence_length), jnp.float32
            )
            kwargs["negative_prompt_embeds"] = jnp.zeros_like(kwargs["prompt_embeds"])
            kwargs["negative_prompt_attention_mask"] = kwargs["prompt_attention_mask"]

    if args.initial_latents_file:
        from .models.ltx_video.loader import load_safetensors

        kwargs["latents"] = jnp.asarray(
            load_safetensors(args.initial_latents_file)["latents"]
        )

    if args.image:
        from .models.ltx_video.pipeline import ConditioningItem
        from .utils.video_io import load_image

        kwargs["conditioning"] = [
            ConditioningItem(
                image=jnp.asarray(load_image(path, args.height, args.width)),
                frame_index=frame_index, strength=strength,
            )
            for path, frame_index, strength in map(parse_image_spec, args.image)
        ]

    import contextlib

    step_callback = None
    if args.progress:
        import signal

        def _on_sigint(sig, frame):
            print("\ninterrupt requested — finishing current step...")
            pipe.interrupt = True

        signal.signal(signal.SIGINT, _on_sigint)

        def step_callback(i, n, lat):
            print(f"Step {i + 1}/{n}")

    t0 = time.time()
    with (mesh_ctx if mesh_ctx is not None else contextlib.nullcontext()):
        out = generate(
            pipe,
            height=args.height,
            width=args.width,
            num_frames=args.num_frames,
            frame_rate=args.frame_rate,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            guidance_rescale=args.guidance_rescale,
            stg_scale=args.stg_scale,
            skip_block_list=args.skip_block_list,
            num_videos_per_prompt=args.num_videos_per_prompt,
            seed=args.seed,
            output_type=args.output_type,
            max_sequence_length=args.max_sequence_length,
            use_pcg_rng=args.pcg_rng,
            attn_impl=args.attn_impl,
            use_vae_tiling=args.vae_tiling,
            use_vae_slicing=args.vae_slicing,
            vae_tail_stream_chunks=args.vae_stream_chunks,
            decode_warmup=not args.no_decode_warmup,
            step_callback=None if pp_kwargs else step_callback,
            **pp_kwargs,
            **kwargs,
        )
    import numpy as _np

    _np.asarray(out[(0,) * out.ndim])  # forced sync (axon block_until_ready quirk)
    dt = time.time() - t0
    print(f"generation took {dt:.1f}s")

    os.makedirs(args.output_dir, exist_ok=True)
    if args.output_type == "latent" or args.save_final_latents:
        import numpy as np
        from safetensors.numpy import save_file

        path = args.save_final_latents or os.path.join(args.output_dir, "latents.safetensors")
        save_file({"latents": np.asarray(out, np.float32)}, path)
        print(f"saved latents: {path}")
        if args.output_type == "latent":
            return 0

    if args.save_frames:
        paths = video_io.save_frames_png(out, args.output_dir)
        print(f"saved {len(paths)} PNG frames to {args.output_dir}")
    if args.gif:
        path = video_io.save_gif(out, os.path.join(args.output_dir, "video.gif"),
                                 args.frame_rate)
        print(f"saved GIF: {path}")
    if args.mp4:
        path = video_io.save_mp4(out, os.path.join(args.output_dir, "video.mp4"),
                                 args.frame_rate)
        print(f"saved video: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
