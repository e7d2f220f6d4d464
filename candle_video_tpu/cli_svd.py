"""SVD image-to-video CLI (the reference's SVD pipeline surface,
src/models/svd/pipeline.rs — which the reference never wired to a binary).

Run: python -m candle_video_tpu.cli_svd --image input.png ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="candle-video-tpu-svd",
        description="Stable Video Diffusion image-to-video on TPU",
    )
    p.add_argument("--image", type=str, required=False, default=None,
                   help="input image (png/jpg); omit for random smoke input")
    p.add_argument("--weights-path", type=str, default=None,
                   help="diffusers SVD model dir (unet/ vae/ image_encoder/)")
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--num-inference-steps", type=int, default=25)
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--motion-bucket-id", type=int, default=127)
    p.add_argument("--noise-aug-strength", type=float, default=0.02)
    p.add_argument("--min-guidance-scale", type=float, default=1.0)
    p.add_argument("--max-guidance-scale", type=float, default=3.0)
    p.add_argument("--decode-chunk-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output-dir", type=str, default="output_svd")
    p.add_argument("--gif", action="store_true")
    p.add_argument("--save-frames", action="store_true")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["bfloat16", "float32"])
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models.svd import clip as CLIP
    from .models.svd import pipeline as SP
    from .models.svd import vae as SV
    from .models.svd.configs import SvdConfig
    from .models.svd.loader import unet_params_from_state_dict
    from .utils import video_io

    print(f"candle-video-tpu SVD | devices: {jax.devices()}")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = SvdConfig()

    if not args.weights_path:
        print("ERROR: SVD has no random-init smoke mode at full size; pass "
              "--weights-path with a diffusers SVD checkpoint dir")
        return 2

    from .models.ltx_video.loader import load_sharded

    unet_params = unet_params_from_state_dict(
        load_sharded(os.path.join(args.weights_path, "unet")), dtype
    )
    vae_params = SV.vae_params_from_state_dict(
        load_sharded(os.path.join(args.weights_path, "vae")), dtype
    )
    clip_params = CLIP.params_from_hf_state_dict(
        load_sharded(os.path.join(args.weights_path, "image_encoder")),
        cfg.clip, dtype,
    )
    pipe = SP.SvdPipeline(config=cfg, unet_params=unet_params,
                          vae_params=vae_params, clip_params=clip_params)

    if args.image:
        image = jnp.asarray(
            video_io.load_image(args.image, args.height, args.width)
        )
    else:
        image = jnp.asarray(
            np.random.default_rng(args.seed).uniform(
                -1, 1, size=(1, 3, args.height, args.width)
            ),
            jnp.float32,
        )

    inf = SP.SvdInferenceConfig(
        num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        fps=args.fps,
        motion_bucket_id=args.motion_bucket_id,
        noise_aug_strength=args.noise_aug_strength,
        min_guidance_scale=args.min_guidance_scale,
        max_guidance_scale=args.max_guidance_scale,
        decode_chunk_size=args.decode_chunk_size,
        seed=args.seed,
    )

    t0 = time.time()
    video = SP.generate(pipe, image, inf)
    np.asarray(video[(0,) * video.ndim])
    print(f"generation took {time.time() - t0:.1f}s; frames {video.shape}")

    os.makedirs(args.output_dir, exist_ok=True)
    # [B*F, 3, H, W] in [-1,1] -> [1, 3, F, H, W] in [0,255]
    v = (jnp.clip(video, -1, 1) + 1.0) / 2.0 * 255.0
    v = jnp.transpose(v, (1, 0, 2, 3))[None]
    if args.save_frames:
        paths = video_io.save_frames_png(v, args.output_dir)
        print(f"saved {len(paths)} frames")
    if args.gif or not args.save_frames:
        path = video_io.save_gif(v, os.path.join(args.output_dir, "video.gif"),
                                 fps=args.fps)
        print(f"saved {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
