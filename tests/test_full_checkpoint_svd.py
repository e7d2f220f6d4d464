"""Full-scale synthetic SVD checkpoint: load -> 1 UNet step -> decode.

Round-2 gap (VERDICT item 10): the SVD weight path was only exercised at
tiny shapes.  This loads a FULL-SIZE synthetic SVD directory (real
stable-video-diffusion names/shapes, BF16, ~3.5 GiB: UNet 320-1280, VAE
temporal decoder, CLIP ViT-H) through the same loader path the SVD CLI
uses (cli_svd.py: load_sharded per subdir -> *_params_from_state_dict),
then runs one UNet denoise step and a chunked VAE decode at a modest
spatial extent (full weights, reduced pixels — the weight path is what is
under test; reference layout src/models/svd/weights.rs:48-136).

Gated: set CVT_FULL_CHECKPOINT_SVD to the directory from
scripts/gen_synth_checkpoint_svd.py; optionally CVT_TEST_PLATFORM=axon.

    python scripts/gen_synth_checkpoint_svd.py --out /tmp/svd-synth
    CVT_FULL_CHECKPOINT_SVD=/tmp/svd-synth \
        python -m pytest tests/test_full_checkpoint_svd.py -v -s
"""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_DIR = os.environ.get("CVT_FULL_CHECKPOINT_SVD", "")

pytestmark = pytest.mark.skipif(
    not _DIR,
    reason="set CVT_FULL_CHECKPOINT_SVD=<dir> (scripts/gen_synth_checkpoint_svd.py)",
)


def test_full_scale_svd_load_step_decode():
    from candle_video_tpu.models.ltx_video.loader import load_sharded
    from candle_video_tpu.models.svd import clip as CLIP
    from candle_video_tpu.models.svd import unet as U
    from candle_video_tpu.models.svd import vae as SV
    from candle_video_tpu.models.svd.configs import SvdConfig
    from candle_video_tpu.models.svd.loader import unet_params_from_state_dict

    cfg = SvdConfig()
    dtype = jnp.bfloat16

    # ---- load through the CLI path, timed --------------------------------
    t0 = time.time()
    unet_params = unet_params_from_state_dict(
        load_sharded(os.path.join(_DIR, "unet")), dtype
    )
    vae_params = SV.vae_params_from_state_dict(
        load_sharded(os.path.join(_DIR, "vae")), dtype
    )
    clip_params = CLIP.params_from_hf_state_dict(
        load_sharded(os.path.join(_DIR, "image_encoder")), cfg.clip, dtype
    )
    t_load = time.time() - t0
    n_params = sum(
        int(np.prod(x.shape))
        for p in (unet_params, vae_params, clip_params)
        for x in jax.tree.leaves(p)
    )
    print(f"\nloaded {n_params/1e9:.2f}B params in {t_load:.1f}s")
    assert n_params > 2.0e9, "full-size SVD load should exceed 2B params"

    # sanity: real SVD widths made it through the name mapping
    q = (unet_params["down_blocks"][0]["attentions"][0]
         ["transformer_blocks"][0]["attn1"]["to_q"])
    assert q["weight"].shape == (320, 320)
    mid_r = unet_params["mid_block"]["resnets"][0]
    assert mid_r["spatial_res_block"]["conv1"]["weight"].shape[0] == 1280

    # ---- one UNet denoise step at full widths ----------------------------
    f = 6  # frames (full SVD uses 14; reduced for memory, widths unchanged)
    h, w = 32, 32  # latent (256x256 pixels)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(f, 8, h, w)) * 0.1, dtype)
    t_emb = jnp.full((1,), 500.0, jnp.float32)
    image_embeds = jnp.asarray(
        np.broadcast_to(rng.normal(size=(1, 1, 1024)) * 0.05, (f, 1, 1024)),
        dtype,
    )
    added_time = jnp.asarray([[6.0, 127.0, 0.02]], jnp.float32)

    t0 = time.time()
    out = U.forward(
        unet_params, cfg.unet, latents, t_emb, image_embeds, added_time,
        num_frames=f,
    )
    np.asarray(out[(0,) * out.ndim])
    print(f"UNet step ({f}x{h}x{w} latents): {time.time()-t0:.1f}s")
    assert out.shape == (f, 4, h, w)
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # ---- temporal-decoder VAE decode -------------------------------------
    z = jnp.asarray(rng.normal(size=(f, 4, h, w)) * 0.2, dtype)
    t0 = time.time()
    video = SV.decode(vae_params, cfg.vae, z, num_frames=f)
    np.asarray(video[(0,) * video.ndim])
    print(f"VAE decode: {time.time()-t0:.1f}s")
    assert video.shape == (f, 3, h * 8, w * 8)
    assert np.isfinite(np.asarray(video, np.float32)).all()

    # ---- CLIP image embedding --------------------------------------------
    img = jnp.asarray(rng.normal(size=(1, 3, 224, 224)) * 0.5, jnp.float32)
    emb = CLIP.forward(clip_params, cfg.clip, img)
    assert emb.shape == (1, 1024)
    assert np.isfinite(np.asarray(emb, np.float32)).all()
