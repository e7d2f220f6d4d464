"""Full-scale synthetic official checkpoint: load -> 1 step -> decode.

Round-1 gap (VERDICT.md item 4): the unified-checkpoint path was only
exercised at tiny shapes.  This test loads a FULL-SIZE (2B DiT + full 3D
VAE, BF16, ~4.8 GiB) synthetic official file through the same CLI path the
reference debugs against real 0.9.8 files (examples/ltx-video/main.rs:
461-522: detect_format -> split_unified_state_dict -> params), then runs
one denoise step at 512x768x97f and an untiled decode.

Gated (big disk + RAM + minutes): set CVT_FULL_CHECKPOINT to the checkpoint
path (generate with scripts/gen_synth_checkpoint.py), optionally
CVT_TEST_PLATFORM=axon to run the compute on the real chip.

    python scripts/gen_synth_checkpoint.py --out /tmp/ltxv-2b-synth.safetensors
    CVT_FULL_CHECKPOINT=/tmp/ltxv-2b-synth.safetensors \
        CVT_TEST_PLATFORM=axon python -m pytest tests/test_full_checkpoint.py -v -s
"""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_CKPT = os.environ.get("CVT_FULL_CHECKPOINT", "")

pytestmark = pytest.mark.skipif(
    not _CKPT,
    reason="set CVT_FULL_CHECKPOINT=<path> (scripts/gen_synth_checkpoint.py)",
)


def test_full_scale_unified_load_step_decode():
    from candle_video_tpu.models.ltx_video import pipeline as P
    from candle_video_tpu.models.ltx_video import scheduler as S
    from candle_video_tpu.models.ltx_video import transformer as TF
    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.configs import get_config_by_version
    from candle_video_tpu.models.ltx_video.loader import (
        load_safetensors,
        transformer_params_from_state_dict,
        vae_params_from_state_dict,
    )
    from candle_video_tpu.models.ltx_video.weight_format import (
        detect_format,
        split_unified_state_dict,
    )
    from candle_video_tpu.ops.rope import rope_cos_sin

    full = get_config_by_version("0.9.8-2b-distilled")
    tcfg = full.transformer
    vcfg = V.LtxVaeConfig()

    # ---- load through the CLI path, timed --------------------------------
    t0 = time.time()
    assert detect_format(_CKPT) == "official"
    sd = load_safetensors(_CKPT)
    tsd, vsd = split_unified_state_dict(sd)
    tparams = transformer_params_from_state_dict(tsd, tcfg, jnp.bfloat16)
    vparams = vae_params_from_state_dict(vsd, jnp.bfloat16)
    load_s = time.time() - t0
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tparams))
    hbm = sum(x.nbytes for x in jax.tree.leaves((tparams, vparams)))
    print(
        f"\nfull-scale load: {load_s:.1f}s, DiT params {n_params/1e9:.2f}B, "
        f"DiT+VAE HBM {hbm/2**30:.2f} GiB"
    )
    assert n_params > 1.8e9  # the real 2B, not a tiny stub

    # ---- one denoise step at 512x768x97f ----------------------------------
    rng = np.random.default_rng(0)
    f, h, w = 13, 16, 24
    s = f * h * w
    latents = jnp.asarray(rng.normal(size=(1, s, tcfg.in_channels)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(1, 128, 4096)) * 0.05, jnp.float32)
    mask = jnp.ones((1, 128), jnp.float32)
    coords = P.build_video_coords(f, h, w, 25.0)
    grid = jnp.asarray(coords)[None] / jnp.asarray(
        [tcfg.rope_base_num_frames, tcfg.rope_base_height, tcfg.rope_base_width],
        jnp.float32,
    )
    cos, sin = rope_cos_sin(grid, tcfg.inner_dim, tcfg.rope_theta)
    sch = S.set_timesteps(full.scheduler, num_inference_steps=2,
                          sigmas=[1.0, 0.9937], mu=0.0)
    out = P.denoise_loop(
        tparams, tcfg, latents, enc, mask,
        sch.sigmas_jnp, sch.timesteps_jnp, cos, sin,
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.zeros((tcfg.num_layers, 1), jnp.float32), jax.random.PRNGKey(0),
        num_conds=1, attn_impl="auto",
    )
    out_np = np.asarray(out)
    assert out_np.shape == (1, s, tcfg.in_channels)
    assert np.isfinite(out_np).all()

    # ---- untiled full-resolution decode ------------------------------------
    lat5 = P.unpack_latents(out, f, h, w, tcfg.patch_size, tcfg.patch_size_t)
    lat5 = V.denormalize_latents(
        lat5, vparams["latents_mean"], vparams["latents_std"], vcfg.scaling_factor
    )
    t0 = time.time()
    video = V.decode(vparams, vcfg, lat5.astype(jnp.bfloat16),
                     jnp.asarray([0.05], jnp.float32))
    video_np = np.asarray(video, np.float32)
    print(f"untiled decode 512x768x97f: {time.time()-t0:.2f}s, {video_np.shape}")
    assert video_np.shape == (1, 3, 97, 512, 768)
    assert np.isfinite(video_np).all()
