"""End-to-end unified (official single-file) checkpoint loading.

Builds a synthetic official-format checkpoint — native key names
(patchify_proj, adaln_single, q_norm, res_blocks, flat VAE block indices,
per_channel_statistics.*) — from the torch mirrors, saves it as one
safetensors file, loads it through the CLI's unified path
(detect_format → split_unified_state_dict → params_from_state_dict), and
checks the resulting models compute identically to the diffusers-format
load.  Covers the reference's weight-name archaeology end-to-end
(weight_format.rs:55-143, examples/ltx-video/main.rs:461-522).
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import torch_ltx  # noqa: E402
from officialize import (  # noqa: E402
    officialize_transformer_key as _officialize_transformer_key,
    officialize_vae_key as _officialize_vae_key,
)
import torch_ltx_vae as tv  # noqa: E402

from candle_video_tpu.models.ltx_video import transformer as TF  # noqa: E402
from candle_video_tpu.models.ltx_video import vae as V  # noqa: E402
from candle_video_tpu.models.ltx_video.loader import (  # noqa: E402
    load_safetensors,
    torch_state_dict_to_numpy,
    transformer_params_from_state_dict,
    vae_params_from_state_dict,
)
from candle_video_tpu.models.ltx_video.weight_format import (  # noqa: E402
    detect_format,
    split_unified_state_dict,
)

TINY_VAE_CFG = dict(
    in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=[8, 16, 32], decoder_block_out_channels=[8, 16],
    spatiotemporal_scaling=[True, True],
    decoder_spatiotemporal_scaling=[True, True],
    layers_per_block=[1, 1, 2], decoder_layers_per_block=[1, 1, 1],
    patch_size=2, patch_size_t=1,
    downsample_types=["spatiotemporal", "spatiotemporal"],
    decoder_upsample_residual=[True, True], decoder_upsample_factor=[2, 2],
    timestep_conditioning=True, decoder_causal=False,
    spatial_compression_ratio=8, temporal_compression_ratio=4,
)


@pytest.fixture(scope="module")
def unified_file(tmp_path_factory):
    from safetensors.numpy import save_file

    torch.manual_seed(0)
    dit = torch_ltx.LtxTransformer3D(
        in_channels=8, out_channels=8, heads=2, dim_head=12,
        cross_attention_dim=24, num_layers=2, caption_channels=16,
    ).eval()
    enc = tv.Encoder3d(TINY_VAE_CFG).eval()
    dec = tv.Decoder3d(TINY_VAE_CFG).eval()

    unified = {}
    for k, v in torch_state_dict_to_numpy(dit.state_dict()).items():
        unified[_officialize_transformer_key(k)] = v.astype(np.float32)
    for k, v in torch_state_dict_to_numpy(enc.state_dict()).items():
        unified[_officialize_vae_key("encoder." + k)] = v.astype(np.float32)
    for k, v in torch_state_dict_to_numpy(dec.state_dict()).items():
        unified[_officialize_vae_key("decoder." + k)] = v.astype(np.float32)
    unified["vae.per_channel_statistics.mean-of-means"] = np.linspace(
        -0.1, 0.1, 4
    ).astype(np.float32)
    unified["vae.per_channel_statistics.std-of-means"] = np.linspace(
        0.9, 1.1, 4
    ).astype(np.float32)

    path = tmp_path_factory.mktemp("ckpt") / "ltxv-tiny-unified.safetensors"
    save_file(unified, str(path))
    return str(path), dit, enc, dec


def test_unified_load_and_forward_parity(unified_file, rng):
    path, dit, enc, dec = unified_file
    assert detect_format(path) == "official"

    sd = load_safetensors(path)
    tsd, vsd = split_unified_state_dict(sd)

    tcfg = TF.LtxTransformerConfig(
        in_channels=8, out_channels=8, num_attention_heads=2,
        attention_head_dim=12, cross_attention_dim=24, num_layers=2,
        caption_channels=16,
    )
    tparams = transformer_params_from_state_dict(tsd, tcfg, jnp.float32)
    vparams = vae_params_from_state_dict(vsd, jnp.float32)

    # latents stats survived the per_channel_statistics rename
    np.testing.assert_allclose(np.asarray(vparams["latents_mean"]),
                               np.linspace(-0.1, 0.1, 4), rtol=1e-6)

    # transformer forward parity vs the torch source model
    from candle_video_tpu.ops.rope import (
        normalize_video_coords, rope_cos_sin, video_coords_grid,
    )

    f, h, w = 2, 2, 3
    s = f * h * w
    hidden = rng.normal(size=(1, s, 8)).astype(np.float32)
    embeds = rng.normal(size=(1, 5, 16)).astype(np.float32)
    t = np.array([500.0], np.float32)
    mask = np.ones((1, 5), np.float32)
    coords = np.broadcast_to(video_coords_grid(f, h, w)[None], (1, s, 3)).copy()
    with torch.no_grad():
        ref = dit(torch.from_numpy(hidden), torch.from_numpy(embeds),
                  torch.from_numpy(t), torch.from_numpy(coords),
                  torch.from_numpy(mask)).numpy()
    grid = normalize_video_coords(jnp.asarray(coords), 20, 2048, 2048)
    cos, sin = rope_cos_sin(grid, tcfg.inner_dim)
    got = np.asarray(TF.forward(
        tparams, tcfg, jnp.asarray(hidden), jnp.asarray(embeds),
        jnp.asarray(t), cos, sin, encoder_attention_mask=jnp.asarray(mask),
        attn_impl="xla",
    ))
    assert np.abs(got - ref).max() < 2e-3

    # VAE decoder parity vs the torch source model
    vcfg = V.LtxVaeConfig(**{k: tuple(v) if isinstance(v, list) else v
                             for k, v in TINY_VAE_CFG.items()})
    z = rng.normal(size=(1, 4, 2, 2, 2)).astype(np.float32)
    temb = np.array([0.05], np.float32)
    with torch.no_grad():
        ref_v = dec(torch.from_numpy(z), torch.from_numpy(temb)).numpy()
    got_v = np.asarray(V.decoder_forward(
        vparams["decoder"], vcfg, jnp.asarray(z), jnp.asarray(temb)
    ))
    np.testing.assert_allclose(got_v, ref_v, atol=5e-4)

    # encoder too
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_e = enc(torch.from_numpy(x)).numpy()
    got_e = np.asarray(V.encoder_forward(vparams["encoder"], vcfg, jnp.asarray(x)))
    np.testing.assert_allclose(got_e, ref_e, atol=5e-4)
