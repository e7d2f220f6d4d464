"""3D causal VAE tests: conv3d vs torch (independent), tiny encoder/decoder
parity vs the torch mirror, blend/tiling semantics, patchify roundtrips.

Covers the reference's verify_conv3d_parity / verify_upsampler_parity /
verify_vae_parity / vae tiling suites.
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import torch_ltx_vae as tv  # noqa: E402

from candle_video_tpu.models.ltx_video import vae as V  # noqa: E402
from candle_video_tpu.models.ltx_video.loader import (  # noqa: E402
    torch_state_dict_to_numpy,
    vae_params_from_state_dict,
)
from candle_video_tpu.ops.conv3d import causal_conv3d  # noqa: E402


TINY_CFG_DICT = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=[8, 16, 32],
    decoder_block_out_channels=[8, 16],
    spatiotemporal_scaling=[True, True],
    decoder_spatiotemporal_scaling=[True, True],
    layers_per_block=[1, 1, 2],
    decoder_layers_per_block=[1, 1, 1],
    patch_size=2,
    patch_size_t=1,
    downsample_types=["spatiotemporal", "spatiotemporal"],
    decoder_upsample_residual=[True, True],
    decoder_upsample_factor=[2, 2],
    timestep_conditioning=True,
    decoder_causal=False,
    spatial_compression_ratio=8,
    temporal_compression_ratio=4,
)


def tiny_jax_cfg():
    return V.LtxVaeConfig(
        in_channels=3,
        out_channels=3,
        latent_channels=4,
        block_out_channels=(8, 16, 32),
        decoder_block_out_channels=(8, 16),
        spatiotemporal_scaling=(True, True),
        decoder_spatiotemporal_scaling=(True, True),
        layers_per_block=(1, 1, 2),
        decoder_layers_per_block=(1, 1, 1),
        patch_size=2,
        patch_size_t=1,
        downsample_types=("spatiotemporal", "spatiotemporal"),
        decoder_upsample_residual=(True, True),
        decoder_upsample_factor=(2, 2),
        timestep_conditioning=True,
        decoder_causal=False,
        spatial_compression_ratio=8,
        temporal_compression_ratio=4,
    )


# ---------------------------------------------------------------------------
# conv3d vs torch (fully independent oracle)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kernel,stride,causal",
    [
        ((3, 3, 3), (1, 1, 1), True),
        ((3, 3, 3), (1, 1, 1), False),
        ((3, 3, 3), (2, 2, 2), True),
        ((1, 1, 1), (1, 1, 1), True),
    ],
)
def test_causal_conv3d_vs_torch(rng, kernel, stride, causal):
    b, ci, co, t, h, w = 2, 4, 6, 5, 8, 8
    x = rng.normal(size=(b, ci, t, h, w)).astype(np.float32)
    wgt = rng.normal(size=(co, ci, *kernel)).astype(np.float32) * 0.2
    bias = rng.normal(size=(co,)).astype(np.float32)

    got = np.asarray(
        causal_conv3d(
            jnp.asarray(x), jnp.asarray(wgt), jnp.asarray(bias),
            stride=stride, causal=causal,
        )
    )

    xt = torch.from_numpy(x)
    kt = kernel[0]
    if kt > 1:
        if causal:
            xt = F.pad(xt, (0, 0, 0, 0, kt - 1, 0), mode="replicate")
        else:
            side = (kt - 1) // 2
            xt = F.pad(xt, (0, 0, 0, 0, side, side), mode="replicate")
    ref = F.conv3d(
        xt, torch.from_numpy(wgt), torch.from_numpy(bias),
        stride=stride, padding=(0, kernel[1] // 2, kernel[2] // 2),
    ).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv3d_causality():
    """Causal conv: output at frame t must not depend on frames > t."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 2, 6, 4, 4)).astype(np.float32)
    wgt = rng.normal(size=(3, 2, 3, 3, 3)).astype(np.float32)
    y1 = np.asarray(causal_conv3d(jnp.asarray(x), jnp.asarray(wgt), causal=True))
    x2 = x.copy()
    x2[:, :, 4:] += 100.0  # perturb the future
    y2 = np.asarray(causal_conv3d(jnp.asarray(x2), jnp.asarray(wgt), causal=True))
    np.testing.assert_allclose(y1[:, :, :4], y2[:, :, :4], atol=1e-4)
    assert np.abs(y1[:, :, 4:] - y2[:, :, 4:]).max() > 1.0


# ---------------------------------------------------------------------------
# patchify / shuffles
# ---------------------------------------------------------------------------


def test_patchify_roundtrip(rng):
    x = rng.normal(size=(2, 3, 4, 8, 8)).astype(np.float32)
    p = V._patchify(jnp.asarray(x), 2, 2)
    assert p.shape == (2, 3 * 2 * 2 * 2, 2, 4, 4)
    back = V._unpatchify(p, 2, 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


def test_patchify_matches_torch_mirror(rng):
    x = rng.normal(size=(1, 3, 2, 4, 4)).astype(np.float32)
    enc = tv.Encoder3d(TINY_CFG_DICT)
    ref = enc.patchify(torch.from_numpy(x)).numpy()
    got = np.asarray(V._patchify(jnp.asarray(x), 2, 1))
    np.testing.assert_allclose(got, ref, atol=0)


# ---------------------------------------------------------------------------
# block-level parity vs torch mirror
# ---------------------------------------------------------------------------


def _to_jax_sd(module, prefix):
    sd = torch_state_dict_to_numpy(module.state_dict())
    return {f"{prefix}.{k}": v for k, v in sd.items()}


def test_resnet_block_parity(rng):
    torch.manual_seed(0)
    blk = tv.ResnetBlock3d(8, 8, timestep_conditioning=True).eval()
    x = rng.normal(size=(2, 8, 3, 4, 4)).astype(np.float32)
    temb = rng.normal(size=(2, 32)).astype(np.float32)
    with torch.no_grad():
        ref = blk(torch.from_numpy(x), torch.from_numpy(temb).view(2, 32, 1, 1, 1)).numpy()

    sd = {f"r.{k}": v for k, v in torch_state_dict_to_numpy(blk.state_dict()).items()}
    from candle_video_tpu.models.ltx_video.loader import _resnet_params

    p = _resnet_params(sd, "r", jnp.float32)
    cfg = tiny_jax_cfg()
    got = np.asarray(
        V._resnet_block(p, cfg, jnp.asarray(x), jnp.asarray(temb).reshape(2, 32, 1, 1, 1))
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_resnet_block_channel_change_parity(rng):
    torch.manual_seed(1)
    blk = tv.ResnetBlock3d(8, 16).eval()
    x = rng.normal(size=(1, 8, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = blk(torch.from_numpy(x)).numpy()
    sd = {f"r.{k}": v for k, v in torch_state_dict_to_numpy(blk.state_dict()).items()}
    from candle_video_tpu.models.ltx_video.loader import _resnet_params

    p = _resnet_params(sd, "r", jnp.float32)
    got = np.asarray(V._resnet_block(p, tiny_jax_cfg(), jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_downsampler_parity(rng):
    torch.manual_seed(2)
    ds = tv.Downsampler3d(8, 16, (2, 2, 2)).eval()
    # temporal dim must satisfy t % st == 1 (97-frame-style inputs)
    x = rng.normal(size=(1, 8, 5, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = ds(torch.from_numpy(x)).numpy()
    sd = torch_state_dict_to_numpy(ds.state_dict())
    p = {"conv": {"weight": jnp.asarray(sd["conv.conv.weight"]),
                  "bias": jnp.asarray(sd["conv.conv.bias"])}}
    got = np.asarray(
        V._pixel_unshuffle_downsample(p, jnp.asarray(x), (2, 2, 2), 16)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_upsampler_parity(rng):
    torch.manual_seed(3)
    us = tv.Upsampler3d(16, 8, (2, 2, 2), causal=False, residual=True).eval()
    x = rng.normal(size=(1, 16, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = us(torch.from_numpy(x)).numpy()
    sd = torch_state_dict_to_numpy(us.state_dict())
    p = {"conv": {"weight": jnp.asarray(sd["conv.conv.weight"]),
                  "bias": jnp.asarray(sd["conv.conv.bias"])}}
    got = np.asarray(
        V._upsampler(p, jnp.asarray(x), (2, 2, 2), True, 64 // 16, causal=False)
    )
    assert got.shape == ref.shape  # [1, 8, 5, 8, 8]
    np.testing.assert_allclose(got, ref, atol=1e-4)


# ---------------------------------------------------------------------------
# full tiny encoder/decoder parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_vae():
    torch.manual_seed(0)
    enc = tv.Encoder3d(TINY_CFG_DICT).eval()
    dec = tv.Decoder3d(TINY_CFG_DICT).eval()
    sd = {}
    sd.update(_to_jax_sd(enc, "encoder"))
    sd.update(_to_jax_sd(dec, "decoder"))
    params = vae_params_from_state_dict(sd, dtype=jnp.float32)
    return enc, dec, params, tiny_jax_cfg()


def test_encoder_parity(tiny_vae, rng):
    enc, _, params, cfg = tiny_vae
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    got = np.asarray(V.encoder_forward(params["encoder"], cfg, jnp.asarray(x)))
    assert got.shape == ref.shape == (1, 8, 2, 2, 2)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_decoder_parity(tiny_vae, rng):
    _, dec, params, cfg = tiny_vae
    z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
    temb = np.array([0.05], np.float32)
    with torch.no_grad():
        ref = dec(torch.from_numpy(z), torch.from_numpy(temb)).numpy()
    got = np.asarray(
        V.decoder_forward(params["decoder"], cfg, jnp.asarray(z), jnp.asarray(temb))
    )
    assert got.shape == ref.shape  # [1, 3, 5, 32, 32]
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_decoder_parity_no_temb(tiny_vae, rng):
    _, dec, params, cfg = tiny_vae
    z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = dec(torch.from_numpy(z), None).numpy()
    got = np.asarray(V.decoder_forward(params["decoder"], cfg, jnp.asarray(z), None))
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_gaussian_split_and_logvar_trick(tiny_vae, rng):
    _, _, params, cfg = tiny_vae
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    moments = V.encoder_forward(params["encoder"], cfg, jnp.asarray(x))
    mean, logvar = V.gaussian_split(moments)
    assert mean.shape == logvar.shape == (1, 4, 2, 2, 2)
    lv = np.asarray(logvar)
    # uniform logvar: channels 1..3 replicate the trick channel
    np.testing.assert_allclose(lv[:, 1], lv[:, 2], atol=0)
    np.testing.assert_allclose(lv[:, 2], lv[:, 3], atol=0)


# ---------------------------------------------------------------------------
# blending & tiling
# ---------------------------------------------------------------------------


def test_blend_h_formula(rng):
    a = rng.normal(size=(1, 2, 2, 3, 8)).astype(np.float32)
    b = rng.normal(size=(1, 2, 2, 3, 8)).astype(np.float32)
    blend = 4
    got = np.asarray(V.blend_h(jnp.asarray(a), jnp.asarray(b), blend))
    expected = b.copy()
    for x in range(blend):
        expected[..., x] = a[..., -blend + x] * (1 - x / blend) + b[..., x] * (x / blend)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_blend_v_t_formula(rng):
    a = rng.normal(size=(1, 2, 6, 8, 3)).astype(np.float32)
    b = rng.normal(size=(1, 2, 6, 8, 3)).astype(np.float32)
    got = np.asarray(V.blend_v(jnp.asarray(a), jnp.asarray(b), 3))
    expected = b.copy()
    for y in range(3):
        expected[..., y, :] = a[..., -3 + y, :] * (1 - y / 3) + b[..., y, :] * (y / 3)
    np.testing.assert_allclose(got, expected, atol=1e-6)

    got_t = np.asarray(V.blend_t(jnp.asarray(a), jnp.asarray(b), 2))
    expected = b.copy()
    for x in range(2):
        expected[:, :, x] = a[:, :, -2 + x] * (1 - x / 2) + b[:, :, x] * (x / 2)
    np.testing.assert_allclose(got_t, expected, atol=1e-6)


def test_tiled_decode_equals_direct_when_tile_covers(tiny_vae, rng):
    _, _, params, cfg = tiny_vae
    z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
    temb = jnp.asarray([0.05], jnp.float32)
    tiling = V.TilingConfig(
        tile_sample_min_height=64, tile_sample_min_width=64,
        tile_sample_stride_height=64, tile_sample_stride_width=64,
        tile_sample_min_num_frames=64, tile_sample_stride_num_frames=64,
    )
    direct = V.decoder_forward(params["decoder"], cfg, jnp.asarray(z), temb)
    tiled = V.tiled_decode(params, cfg, jnp.asarray(z), temb, tiling)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct), atol=1e-5)


def test_tiled_decode_blends_multiple_tiles(tiny_vae, rng):
    _, _, params, cfg = tiny_vae
    z = rng.normal(size=(1, 4, 2, 8, 8)).astype(np.float32)
    temb = jnp.asarray([0.05], jnp.float32)
    tiling = V.TilingConfig(
        tile_sample_min_height=32, tile_sample_min_width=32,
        tile_sample_stride_height=24, tile_sample_stride_width=24,
        tile_sample_min_num_frames=64, tile_sample_stride_num_frames=64,
    )
    out = V.tiled_decode(params, cfg, jnp.asarray(z), temb, tiling)
    assert out.shape == (1, 3, 5, 64, 64)
    direct = V.decoder_forward(params["decoder"], cfg, jnp.asarray(z), temb)
    # tiles of a random-init decoder disagree near seams; demand broad
    # agreement only (real checkpoints are much tighter)
    d = np.asarray(out) - np.asarray(direct)
    assert np.mean(d**2) < 0.25


def test_temporal_tiled_decode_shape(tiny_vae, rng):
    _, _, params, cfg = tiny_vae
    z = rng.normal(size=(1, 4, 6, 4, 4)).astype(np.float32)
    temb = jnp.asarray([0.05], jnp.float32)
    tiling = V.TilingConfig(
        tile_sample_min_height=64, tile_sample_min_width=64,
        tile_sample_stride_height=48, tile_sample_stride_width=48,
        tile_sample_min_num_frames=8, tile_sample_stride_num_frames=4,
    )
    out = V.temporal_tiled_decode(params, cfg, jnp.asarray(z), temb, tiling)
    assert out.shape == (1, 3, (6 - 1) * 4 + 1, 32, 32)


def test_facade_dispatch(tiny_vae, rng):
    _, _, params, cfg = tiny_vae
    z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
    temb = jnp.asarray([0.05], jnp.float32)
    out = V.decode(params, cfg, jnp.asarray(z), temb, use_tiling=False,
                   use_framewise_decoding=False)
    assert out.shape == (1, 3, 5, 32, 32)


# ---------------------------------------------------------------------------
# latent normalize / denormalize
# ---------------------------------------------------------------------------


def test_normalize_denormalize_roundtrip(rng):
    x = rng.normal(size=(2, 4, 3, 5, 5)).astype(np.float32)
    mean = rng.normal(size=(4,)).astype(np.float32)
    std = (rng.random(4).astype(np.float32) + 0.5)
    n = V.normalize_latents(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std), 0.7)
    back = V.denormalize_latents(n, jnp.asarray(mean), jnp.asarray(std), 0.7)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_normalize_formula(rng):
    x = rng.normal(size=(1, 2, 1, 2, 2)).astype(np.float32)
    mean = np.array([1.0, -1.0], np.float32)
    std = np.array([2.0, 0.5], np.float32)
    got = np.asarray(
        V.normalize_latents(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std), 3.0)
    )
    expected = (x - mean.reshape(1, 2, 1, 1, 1)) * 3.0 / std.reshape(1, 2, 1, 1, 1)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_batch_slicing_matches_full(tiny_vae, rng):
    """use_slicing decodes per-sample and concatenates (vae.rs:2109-2121)."""
    _, _, params, cfg = tiny_vae
    z = rng.normal(size=(2, 4, 2, 2, 2)).astype(np.float32)
    temb = jnp.asarray([0.05, 0.10], jnp.float32)
    full = V.decode(params, cfg, jnp.asarray(z), temb, use_tiling=False,
                    use_framewise_decoding=False)
    sliced = V.decode(params, cfg, jnp.asarray(z), temb, use_tiling=False,
                      use_framewise_decoding=False, use_slicing=True)
    np.testing.assert_allclose(np.asarray(sliced), np.asarray(full), atol=1e-5)


def test_tiled_encode_equals_direct_when_tile_covers(tiny_vae, rng):
    _, _, params, cfg = tiny_vae
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    tiling = V.TilingConfig(
        tile_sample_min_height=64, tile_sample_min_width=64,
        tile_sample_stride_height=64, tile_sample_stride_width=64,
        tile_sample_min_num_frames=64, tile_sample_stride_num_frames=64,
    )
    direct = V.encoder_forward(params["encoder"], cfg, jnp.asarray(x))
    tiled = V.tiled_encode(params, cfg, jnp.asarray(x), tiling)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct), atol=1e-5)


def test_tiled_encode_multi_tile_shape(tiny_vae, rng):
    _, _, params, cfg = tiny_vae
    x = rng.normal(size=(1, 3, 5, 32, 32)).astype(np.float32)
    tiling = V.TilingConfig(
        tile_sample_min_height=16, tile_sample_min_width=16,
        tile_sample_stride_height=8, tile_sample_stride_width=8,
        tile_sample_min_num_frames=64, tile_sample_stride_num_frames=64,
    )
    # latent 32/8 = 4 spatial
    out = V.tiled_encode(params, cfg, jnp.asarray(x), tiling)
    assert out.shape == (1, 8, 2, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_temporal_tiled_encode_first_tile_frame_drop(tiny_vae, rng):
    """Temporal encode drops tile-0's first latent frame (vae.rs:2323-2329)."""
    _, _, params, cfg = tiny_vae
    x = rng.normal(size=(1, 3, 13, 16, 16)).astype(np.float32)
    tiling = V.TilingConfig(
        tile_sample_min_height=64, tile_sample_min_width=64,
        tile_sample_stride_height=64, tile_sample_stride_width=64,
        tile_sample_min_num_frames=8, tile_sample_stride_num_frames=4,
    )
    out = V.temporal_tiled_encode(params, cfg, jnp.asarray(x), tiling)
    # latent frames = (13-1)/4+1 = 4
    assert out.shape == (1, 8, 4, 2, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_facade_dispatch(tiny_vae, rng):
    _, _, params, cfg = tiny_vae
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    out = V.encode(params, cfg, jnp.asarray(x), use_tiling=False,
                   use_framewise_encoding=False)
    assert out.shape == (1, 8, 2, 2, 2)


def test_vae_forward_roundtrip_facade(tiny_vae, rng):
    """encode -> mode/sample -> decode facade (vae.rs:2139-2154)."""
    _, _, params, cfg = tiny_vae
    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    temb = jnp.asarray([0.05], jnp.float32)
    out = V.forward(params, cfg, jnp.asarray(x), temb,
                    use_tiling=False, use_framewise_decoding=False,
                    use_framewise_encoding=False)
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(np.asarray(out)).all()

    import jax

    out_s = V.forward(params, cfg, jnp.asarray(x), temb, sample_posterior=True,
                      key=jax.random.PRNGKey(0),
                      use_tiling=False, use_framewise_decoding=False,
                      use_framewise_encoding=False)
    assert np.abs(np.asarray(out_s) - np.asarray(out)).max() > 1e-6

    with pytest.raises(ValueError, match="PRNG key"):
        V.forward(params, cfg, jnp.asarray(x), temb, sample_posterior=True,
                  use_tiling=False, use_framewise_decoding=False,
                  use_framewise_encoding=False)


def test_select_decode_mode_policy():
    """select_decode_mode is the facade's single mode-selection point:
    given the latent shape and free HBM it walks the exact-mode ladder
    dense -> streamed tail -> ups-split stream -> fullstream.  (The halo-
    chunked tail it helped retire is gone: streaming dominates it — zero
    recompute at the same exactness.)"""
    from candle_video_tpu.models.ltx_video import vae as V

    cfg = V.LtxVaeConfig()  # production 2B config, non-causal decoder
    zshape = (1, 128, 13, 16, 24)  # 512x768x97f latents

    gib = 1024 ** 3
    # plenty of HBM: dense
    assert V.select_decode_mode(cfg, zshape, free_bytes=64 * gib,
                                channels_last=True) == {}
    # dense peak (~8 GiB here) doesn't fit, head does: streamed tail
    picked = V.select_decode_mode(cfg, zshape, free_bytes=6 * gib,
                                  channels_last=True)
    assert picked.get("tail_stream_chunks", 0) >= 2
    assert not picked.get("tail_stream_from_ups", False)
    # head doesn't fit either: ups-split stream
    picked = V.select_decode_mode(cfg, zshape, free_bytes=int(2.4 * gib),
                                  channels_last=True)
    assert picked.get("tail_stream_chunks", 0) >= 4
    assert picked.get("tail_stream_from_ups", False)
    # almost nothing fits: fullstream
    picked = V.select_decode_mode(cfg, zshape, free_bytes=1 * gib,
                                  channels_last=True)
    assert picked.get("full_stream_chunks", 0) >= 2
    # non-streamable cases stay dense regardless of pressure
    assert V.select_decode_mode(cfg, zshape, free_bytes=1 * gib,
                                channels_last=False) == {}
    import dataclasses as _dc
    causal = _dc.replace(cfg, decoder_causal=True)
    assert V.select_decode_mode(causal, zshape, free_bytes=1 * gib,
                                channels_last=True) == {}
    short = (1, 128, 2, 16, 24)
    assert V.select_decode_mode(cfg, short, free_bytes=1 * gib,
                                channels_last=True) == {}


def test_decoder_channels_last_equals_ncdhw(rng):
    """The channels-last decoder (production path: NHWC conv2d taps, lane
    norms) must match the NCDHW oracle decoder to f32 rounding — including
    under tail chunking and with noise injection enabled."""
    import jax

    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    for causal, inject in ((False, False), (True, False), (False, True)):
        cfg = V.LtxVaeConfig(
            in_channels=3, out_channels=3, latent_channels=4,
            block_out_channels=(8, 16, 32), decoder_block_out_channels=(8, 16),
            spatiotemporal_scaling=(True, True),
            decoder_spatiotemporal_scaling=(True, True),
            layers_per_block=(1, 1, 2), decoder_layers_per_block=(2, 2, 2),
            patch_size=2, patch_size_t=1,
            downsample_types=("spatiotemporal", "spatiotemporal"),
            decoder_upsample_residual=(True, True),
            decoder_upsample_factor=(2, 2),
            timestep_conditioning=True, decoder_causal=causal,
            decoder_inject_noise=(inject,) * 4,
            spatial_compression_ratio=8, temporal_compression_ratio=4,
        )
        params = init_vae_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        z = jnp.asarray(rng.normal(size=(1, 4, 7, 4, 4)), jnp.float32)
        temb = jnp.asarray([0.05], jnp.float32)
        nk = jax.random.PRNGKey(7) if inject else None
        ref = np.asarray(
            V.decoder_forward(params["decoder"], cfg, z, temb, noise_key=nk,
                              channels_last=False)
        )
        # streaming tail (chunks=2) only for the non-causal configs
        for chunks in (0,) if causal else (0, 2):
            got = np.asarray(
                V.decoder_forward(params["decoder"], cfg, z, temb,
                                  noise_key=nk, tail_stream_chunks=chunks,
                                  channels_last=True)
            )
            assert got.shape == ref.shape
            np.testing.assert_allclose(
                got, ref, atol=5e-5, rtol=1e-4,
                err_msg=f"causal={causal} inject={inject} chunks={chunks}",
            )


def test_decoder_tail_streaming_is_exact(rng):
    """tail_stream_chunks: overlap-save streaming tail — per-conv 2-frame
    input caches + delay-aligned residuals, ZERO halo recompute — must
    reproduce the unchunked decode exactly (every frame is convolved by
    the same ops on the same inputs, only the chunk boundaries differ)."""
    import jax

    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    cfg = V.LtxVaeConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16, 32), decoder_block_out_channels=(8, 16),
        spatiotemporal_scaling=(True, True),
        decoder_spatiotemporal_scaling=(True, True),
        layers_per_block=(1, 1, 2), decoder_layers_per_block=(2, 2, 2),
        patch_size=2, patch_size_t=1,
        downsample_types=("spatiotemporal", "spatiotemporal"),
        decoder_upsample_residual=(True, True),
        decoder_upsample_factor=(2, 2),
        timestep_conditioning=True, decoder_causal=False,
        spatial_compression_ratio=8, temporal_compression_ratio=4,
    )
    params = init_vae_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    z = jnp.asarray(rng.normal(size=(1, 4, 7, 4, 4)), jnp.float32)
    temb = jnp.asarray([0.05], jnp.float32)
    ref = np.asarray(V.decoder_forward(params["decoder"], cfg, z, temb))
    # tail T = 25 frames, pipeline delay = 2 resnets * 2 + 1 = 5
    assert V.tail_stream_delay(params["decoder"]) == 5
    for n in (2, 3, 4):
        got = np.asarray(
            V.decoder_forward(params["decoder"], cfg, z, temb,
                              tail_stream_chunks=n)
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            # f32 rounding only: overlap-save sums in a different order
            # than the contiguous conv (observed max ~3e-6 of O(1) values)
            got, ref, atol=5e-6, rtol=5e-6, err_msg=f"stream chunks={n}"
        )

    # facade: jitted head + per-mode step programs, same result
    from candle_video_tpu.models.ltx_video.vae import _jitted_decoder_stream

    got_j = np.asarray(
        _jitted_decoder_stream(cfg, 3)(params["decoder"], z, temb)
    )
    np.testing.assert_allclose(got_j, ref, atol=5e-6, rtol=5e-6)

    # too many chunks: first chunk must exceed the pipeline delay
    with pytest.raises(ValueError, match="pipeline delay"):
        V.decoder_forward(params["decoder"], cfg, z, temb,
                          tail_stream_chunks=6)

    # causal decoders keep the halo path (streaming assumes symmetric pads)
    cfg_c = dataclasses.replace(cfg, decoder_causal=True)
    params_c = init_vae_params(jax.random.PRNGKey(0), cfg_c, jnp.float32)
    with pytest.raises(NotImplementedError):
        V.decoder_forward(params_c["decoder"], cfg_c, z, temb,
                          tail_stream_chunks=2)


def test_decoder_fullstream_is_exact(rng):
    """Fully streamed decode (streaming HEAD + tail): latent chunks flow
    through overlap-save state at EVERY temporal conv and upsampler —
    O(chunk) activation memory at every stage, exact vs the plain
    decode."""
    import jax

    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    cfg = V.LtxVaeConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16, 32), decoder_block_out_channels=(8, 16),
        spatiotemporal_scaling=(True, True),
        decoder_spatiotemporal_scaling=(True, True),
        layers_per_block=(1, 1, 2), decoder_layers_per_block=(2, 2, 2),
        patch_size=2, patch_size_t=1,
        downsample_types=("spatiotemporal", "spatiotemporal"),
        decoder_upsample_residual=(True, True),
        decoder_upsample_factor=(2, 2),
        timestep_conditioning=True, decoder_causal=False,
        spatial_compression_ratio=8, temporal_compression_ratio=4,
    )
    params = init_vae_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    need = V.fullstream_first_chunk_min(params["decoder"], cfg)
    assert need == 11  # conv_in+2 mid resnets+2 up blocks of 2 resnets
    z = jnp.asarray(rng.normal(size=(1, 4, 24, 4, 4)), jnp.float32)
    temb = jnp.asarray([0.05], jnp.float32)
    ref = np.asarray(V.decoder_forward(params["decoder"], cfg, z, temb))
    got = np.asarray(
        V.decoder_forward_fullstream(params["decoder"], cfg, z, temb,
                                     n_chunks=2)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-6)

    # jitted facade (per-mode head/tail step programs)
    got_j = np.asarray(
        V._jitted_decoder_fullstream(cfg, 2)(params["decoder"], z, temb)
    )
    np.testing.assert_allclose(got_j, ref, atol=5e-6, rtol=5e-6)

    # first chunk below the pipeline fill must be rejected
    with pytest.raises(ValueError, match="pipeline fill"):
        V.decoder_forward_fullstream(params["decoder"], cfg, z, temb,
                                     n_chunks=3)


def test_decoder_fullstream_unbounded_length_constant_memory(rng):
    """Clip length is UNBOUNDED at constant activation memory: a 241-frame
    decode (latent T=61) streams through per-mode step programs whose
    shapes depend only on the CHUNK size — the mid-chunk program compiles
    once and is reused for every additional chunk, so arbitrarily long
    clips add zero new programs and zero new per-step memory (the
    reference handles long clips by temporal tiling with blended — i.e.
    approximate — overlaps, vae.rs:2358-2434; this is exact)."""
    import jax

    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    cfg = V.LtxVaeConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16, 32), decoder_block_out_channels=(8, 16),
        spatiotemporal_scaling=(True, True),
        decoder_spatiotemporal_scaling=(True, True),
        layers_per_block=(1, 1, 2), decoder_layers_per_block=(2, 2, 2),
        patch_size=2, patch_size_t=1,
        downsample_types=("spatiotemporal", "spatiotemporal"),
        decoder_upsample_residual=(True, True),
        decoder_upsample_factor=(2, 2),
        timestep_conditioning=True, decoder_causal=False,
        spatial_compression_ratio=8, temporal_compression_ratio=4,
    )
    params = init_vae_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    temb = jnp.asarray([0.05], jnp.float32)

    # per-mode jitted step programs shared across BOTH clip lengths below:
    # shapes depend only on the chunk size, never on the total T
    compiles = {"head": 0, "tail": 0}

    def hstep_traced(p, c, s, tt):
        compiles["head"] += 1
        return V.decoder_head_stream_cl(p, cfg, c, s, "mid", tt)

    def tstep_traced(p, c, s, tt):
        compiles["tail"] += 1
        return V.decoder_tail_stream_cl(p, cfg, c, s, "mid", tt)

    hmid = jax.jit(hstep_traced)
    tmid = jax.jit(tstep_traced)

    def run(z, n_chunks):
        def head_fn(c, s, mode):
            if mode == "mid":
                return hmid(params["decoder"], c, s, temb)
            return V.decoder_head_stream_cl(params["decoder"], cfg, c, s,
                                            mode, temb)

        def tail_fn(c, s, mode):
            if mode == "mid":
                return tmid(params["decoder"], c, s, temb)
            return V.decoder_tail_stream_cl(params["decoder"], cfg, c, s,
                                            mode, temb)

        return V.decoder_forward_fullstream(
            params["decoder"], cfg, z, temb, n_chunks=n_chunks,
            head_fn=head_fn, tail_fn=tail_fn,
        )

    # 241 output frames ((61-1)*tc+1, latent T=61), 5 chunks of <=13 frames
    z61 = jnp.asarray(rng.normal(size=(1, 4, 61, 4, 4)), jnp.float32)
    got = np.asarray(run(z61, 5))
    assert got.shape[2] == 241
    ref = np.asarray(
        V.decoder_forward(params["decoder"], cfg, z61, temb)
    )
    # 1e-5: the jitted mid-chunk programs fuse differently than the eager
    # first/last steps, so a handful of elements round differently at f32
    # (observed max |d| 2.6e-6 over 740k elements); the overlap-save
    # algebra itself is exact — a misaligned stream would diverge at O(1)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # doubling the clip length re-uses the SAME mid-step programs: the jit
    # traces once per chunk shape, so a 488-frame clip adds chunks, not
    # programs (nor per-step memory)
    traces_after_61 = dict(compiles)
    z117 = jnp.concatenate([z61, z61[:, :, 1:57]], axis=2)  # T=117, 9 chunks
    got2 = run(z117, 9)
    assert got2.shape[2] == 465  # (117-1)*tc+1
    assert compiles == traces_after_61, (
        f"mid-chunk programs re-traced for a longer clip: {compiles} vs "
        f"{traces_after_61} — per-step memory is no longer constant in T"
    )
    # spot-check the long clip's prefix equals the short clip's decode
    # (identical latent prefix + identical stream state evolution)
    np.testing.assert_allclose(
        np.asarray(got2[:, :, :100]), ref[:, :, :100], atol=1e-5, rtol=1e-5
    )


def test_decoder_ups_tail_stream_is_exact(rng):
    """Stream split BEFORE the last upsampler: dense half-resolution
    prefix + streamed last-upsampler+tail — exact vs the plain decode
    (the 13B-resident decode mode)."""
    import jax

    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    cfg = V.LtxVaeConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16, 32), decoder_block_out_channels=(8, 16),
        spatiotemporal_scaling=(True, True),
        decoder_spatiotemporal_scaling=(True, True),
        layers_per_block=(1, 1, 2), decoder_layers_per_block=(2, 2, 2),
        patch_size=2, patch_size_t=1,
        downsample_types=("spatiotemporal", "spatiotemporal"),
        decoder_upsample_residual=(True, True),
        decoder_upsample_factor=(2, 2),
        timestep_conditioning=True, decoder_causal=False,
        spatial_compression_ratio=8, temporal_compression_ratio=4,
    )
    params = init_vae_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    # Derive the expected minimum from the stream geometry instead of
    # hardcoding: the first chunk of m pre-upsample frames yields
    # st*(m-1) - (st-1) committed tail frames after the causal crop, and
    # that must strictly exceed the tail's pipeline delay so the tail
    # emits at least one frame on the first chunk.
    delay = V.tail_stream_delay(params["decoder"])
    st = 2  # decoder_spatiotemporal_scaling[-1] is True in this cfg
    m = 2
    while st * (m - 1) - (st - 1) <= delay:
        m += 1
    assert V.ups_tail_first_chunk_min(params["decoder"], cfg) == m == 5
    z = jnp.asarray(rng.normal(size=(1, 4, 7, 4, 4)), jnp.float32)
    temb = jnp.asarray([0.05], jnp.float32)
    ref = np.asarray(V.decoder_forward(params["decoder"], cfg, z, temb))
    # pre-ups stream T = 13 frames
    for n in (2, 3):
        got = np.asarray(
            V.decoder_forward(params["decoder"], cfg, z, temb,
                              tail_stream_chunks=n,
                              tail_stream_from_ups=True)
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            got, ref, atol=2e-6, rtol=2e-6, err_msg=f"ups-stream chunks={n}"
        )

    got_j = np.asarray(
        V._jitted_decoder_stream_ups(cfg, 2)(params["decoder"], z, temb)
    )
    np.testing.assert_allclose(got_j, ref, atol=5e-6, rtol=5e-6)


def test_encoder_channels_last_matches_ncdhw(rng):
    """Channels-last encoder twin (round 5 — the production encode path)
    == the NCDHW oracle: patchify channel order, causal temporal padding,
    pixel-unshuffle downsample order [c,st,sh,sw], grouped-mean residual,
    and the logvar replication all layout-commute exactly."""
    import jax

    from candle_video_tpu.models.ltx_video import vae as V
    from candle_video_tpu.models.ltx_video.vae_init import init_vae_params

    cfg = V.LtxVaeConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16, 32),
        spatiotemporal_scaling=(True, True),
        layers_per_block=(1, 1, 2),
        patch_size=2, patch_size_t=1,
        downsample_types=("spatiotemporal", "spatiotemporal"),
        decoder_block_out_channels=(8, 16),
        decoder_spatiotemporal_scaling=(True, True),
        decoder_layers_per_block=(1, 1, 1),
        decoder_upsample_residual=(True, True),
        decoder_upsample_factor=(2, 2),
        timestep_conditioning=True,
        spatial_compression_ratio=8, temporal_compression_ratio=4,
    )
    params = init_vae_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    for f in (9, 1):  # causal frame contract: F = 4k+1 at this config
        x = jnp.asarray(rng.normal(size=(1, 3, f, 32, 48)), jnp.float32)
        a = np.asarray(V.encoder_forward(params["encoder"], cfg, x))
        b = np.asarray(V.encoder_forward_cl(params["encoder"], cfg, x))
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=5e-6, rtol=1e-5)
    # the facade's jitted default picks the CL twin (CVT_DECODER_LAYOUT
    # gate shared with the decoder); untiled facade == the CL twin exactly
    x = jnp.asarray(rng.normal(size=(1, 3, 9, 64, 64)), jnp.float32)
    facade = np.asarray(V.encode(params, cfg, x, use_tiling=False))
    direct = np.asarray(V.encoder_forward_cl(params["encoder"], cfg, x))
    # jit vs eager fusion reorders f32 ops slightly
    np.testing.assert_allclose(facade, direct, atol=5e-6, rtol=1e-5)
    # spatial-tiled encode composes with the CL encode_fn (blended seams
    # make it approximate by design — shape contract only)
    assert V.encode(params, cfg, x).shape == facade.shape
