"""SVD temporal VAE parity vs the torch mirror."""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import torch_svd_vae as tvv  # noqa: E402

from candle_video_tpu.models.svd import vae as SV  # noqa: E402
from candle_video_tpu.models.svd.configs import SvdVaeConfig  # noqa: E402


@pytest.fixture(scope="module")
def tiny_vae():
    torch.manual_seed(0)
    tm = tvv.AutoencoderKLTemporalDecoder(boc=(32, 64), latent=4, layers=1).eval()
    cfg = SvdVaeConfig(block_out_channels=(32, 64), latent_channels=4, layers_per_block=1)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = SV.vae_params_from_state_dict(sd, jnp.float32)
    return tm, cfg, params


def test_encoder_parity(tiny_vae, rng):
    tm, cfg, params = tiny_vae
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm.quant_conv(tm.encoder(torch.from_numpy(x))).numpy()
    moments = SV.encoder_forward(params["encoder"], cfg, jnp.asarray(x))
    got = np.asarray(SV._conv2d(params["quant_conv"], moments, padding=0))
    assert got.shape == ref.shape == (2, 8, 8, 8)
    assert np.abs(got - ref).max() < 5e-4


def test_decoder_parity(tiny_vae, rng):
    tm, cfg, params = tiny_vae
    t = 3
    z = rng.normal(size=(t, 4, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tm.decoder(torch.from_numpy(z), t).numpy()
    got = np.asarray(SV.decoder_forward(params["decoder"], cfg, jnp.asarray(z), t))
    assert got.shape == ref.shape == (3, 3, 8, 8)
    assert np.abs(got - ref).max() < 5e-4


def test_encode_decode_roundtrip_shapes(tiny_vae, rng):
    tm, cfg, params = tiny_vae
    x = rng.normal(size=(3, 3, 16, 16)).astype(np.float32)
    z = SV.encode_to_latent(params, cfg, jnp.asarray(x))
    assert z.shape == (3, 4, 8, 8)
    video = SV.decode(params, cfg, z, num_frames=3)
    assert video.shape == (3, 3, 16, 16)
    assert np.isfinite(np.asarray(video)).all()


def test_chunked_decode_matches(tiny_vae, rng):
    """Chunked decode must equal full decode when chunks align with frames...
    here chunk=1 frame means temporal convs see single frames (edge
    behavior of the reference's chunking, mod.rs:117-163)."""
    tm, cfg, params = tiny_vae
    z = rng.normal(size=(4, 4, 4, 4)).astype(np.float32)
    full = np.asarray(SV.decode(params, cfg, jnp.asarray(z), num_frames=4))
    chunked = np.asarray(SV.decode(params, cfg, jnp.asarray(z), num_frames=4,
                                   chunk_size=4))
    np.testing.assert_allclose(chunked, full, atol=1e-5)
