"""SVD UNet spatio-temporal parity vs the torch mirror."""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import torch_svd  # noqa: E402

from candle_video_tpu.models.svd import unet as U  # noqa: E402
from candle_video_tpu.models.svd.configs import SvdUnetConfig  # noqa: E402
from candle_video_tpu.models.svd.loader import unet_params_from_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def tiny_unet():
    torch.manual_seed(0)
    tm = torch_svd.UNetSpatioTemporal(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        layers_per_block=1, cross_dim=16, heads=(2, 4),
        addition_time_embed_dim=8,
    ).eval()
    cfg = SvdUnetConfig(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        layers_per_block=1, cross_attention_dim=16, num_attention_heads=(2, 4),
        addition_time_embed_dim=8,
    )
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = unet_params_from_state_dict(sd, jnp.float32)
    return tm, cfg, params


def test_timestep_embedding_matches_mirror():
    t = np.array([1.0, 10.0, 100.0], np.float32)
    got = np.asarray(U.timestep_embedding(jnp.asarray(t), 64))
    ref = torch_svd.timestep_embedding(torch.from_numpy(t), 64).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_unet_forward_parity(tiny_unet, rng):
    tm, cfg, params = tiny_unet
    b, t, hh, ww = 1, 3, 8, 8
    sample = rng.normal(size=(b * t, 8, hh, ww)).astype(np.float32)
    enc = rng.normal(size=(b * t, 1, 16)).astype(np.float32) * 0.3
    timestep = np.array([0.5], np.float32)
    add_ids = np.array([[6.0, 127.0, 0.02]], np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(sample), torch.from_numpy(timestep),
            torch.from_numpy(enc), torch.from_numpy(add_ids), t,
        ).numpy()

    got = np.asarray(
        U.forward(
            params, cfg, jnp.asarray(sample), jnp.asarray(timestep),
            jnp.asarray(enc), jnp.asarray(add_ids), t,
        )
    )
    assert got.shape == ref.shape == (3, 4, 8, 8)
    assert np.abs(got - ref).max() < 5e-3
    assert np.mean((got - ref) ** 2) < 1e-6


def test_unet_temporal_mixing_active(tiny_unet, rng):
    """Permuting frames must change outputs (temporal paths are live)."""
    tm, cfg, params = tiny_unet
    b, t, hh, ww = 1, 3, 8, 8
    sample = rng.normal(size=(b * t, 8, hh, ww)).astype(np.float32)
    enc = rng.normal(size=(b * t, 1, 16)).astype(np.float32) * 0.3
    timestep = np.array([0.5], np.float32)
    add_ids = np.array([[6.0, 127.0, 0.02]], np.float32)

    out1 = np.asarray(U.forward(params, cfg, jnp.asarray(sample),
                                jnp.asarray(timestep), jnp.asarray(enc),
                                jnp.asarray(add_ids), t))
    perm = sample[::-1].copy()
    out2 = np.asarray(U.forward(params, cfg, jnp.asarray(perm),
                                jnp.asarray(timestep), jnp.asarray(enc),
                                jnp.asarray(add_ids), t))
    # reversed frames should not just be the reversed output (frame-position
    # embeddings + temporal convs break the symmetry)
    assert np.abs(out2[::-1] - out1).max() > 1e-4
