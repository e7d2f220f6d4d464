"""SVD scheduler (v-pred Euler/Karras) + CLIP vision parity tests.

Oracles: diffusers' published EulerDiscrete math (closed-form checks) and HF
transformers CLIPVisionModelWithProjection (real independent implementation).
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from candle_video_tpu.models.svd import scheduler as ES
from candle_video_tpu.models.svd import clip as CLIP
from candle_video_tpu.models.svd.configs import ClipEncoderConfig, EulerSchedulerConfig


def test_train_sigmas_scaled_linear():
    cfg = EulerSchedulerConfig()
    sig = ES._train_sigmas(cfg)
    assert sig.shape == (1000,)
    # closed form: betas = linspace(sqrt(b0), sqrt(b1), N)^2
    betas = np.linspace(math.sqrt(0.00085), math.sqrt(0.012), 1000) ** 2
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(sig, np.sqrt((1 - ac) / ac), rtol=1e-12)


def test_set_timesteps_default_svd():
    cfg = EulerSchedulerConfig()  # karras, leading, continuous
    sch = ES.set_timesteps(cfg, 25)
    assert sch.sigmas.shape == (26,)
    assert sch.sigmas[-1] == 0.0
    assert np.all(np.diff(sch.sigmas) < 0)  # decreasing
    # karras endpoints
    assert sch.sigmas[0] == pytest.approx(700.0, rel=1e-6)
    assert sch.sigmas[-2] == pytest.approx(0.002, rel=1e-6)
    # continuous timesteps = 0.25 ln(sigma)
    np.testing.assert_allclose(sch.timesteps, 0.25 * np.log(sch.sigmas[:-1]), rtol=1e-12)
    # leading spacing: init_noise_sigma = sqrt(sigma0^2+1)
    assert sch.init_noise_sigma == pytest.approx(math.sqrt(700.0**2 + 1))


def test_set_timesteps_discrete_linspace():
    cfg = EulerSchedulerConfig(
        use_karras_sigmas=False, timestep_spacing="linspace", timestep_type="discrete"
    )
    sch = ES.set_timesteps(cfg, 10)
    assert sch.timesteps[0] == 999.0
    assert sch.timesteps[-1] == 0.0
    assert sch.init_noise_sigma == pytest.approx(sch.sigmas[0])


def test_scale_model_input():
    x = jnp.ones((2, 4), jnp.float32)
    out = np.asarray(ES.scale_model_input(x, 3.0))
    np.testing.assert_allclose(out, 1.0 / math.sqrt(10.0), rtol=1e-6)


def test_v_prediction_step_formula(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4)), jnp.float32)
    mo = jnp.asarray(rng.normal(size=(1, 4, 4)), jnp.float32)
    sigma, sigma_next = 2.0, 1.0
    prev, x0 = ES.step(x, mo, sigma, sigma_next, "v_prediction")
    # diffusers: pred_x0 = mo * (-sigma/sqrt(s^2+1)) + x/(s^2+1)
    x0_ref = np.asarray(mo) * (-2.0 / math.sqrt(5.0)) + np.asarray(x) / 5.0
    np.testing.assert_allclose(np.asarray(x0), x0_ref, atol=1e-6)
    deriv = (np.asarray(x) - x0_ref) / 2.0
    np.testing.assert_allclose(
        np.asarray(prev), np.asarray(x) + (1.0 - 2.0) * deriv, atol=1e-6
    )


def test_epsilon_step_formula(rng):
    x = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    mo = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    prev, x0 = ES.step(x, mo, 0.5, 0.25, "epsilon")
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x) - 0.5 * np.asarray(mo), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(prev), np.asarray(x) - 0.25 * np.asarray(mo), atol=1e-6
    )


def test_add_noise():
    x = jnp.zeros((3,))
    n = jnp.ones((3,))
    np.testing.assert_allclose(np.asarray(ES.add_noise(x, n, 2.5)), 2.5)


# ---------------------------------------------------------------------------
# CLIP vision vs HF transformers
# ---------------------------------------------------------------------------

TINY_CLIP = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    image_size=28,
    patch_size=14,
    projection_dim=24,
)


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=TINY_CLIP["hidden_size"],
        intermediate_size=TINY_CLIP["intermediate_size"],
        num_hidden_layers=TINY_CLIP["num_hidden_layers"],
        num_attention_heads=TINY_CLIP["num_attention_heads"],
        image_size=TINY_CLIP["image_size"],
        patch_size=TINY_CLIP["patch_size"],
        projection_dim=TINY_CLIP["projection_dim"],
        hidden_act="quick_gelu",
    )
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    cfg = ClipEncoderConfig(**TINY_CLIP)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = CLIP.params_from_hf_state_dict(sd, cfg, jnp.float32)
    return model, cfg, params


def test_clip_forward_parity(tiny_clip, rng):
    model, cfg, params = tiny_clip
    x = rng.uniform(0, 1, size=(2, 3, 28, 28)).astype(np.float32)
    xn = np.asarray(CLIP.normalize_for_clip(jnp.asarray(x)))
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(xn)).image_embeds.numpy()
    got = np.asarray(CLIP.forward(params, cfg, jnp.asarray(xn)))
    assert got.shape == ref.shape == (2, 24)
    assert np.abs(got - ref).max() < 2e-4


def test_normalize_for_clip():
    x = jnp.ones((1, 3, 2, 2), jnp.float32)
    out = np.asarray(CLIP.normalize_for_clip(x))
    expected = (1.0 - CLIP.CLIP_MEAN) / CLIP.CLIP_STD
    np.testing.assert_allclose(out[0, :, 0, 0], expected, rtol=1e-5)
