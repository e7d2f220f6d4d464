"""Scheduler parity + property tests.

Mirrors the reference's verify_scheduler_parity suite (tests/
verify_scheduler_parity.rs): timestep construction, shift formulas, terminal
stretch, Euler step — here validated against independent closed-form math and
an independent torch mirror of the diffusers scheduler where needed.
"""

import math

import numpy as np
import pytest

from candle_video_tpu.models.ltx_video import scheduler as S


def ltx_config(**kw):
    base = dict(
        num_train_timesteps=1000,
        shift=1.0,
        use_dynamic_shifting=False,
        base_shift=0.95,
        max_shift=2.05,
        base_image_seq_len=1024,
        max_image_seq_len=4096,
        shift_terminal=0.1,
        time_shift_type="exponential",
    )
    base.update(kw)
    return S.FlowMatchEulerSchedulerConfig(**base)


def test_init_sigmas_linear_when_shift_1():
    cfg = ltx_config()
    sig, ts = S.init_sigmas(cfg)
    assert sig.shape == (1000,)
    assert sig[0] == pytest.approx(1.0)
    assert sig[-1] == pytest.approx(0.001)
    assert np.all(np.diff(sig) < 0)
    np.testing.assert_allclose(ts, sig * 1000.0, rtol=1e-6)


def test_init_sigmas_static_shift():
    cfg = ltx_config(shift=3.0)
    sig, _ = S.init_sigmas(cfg)
    s_lin = np.arange(1, 1001, dtype=np.float32)[::-1] / 1000.0
    expected = 3.0 * s_lin / (1.0 + 2.0 * s_lin)
    np.testing.assert_allclose(sig, expected, rtol=1e-6)


def test_time_shift_exponential_formula():
    cfg = ltx_config()
    t = np.array([0.25, 0.5, 0.9], dtype=np.float32)
    mu = 1.5
    out = S.time_shift(cfg, mu, 1.0, t)
    expected = math.e**mu / (math.e**mu + (1.0 / t - 1.0))
    np.testing.assert_allclose(out, expected.astype(np.float32), rtol=1e-5)


def test_time_shift_identity_at_mu0():
    cfg = ltx_config()
    t = np.linspace(0.05, 1.0, 20).astype(np.float32)
    out = S.time_shift(cfg, 0.0, 1.0, t)
    np.testing.assert_allclose(out, t, rtol=1e-5)


def test_stretch_terminal():
    cfg = ltx_config(shift_terminal=0.1)
    t = np.array([1.0, 0.9, 0.725], dtype=np.float32)
    out = S.stretch_shift_to_terminal(cfg, t)
    assert out[-1] == pytest.approx(0.1, abs=1e-6)
    assert out[0] == pytest.approx(1.0, abs=1e-6)


def test_set_timesteps_default_ltx_40_steps():
    cfg = ltx_config()
    mu = S.calculate_shift(4992, 1024, 4096, 0.95, 2.05)
    sch = S.set_timesteps(cfg, num_inference_steps=40, mu=mu)
    assert sch.sigmas.shape == (41,)
    assert sch.timesteps.shape == (40,)
    assert sch.sigmas[-1] == 0.0
    assert sch.sigmas[0] == pytest.approx(1.0)
    assert sch.sigmas[-2] == pytest.approx(0.1, abs=1e-5)  # terminal stretch
    assert np.all(np.diff(sch.sigmas) < 1e-9)
    np.testing.assert_allclose(sch.timesteps, sch.sigmas[:-1] * 1000.0, rtol=1e-6)


def test_set_timesteps_distilled_custom_sigmas():
    # 0.9.8-2b-distilled preset: custom sigmas passed with mu=0
    cfg = ltx_config()
    custom = [1.0000, 0.9937, 0.9875, 0.9812, 0.9750, 0.9094, 0.7250]
    sch = S.set_timesteps(cfg, num_inference_steps=7, sigmas=custom, mu=0.0)
    assert sch.num_inference_steps == 7
    # mu=0 exponential shift is identity; then terminal stretch to 0.1
    scale = (1.0 - 0.7250) / (1.0 - 0.1)
    expected = 1.0 - (1.0 - np.array(custom, np.float32)) / scale
    np.testing.assert_allclose(sch.sigmas[:-1], expected, rtol=1e-5)
    assert sch.sigmas[-1] == 0.0
    assert sch.sigmas[-2] == pytest.approx(0.1, abs=1e-6)


def test_karras_exponential_beta_transforms():
    cfg_k = ltx_config(use_karras_sigmas=True, shift_terminal=None)
    cfg_e = ltx_config(use_exponential_sigmas=True, shift_terminal=None)
    cfg_b = ltx_config(use_beta_sigmas=True, shift_terminal=None)
    for cfg in (cfg_k, cfg_e, cfg_b):
        sch = S.set_timesteps(cfg, num_inference_steps=10)
        assert sch.sigmas.shape == (11,)
        assert np.all(np.diff(sch.sigmas[:-1]) < 0)
        assert sch.sigmas[0] <= 1.0 + 1e-6

    # karras closed form
    sch = S.set_timesteps(cfg_k, num_inference_steps=5)
    sig = np.arange(1, 1001, dtype=np.float32)[::-1] / 1000.0
    smin, smax = sig[-1], sig[0]
    ramp = np.linspace(0, 1, 5, dtype=np.float32)
    expected = (smax ** (1 / 7.0) + ramp * (smin ** (1 / 7.0) - smax ** (1 / 7.0))) ** 7.0
    np.testing.assert_allclose(sch.sigmas[:-1], expected, rtol=1e-4)


def test_invert_sigmas():
    cfg = ltx_config(invert_sigmas=True, shift_terminal=None)
    sch = S.set_timesteps(cfg, num_inference_steps=10)
    assert sch.sigmas[-1] == 1.0
    assert np.all(np.diff(sch.sigmas) > -1e-9)


def test_mutually_exclusive_sigma_transforms():
    with pytest.raises(ValueError):
        ltx_config(use_karras_sigmas=True, use_beta_sigmas=True)


def test_index_for_timestep_duplicate_policy():
    sch = S.Schedule(
        sigmas=np.array([0.9, 0.5, 0.5, 0.1, 0.0], np.float32),
        timesteps=np.array([900.0, 500.0, 500.0, 100.0], np.float32),
        num_inference_steps=4,
    )
    assert S.index_for_timestep(sch, 900.0) == 0
    assert S.index_for_timestep(sch, 500.0) == 2  # second occurrence
    with pytest.raises(ValueError):
        S.index_for_timestep(sch, 123.0)


def test_euler_step_math():
    import jax.numpy as jnp

    x = jnp.ones((2, 8, 4), jnp.float32) * 0.5
    v = jnp.ones((2, 8, 4), jnp.float32) * 2.0
    out = S.step(x, v, 0.9, 0.7)
    np.testing.assert_allclose(np.asarray(out), 0.5 + (0.7 - 0.9) * 2.0, rtol=1e-6)
    assert out.dtype == jnp.float32

    # bf16 input upcasts to f32 output (precision fix, scheduler.rs:589-594)
    out = S.step(x.astype(jnp.bfloat16), v.astype(jnp.bfloat16), 0.9, 0.7)
    assert out.dtype == jnp.float32


def test_euler_step_stochastic():
    import jax.numpy as jnp

    x = jnp.full((4, 4), 1.0)
    v = jnp.full((4, 4), 0.5)
    noise = jnp.full((4, 4), 2.0)
    out = S.step(x, v, 0.8, 0.4, stochastic=True, noise=noise)
    x0 = 1.0 - 0.8 * 0.5
    expected = (1 - 0.4) * x0 + 0.4 * 2.0
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_scale_noise():
    import jax.numpy as jnp

    sample = jnp.ones((2, 3, 4))
    noise = jnp.zeros((2, 3, 4))
    out = S.scale_noise(sample, jnp.asarray([0.25, 0.75]), noise)
    np.testing.assert_allclose(np.asarray(out)[0], 0.75, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1], 0.25, rtol=1e-6)


def test_step_per_token_matches_scalar_step():
    import jax.numpy as jnp

    cfg = ltx_config(shift_terminal=None)
    sch = S.set_timesteps(cfg, num_inference_steps=10)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 4)), jnp.float32)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(1, 6, 4)), jnp.float32)
    i = 3
    t = sch.timesteps[i]
    per_token = jnp.full((1, 6), t, jnp.float32)
    out_pt = S.step_per_token(x, v, sch.sigmas, per_token)
    out = S.step(x, v, sch.sigmas[i], sch.sigmas[i + 1])
    np.testing.assert_allclose(np.asarray(out_pt), np.asarray(out), atol=1e-5)


def test_calculate_shift():
    # linear interpolation endpoints
    assert S.calculate_shift(1024, 1024, 4096, 0.95, 2.05) == pytest.approx(0.95)
    assert S.calculate_shift(4096, 1024, 4096, 0.95, 2.05) == pytest.approx(2.05)
