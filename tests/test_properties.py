"""Property-based tests (hypothesis) — the reference's Tier-3 proptest suite
(verify_vae_property_tests.rs, cfg/rope proptest blocks)."""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from candle_video_tpu.models.ltx_video import pipeline as P
from candle_video_tpu.models.ltx_video import scheduler as S
from candle_video_tpu.models.ltx_video import vae as V

_dims = st.integers(min_value=1, max_value=4)


@settings(max_examples=30, deadline=None)
@given(
    b=st.integers(1, 2),
    c=st.integers(1, 8),
    f=_dims,
    h=_dims,
    w=_dims,
    seed=st.integers(0, 2**31 - 1),
)
def test_pack_unpack_roundtrip_prop(b, c, f, h, w, seed):
    x = np.random.default_rng(seed).normal(size=(b, c, f, h, w)).astype(np.float32)
    packed = P.pack_latents(jnp.asarray(x), 1, 1)
    back = P.unpack_latents(packed, f, h, w, 1, 1)
    np.testing.assert_array_equal(np.asarray(back), x)


@settings(max_examples=30, deadline=None)
@given(
    scaling=st.floats(0.1, 5.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_normalize_denormalize_roundtrip_prop(scaling, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(1, 4, 2, 3, 3)).astype(np.float32)
    mean = rng.normal(size=(4,)).astype(np.float32)
    std = (rng.random(4) + 0.25).astype(np.float32)
    n = V.normalize_latents(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std), scaling)
    back = V.denormalize_latents(n, jnp.asarray(mean), jnp.asarray(std), scaling)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


@settings(max_examples=25, deadline=None)
@given(
    steps=st.integers(2, 60),
    shift=st.floats(0.5, 6.0),
    terminal=st.one_of(st.none(), st.floats(0.05, 0.5)),
)
def test_schedule_monotonic_prop(steps, shift, terminal):
    cfg = S.FlowMatchEulerSchedulerConfig(shift=shift, shift_terminal=terminal)
    sch = S.set_timesteps(cfg, num_inference_steps=steps)
    assert sch.sigmas.shape == (steps + 1,)
    assert np.all(np.diff(sch.sigmas) < 1e-7)  # strictly decreasing (to 0)
    assert sch.sigmas[-1] == 0.0
    assert sch.sigmas[0] <= 1.0 + 1e-6
    if terminal is not None:
        assert abs(sch.sigmas[-2] - terminal) < 1e-4


@settings(max_examples=25, deadline=None)
@given(mu=st.floats(-3.0, 3.0), steps=st.integers(2, 40))
def test_dynamic_shift_preserves_endpoints_prop(mu, steps):
    cfg = S.FlowMatchEulerSchedulerConfig()
    sch = S.set_timesteps(cfg, num_inference_steps=steps, mu=mu)
    # shift maps (0,1] -> (0,1], monotonic
    assert np.all(sch.sigmas[:-1] > 0)
    assert np.all(sch.sigmas[:-1] <= 1.0 + 1e-6)
    assert np.all(np.diff(sch.sigmas[:-1]) < 1e-7)


@settings(max_examples=20, deadline=None)
@given(
    blend=st.integers(0, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_blend_h_boundary_prop(blend, seed):
    """Blend output equals a at offset 0 (w=0) and approaches b at the end."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(1, 2, 2, 3, 10)).astype(np.float32)
    b = rng.normal(size=(1, 2, 2, 3, 10)).astype(np.float32)
    out = np.asarray(V.blend_h(jnp.asarray(a), jnp.asarray(b), blend))
    assert out.shape == b.shape
    if blend > 0:
        # first blended column is pure a (weight 0 for b)
        np.testing.assert_allclose(out[..., 0], a[..., -blend], atol=1e-6)
    # tail beyond blend region is untouched b
    np.testing.assert_array_equal(out[..., blend:], b[..., blend:])


@settings(max_examples=20, deadline=None)
@given(
    sigma=st.floats(0.01, 1.0),
    sigma_next=st.floats(0.0, 1.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_euler_step_linearity_prop(sigma, sigma_next, seed):
    """step(x, v) is affine: step(x, 2v) - step(x, v) == (s_next - s) * v."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    a = np.asarray(S.step(x, v, sigma, sigma_next))
    b = np.asarray(S.step(x, 2 * v, sigma, sigma_next))
    np.testing.assert_allclose(b - a, (sigma_next - sigma) * np.asarray(v), atol=1e-5)
