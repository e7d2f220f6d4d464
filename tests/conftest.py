"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs the
mesh path, and benches run on real TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the env var; force the platform via config.
# CVT_TEST_PLATFORM=axon opts in to running the suite on the real chip.
_platform = os.environ.get("CVT_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if _platform == "cpu":
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def assert_close(a, b, *, atol=1e-5, rtol=1e-5, msg=""):
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)


def mse(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.mean((a - b) ** 2))


def psnr(a, b, data_range: float = 255.0) -> float:
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / m))
