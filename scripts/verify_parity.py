"""Manual parity runner — the reference's examples/verify_* role.

Regenerates golden fixtures from the torch mirrors, runs every JAX
counterpart, and prints a parity table (max-abs / MSE / envelope verdicts).

Usage: python scripts/verify_parity.py
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    import numpy as np

    fixtures = os.path.join(os.path.dirname(_HERE), "fixtures")
    if not os.path.isdir(fixtures):
        print("generating fixtures...")
        subprocess.run(
            [sys.executable, os.path.join(_HERE, "gen_fixtures.py"), "--out", fixtures],
            check=True,
        )

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", os.environ.get("CVT_VERIFY_PLATFORM", "cpu"))
    except Exception:
        pass

    import pytest

    rc = pytest.main(
        [
            os.path.join(os.path.dirname(_HERE), "tests", "test_fixtures.py"),
            "-v", "--no-header",
        ]
    )
    print("\nparity envelopes (see docs/benchmark_results.md):")
    print("  DiT max-abs < 2e-3 | VAE atol 5e-4 | T5 max-abs < 2e-4")
    return int(rc)


if __name__ == "__main__":
    sys.exit(main())
