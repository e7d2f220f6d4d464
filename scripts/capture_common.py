"""Shared helpers for the diffusers capture scripts.

These scripts mirror the reference's capture harness
(/root/reference/scripts/capture_*.py, consumed by tests/verify_*.rs): they
run the REAL HuggingFace diffusers implementation and dump inputs + outputs
(+ state dicts) to safetensors fixtures that the JAX test suite
(tests/test_diffusers_fixtures.py) consumes when present and skips when
absent.

They require ``diffusers`` (and for the pipeline capture, real LTX
checkpoints); in environments without them every script exits cleanly with
a notice.  Run ``python scripts/capture_all_diffusers.py`` on any machine
with diffusers installed to produce the full fixture set.
"""

from __future__ import annotations

import os
import sys

import numpy as np

FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def require_diffusers(script: str):
    """Import diffusers or exit 0 with a notice (clean skip)."""
    try:
        import diffusers  # noqa: F401

        return diffusers
    except ImportError:
        print(f"[{script}] diffusers not installed — skipping capture. "
              "Install diffusers>=0.33 and re-run to produce this fixture.")
        sys.exit(0)


def state_dict_numpy(module, prefix: str = "weights."):
    """torch state dict → float32 numpy with a fixture prefix."""
    return {
        f"{prefix}{k}": v.detach().cpu().float().numpy()
        for k, v in module.state_dict().items()
    }


def save(path_name: str, tensors: dict):
    from safetensors.numpy import save_file

    os.makedirs(FIXTURES_DIR, exist_ok=True)
    path = os.path.join(FIXTURES_DIR, path_name)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)
    print(f"wrote {path} ({len(tensors)} tensors)")
    return path
