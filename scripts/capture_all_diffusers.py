"""Run every diffusers capture script — ONE command to produce the full
golden-fixture set (the reference's scripts/capture_*.py role).

    python scripts/capture_all_diffusers.py

Per-script behavior:
- capture_scheduler_parity   — needs diffusers only
- capture_transformer_parity — needs diffusers; full model if LTX_TRANSFORMER_DIR
- capture_vae_parity         — needs diffusers; full VAE if LTX_VAE_DIR
- capture_pipeline_parity    — needs diffusers + LTX_MODEL_DIR checkpoint

Each skips cleanly when its prerequisites are missing, so this command is
safe to run anywhere; on a machine with diffusers + weights it produces
every fixture, and tests/test_diffusers_fixtures.py then runs them
unchanged.
"""

from __future__ import annotations

import subprocess
import sys
import os

_HERE = os.path.dirname(os.path.abspath(__file__))

SCRIPTS = [
    "capture_scheduler_parity.py",
    "capture_transformer_parity.py",
    "capture_vae_parity.py",
    "capture_pipeline_parity.py",
]


def main():
    failed = []
    for s in SCRIPTS:
        print(f"=== {s} ===", flush=True)
        rc = subprocess.call([sys.executable, os.path.join(_HERE, s)])
        if rc != 0:
            failed.append(s)
    if failed:
        sys.exit(f"capture scripts failed: {failed}")
    print("done.")


if __name__ == "__main__":
    main()
