#!/usr/bin/env bash
# Pre-snapshot gate: the FULL test suite must be green before any
# end-of-round snapshot commit (round-3 judge finding: a stale test
# constant was committed without running the suite, leaving the tree RED).
#
# Usage: bash scripts/presnapshot.sh
# Exits non-zero if any test fails; prints the suite summary either way.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[presnapshot] building native/ (C++ GGUF-dequant + PCG32 kernels)..." >&2
if ! make -C native >&2; then
    # native build failure must not hide the suite result, but say so loudly:
    # without the .so files the two bit-exactness tests silently skip
    echo "[presnapshot] WARNING: native build failed — C++ parity tests will SKIP" >&2
fi

echo "[presnapshot] running full suite..." >&2
python -m pytest tests/ -q --tb=short 2>&1 | tail -20
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
    echo "[presnapshot] SUITE RED (rc=$rc) — do NOT snapshot" >&2
    exit "$rc"
fi
echo "[presnapshot] suite green — safe to snapshot" >&2
