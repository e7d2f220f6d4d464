#!/usr/bin/env bash
# Pre-snapshot gate: the FULL test suite must be green before any
# end-of-round snapshot commit (round-3 judge finding: a stale test
# constant was committed without running the suite, leaving the tree RED).
#
# Usage: bash scripts/presnapshot.sh
# Exits non-zero if any test fails; prints the suite summary either way.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[presnapshot] running full suite..." >&2
python -m pytest tests/ -q --tb=short 2>&1 | tail -20
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
    echo "[presnapshot] SUITE RED (rc=$rc) — do NOT snapshot" >&2
    exit "$rc"
fi
echo "[presnapshot] suite green — safe to snapshot" >&2
