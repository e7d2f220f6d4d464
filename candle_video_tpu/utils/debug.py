"""Observability: structured logging, env-gated tensor-dump hooks, profiling.

The reference's debug observability is compile-time/env-gated print probes
(DEBUG_VAE const vae.rs:26, DEBUG_T5 env quantized_t5_encoder.rs:206-214, a
DUMP_TENSORS dumper in the SVD module) plus criterion benches.  Here:

- ``log``: structured stderr logging gated by CVT_LOG (off|info|debug),
- ``dump_tensor``: env-gated safetensors dumps (CVT_DUMP_TENSORS=dir) for
  rebuilding the parity workflow against other implementations,
- ``trace``: a jax.profiler context for TPU traces (CVT_PROFILE=dir),
- ``stage_timer``: per-stage wall-clock accounting for pipeline runs.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Dict, Optional

_LEVELS = {"off": 0, "info": 1, "debug": 2}


def _level() -> int:
    return _LEVELS.get(os.environ.get("CVT_LOG", "off").lower(), 0)


def log(stage: str, message: str = "", level: str = "info", **fields):
    if _LEVELS.get(level, 1) > _level():
        return
    rec = {"ts": round(time.time(), 3), "stage": stage, "msg": message}
    rec.update(fields)
    print(json.dumps(rec), file=sys.stderr, flush=True)


_DUMP_COUNTER = 0


def dump_tensor(name: str, array, step: Optional[int] = None):
    """Save a tensor to $CVT_DUMP_TENSORS/<name>[_stepN].safetensors."""
    out_dir = os.environ.get("CVT_DUMP_TENSORS")
    if not out_dir:
        return
    global _DUMP_COUNTER
    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    suffix = f"_step{step}" if step is not None else ""
    path = os.path.join(out_dir, f"{_DUMP_COUNTER:03d}_{name}{suffix}.safetensors")
    _DUMP_COUNTER += 1
    save_file({"tensor": np.asarray(array, np.float32)}, path)
    log("dump", f"wrote {path}", level="debug")


@contextlib.contextmanager
def trace(name: str = "cvt"):
    """jax.profiler trace if CVT_PROFILE=<dir> is set, else no-op."""
    out_dir = os.environ.get("CVT_PROFILE")
    if not out_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(out_dir, name)):
        yield


class StageTimer:
    """Wall-clock accounting per pipeline stage (the reference's runtime-split
    table, docs/benchmark_results.md:58-65)."""

    def __init__(self):
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def report(self) -> Dict[str, float]:
        total = sum(self.stages.values()) or 1.0
        rep = {k: round(v, 3) for k, v in self.stages.items()}
        rep["_shares"] = {
            k: f"{100*v/total:.1f}%" for k, v in self.stages.items()
        }
        return rep
