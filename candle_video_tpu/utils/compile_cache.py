"""Persistent-XLA-cache setup + compile-event accounting.

Two round-5 findings this module encodes (diagnosed on the live tunnel):

1. In JAX 0.9 the ``JAX_COMPILATION_CACHE_DIR`` environment variable is
   NOT read by the config machinery (``optional_string_state`` has no env
   hook) — ``jax.config.update("jax_compilation_cache_dir", ...)`` is
   required.  Every earlier bench set only the env var, so the cold-start
   benchmark never actually had a persistent cache; its "warm" run paid
   the full remote compile again (BENCH_r04: warm 79 s vs cold 54 s —
   pure tunnel noise, no cache at all).

2. On the axon tunnel plugin the cache must stay OFF: serialized
   executables deserialize instantly but the first execution of a
   deserialized executable never returns (probe: "Persistent compilation
   cache hit for 'jit_f'" logged, then a >4 min hang on a 1024x1024
   matmul that runs in ms when compiled directly).  A cache hit is
   therefore strictly worse than a recompile there.

``CVT_XLA_CACHE=1`` / ``=0`` force-overrides the heuristic either way.
"""

from __future__ import annotations

import logging
import os
import threading


def backend_supports_cache_load() -> bool:
    """True unless the registered backend is the axon tunnel plugin (its
    deserialized executables hang at first execution — see module doc)."""
    import jax._src.xla_bridge as xb

    try:
        return "axon" not in xb.backends()
    except Exception:  # pragma: no cover — conservative on exotic setups
        return False


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Point JAX's persistent compile cache at ``cache_dir`` when the
    backend can actually load from it.  Returns True if enabled."""
    import jax

    forced = os.environ.get("CVT_XLA_CACHE")
    if forced == "0":
        return False
    if forced != "1" and not backend_supports_cache_load():
        return False
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/candle_video_tpu_xla"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True


class CompileCounter(logging.Handler):
    """Counts XLA compilations and sums their wall-clock by listening to
    jax's "Finished XLA compilation of <name> in <t> sec" log events.

    Makes cache behavior *visible*: a warm start with a working persistent
    cache shows ~0 compiles/seconds; on backends where the cache cannot
    work (axon), the counter documents exactly what the warm run re-paid.
    """

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.count = 0
        self.total_s = 0.0
        self._lock2 = threading.Lock()
        self._logger = None

    def emit(self, record):  # noqa: D102 — logging.Handler API
        msg = record.getMessage()
        if "Finished XLA compilation" not in msg:
            return
        try:
            secs = float(msg.rsplit(" in ", 1)[1].split(" sec")[0])
        except (IndexError, ValueError):
            secs = 0.0
        with self._lock2:
            self.count += 1
            self.total_s += secs

    def install(self):
        import jax

        jax.config.update("jax_log_compiles", True)
        self._logger = logging.getLogger("jax._src.dispatch")
        # WARNING-level so the events reach handlers without global DEBUG
        if self._logger.level > logging.WARNING or self._logger.level == 0:
            self._logger.setLevel(logging.WARNING)
        self._logger.addHandler(self)
        return self

    def snapshot(self) -> tuple[int, float]:
        with self._lock2:
            return self.count, self.total_s
