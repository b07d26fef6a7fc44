"""Tracing and profiling hooks.

The reference's timing is metric-grade only (cumulative PGO/sparsification
wall-clock, SURVEY.md §5 "no structured tracer"). Here:

- ``span(name)`` — host-side span timing with an accumulating registry
  (count / total / max per span), cheap enough to leave on in production;
- ``device_trace(logdir)`` — wraps ``jax.profiler.trace`` so any region can
  be captured for TensorBoard/XProf with per-kernel device timelines;
- ``annotate(name)`` — ``jax.profiler.TraceAnnotation`` passthrough to label
  host regions inside a device trace.
"""
from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, Iterator

_lock = threading.Lock()
_registry: Dict[str, Dict[str, float]] = {}


@contextlib.contextmanager
def span(name: str) -> Iterator[None]:
    """Accumulate wall-clock for a named region into the span registry.

    Spans entered from non-main threads (e.g. the background tier
    prefetcher, which drives the SAME dispatch chokepoints as production)
    are recorded under ``name (bg)``: their time is concurrent with the
    main loop, and folding it in silently inflated the round-4 e2e span
    table (mac.fw_dispatch "131 s" included 60+ s of background prefetch
    compiles that never blocked the pipeline)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if threading.current_thread() is not threading.main_thread():
            name = name + " (bg)"
        with _lock:
            rec = _registry.setdefault(
                name, {"count": 0, "total_s": 0.0, "max_s": 0.0})
            rec["count"] += 1
            rec["total_s"] += dt
            rec["max_s"] = max(rec["max_s"], dt)


def spans() -> Dict[str, Dict[str, float]]:
    """Snapshot of the span registry."""
    with _lock:
        return {k: dict(v) for k, v in _registry.items()}


_counters: Dict[str, float] = {}


def counter(name: str, n: float = 1.0) -> None:
    """Accumulate a named event count (rates, hit/miss tallies). Reported
    alongside the span table; reset with :func:`reset_spans`."""
    with _lock:
        _counters[name] = _counters.get(name, 0.0) + n


def counters() -> Dict[str, float]:
    with _lock:
        return dict(_counters)


def reset_spans() -> None:
    with _lock:
        _registry.clear()
        _counters.clear()


def report(reset: bool = False) -> str:
    """Human-readable span table."""
    rows = sorted(spans().items(), key=lambda kv: -kv[1]["total_s"])
    lines = [f"{'span':<42} {'count':>7} {'total_s':>10} {'mean_ms':>9} "
             f"{'max_ms':>9}"]
    for name, rec in rows:
        mean_ms = rec["total_s"] / max(rec["count"], 1) * 1e3
        lines.append(f"{name:<42} {rec['count']:>7} {rec['total_s']:>10.3f} "
                     f"{mean_ms:>9.2f} {rec['max_s'] * 1e3:>9.2f}")
    cnts = counters()
    if cnts:
        lines.append(f"{'counter':<42} {'value':>7}")
        for name in sorted(cnts):
            lines.append(f"{name:<42} {cnts[name]:>7.0f}")
    if reset:
        reset_spans()
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax device profile (TensorBoard/XProf format)."""
    import jax
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Label a host region inside a device trace."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class CompileWatch:
    """Count (and name) XLA compiles inside a region.

    Steady-state product paths must not compile — every mid-run compile is
    a warmup/tier-coverage bug costing 10-60 s on the relay-attached chip
    (the lidar e2e spent 60% of its round-3 wall-clock this way). Wrap the
    steady region and assert ``watch.count == 0``; ``watch.names`` says
    which program slipped through.

    Implemented as a logging handler on jax's compile logs, so it sees
    compiles regardless of which API triggered them.
    """

    def __init__(self):
        self.count = 0
        self.names: list = []
        # compiles from non-main threads (the background tier prefetcher)
        # are intentional — report them separately so a prefetch doing its
        # job is not mistaken for a warmup-coverage bug
        self.background_count = 0
        self.background_names: list = []
        # jax's cache-miss explanations (main thread only): WHY each
        # program missed the tracing cache — names the differing
        # shape/static against the closest warmed key, so a tier-coverage
        # bug diagnoses itself from the bench log instead of needing an
        # offline repro
        self.miss_explanations: list = []

    def __enter__(self):
        import logging
        import threading
        import jax
        self._flag = jax.config.jax_log_compiles
        jax.config.update("jax_log_compiles", True)
        self._explain_flag = jax.config.jax_explain_cache_misses
        jax.config.update("jax_explain_cache_misses", True)

        watch = self
        main = threading.main_thread()

        class _H(logging.Handler):
            def emit(self, record):
                msg = record.getMessage()
                if "TRACING CACHE MISS" in msg:
                    if (threading.current_thread() is main
                            and len(watch.miss_explanations) < 50):
                        watch.miss_explanations.append(msg)
                    return
                if "Compiling" in msg or "Finished XLA compilation" in msg:
                    if "Compiling" in msg:
                        name = msg.split()[1].strip("'\"")
                        if threading.current_thread() is main:
                            watch.count += 1
                            watch.names.append(name)
                        else:
                            watch.background_count += 1
                            watch.background_names.append(name)

        self._handler = _H(level=0)
        self._loggers = [logging.getLogger(n) for n in
                         ("jax._src.interpreters.pxla", "jax._src.dispatch",
                          "jax._src.compiler",
                          "jax._src.interpreters.partial_eval")]
        for lg in self._loggers:
            lg.addHandler(self._handler)
        return self

    def __exit__(self, *exc):
        import jax
        for lg in self._loggers:
            lg.removeHandler(self._handler)
        jax.config.update("jax_log_compiles", self._flag)
        jax.config.update("jax_explain_cache_misses", self._explain_flag)
        return False
