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
    """Accumulate wall-clock for a named region into the span registry."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
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


def reset_spans() -> None:
    with _lock:
        _registry.clear()


def report(reset: bool = False) -> str:
    """Human-readable span table."""
    rows = sorted(spans().items(), key=lambda kv: -kv[1]["total_s"])
    lines = [f"{'span':<42} {'count':>7} {'total_s':>10} {'mean_ms':>9} "
             f"{'max_ms':>9}"]
    for name, rec in rows:
        mean_ms = rec["total_s"] / max(rec["count"], 1) * 1e3
        lines.append(f"{name:<42} {rec['count']:>7} {rec['total_s']:>10.3f} "
                     f"{mean_ms:>9.2f} {rec['max_s'] * 1e3:>9.2f}")
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
