"""Overlapped host reads of device arrays.

On the relay-attached chip every blocking ``np.asarray(device_array)``
costs a full round-trip (~30 ms) ON TOP of any still-running compute the
read must wait for. When several results are pending (one per robot per
poll cycle in the single-process simulator, or several search/verify
handles queued by the async detection plane), issuing all the host copies
asynchronously first and only then blocking collapses N round-trips into
roughly one: the copies travel concurrently, and each subsequent
``np.asarray`` finds its buffer already in flight.

``jax.Array.copy_to_host_async()`` is part of the public Array API; a
backend that does not implement it (or implements it synchronously) is
handled by the try/except — correctness never depends on the overlap.
"""
from __future__ import annotations

from typing import Iterable, List

import numpy as np


def prefetch(arrays: Iterable) -> None:
    """Start async device->host copies for every array (best-effort)."""
    for a in arrays:
        start = getattr(a, "copy_to_host_async", None)
        if start is None:
            continue
        try:
            start()
        except Exception:  # pragma: no cover - backend without async copy
            pass


def fetch(arrays: Iterable) -> List[np.ndarray]:
    """Materialize several device arrays with overlapped copies."""
    arrs = list(arrays)
    prefetch(arrs)
    return [np.asarray(a) for a in arrs]


def ready(arrays: Iterable) -> bool:
    """True when every array's computation has finished (best-effort).

    ``jax.Array.is_ready()`` consults the client-side future state — no
    device round-trip. Harvest planes use it to defer blocking reads of
    results still queued behind big programs (MAC solves, verify batches)
    on the serialized relay executor; a backend without the method counts
    as ready (the age bound alone then gates the harvest).
    """
    for a in arrays:
        f = getattr(a, "is_ready", None)
        if f is None:
            continue
        try:
            if not f():
                return False
        except Exception:  # pragma: no cover - backend quirk
            pass
    return True
