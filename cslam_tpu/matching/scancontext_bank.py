"""Scan Context descriptor bank with two-stage device search.

Equivalent of the reference ``ScanContextMatching``
(``cslam/lidar_pr/scancontext_matching.py``): stage 1 shortlists by ring-key
nearest neighbors (the reference builds a host KDTree per query,
ll.59-65 — here it is one batched euclidean top-k on device), stage 2 runs
the full rotation-shift distance on the shortlist (vectorized, see
``cslam_tpu.ops.scancontext``).

Interface parity with the NNS bank: ``add_item / search / search_best``,
so ``LoopClosureSparseMatching`` is sensor-agnostic, like the reference
(``loop_closure_sparse_matching.py:21-31``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops import scancontext as sc_ops
from cslam_tpu.ops import topk as topk_ops


class ScanContextBank:
    """Growable bank of Scan Context descriptors."""

    def __init__(self, shape: Tuple[int, int] = (20, 60),
                 num_candidates: int = 10, threshold: float = 0.15,
                 capacity: int = 1024):
        self.shape = tuple(shape)
        self.num_candidates = num_candidates
        self.threshold = threshold
        self.items: Dict[int, Any] = {}
        self.nb_items = 0
        self._capacity = capacity
        self._sc_host = np.zeros((capacity,) + self.shape, np.float32)
        self._rk_host = np.zeros((capacity, self.shape[0]), np.float32)
        self._rk_bank: Optional[jax.Array] = None
        self._rk_sq_norms: Optional[jax.Array] = None
        self._sc_bank: Optional[jax.Array] = None
        self._device_n = 0

    # reference-compatible aliases
    @property
    def n(self) -> int:
        return self.nb_items

    @property
    def scancontexts(self) -> np.ndarray:
        return self._sc_host

    @property
    def ringkeys(self) -> np.ndarray:
        return self._rk_host

    def add_item(self, descriptor: np.ndarray, item: Any) -> None:
        sc = np.asarray(descriptor, np.float32).reshape(self.shape)
        if self.nb_items >= self._capacity:
            self._grow()
        self._sc_host[self.nb_items] = sc
        self._rk_host[self.nb_items] = np.asarray(sc_ops.ring_key(sc))
        self.items[self.nb_items] = item
        self.nb_items += 1

    def _grow(self) -> None:
        self._capacity *= 2
        sc = np.zeros((self._capacity,) + self.shape, np.float32)
        rk = np.zeros((self._capacity, self.shape[0]), np.float32)
        sc[:self.nb_items] = self._sc_host[:self.nb_items]
        rk[:self.nb_items] = self._rk_host[:self.nb_items]
        self._sc_host, self._rk_host = sc, rk
        self._rk_bank = None
        self._device_n = 0

    def _sync_device(self) -> None:
        if self._rk_bank is None:
            self._rk_bank = jnp.zeros((self._capacity, self.shape[0]),
                                      jnp.float32)
            self._rk_sq_norms = jnp.zeros((self._capacity,), jnp.float32)
            self._sc_bank = jnp.zeros((self._capacity,) + self.shape,
                                      jnp.float32)
            self._device_n = 0
        if self._device_n < self.nb_items:
            lo, hi = self._device_n, self.nb_items
            rk = jnp.asarray(self._rk_host[lo:hi])
            self._rk_bank = jax.lax.dynamic_update_slice(
                self._rk_bank, rk, (lo, 0))
            self._rk_sq_norms = jax.lax.dynamic_update_slice(
                self._rk_sq_norms, jnp.sum(rk * rk, axis=-1), (lo,))
            self._sc_bank = jax.lax.dynamic_update_slice(
                self._sc_bank, jnp.asarray(self._sc_host[lo:hi]), (lo, 0, 0))
            self._device_n = self.nb_items

    # ------------------------------------------------------------------

    def search(self, query: np.ndarray, k: int) -> Tuple[List[Any], List[Any]]:
        """Best match by two-stage search. Returns single-element lists,
        matching the reference interface quirk (``scancontext_matching.py:46-87``
        ignores k and returns one match)."""
        if self.nb_items < 1:
            return [None], [None]
        self._sync_device()
        query_sc = jnp.asarray(np.asarray(query, np.float32).reshape(self.shape))
        rk_q = sc_ops.ring_key(query_sc)[None, :]

        shortlist = min(self.num_candidates, self.nb_items)
        _, idx = topk_ops.euclidean_topk(
            self._rk_bank, self._rk_sq_norms, jnp.int32(self.nb_items),
            rk_q, self.num_candidates)
        idx = np.asarray(idx[0][:shortlist])

        candidates = self._sc_bank[jnp.asarray(idx)]
        dists, _yaws = sc_ops.scancontext_distances_batch(candidates, query_sc)
        dists = np.asarray(dists)

        best = int(np.argmin(dists))
        if dists[best] < 1.0:
            return [self.items[int(idx[best])]], [float(1.0 - dists[best])]
        # reference fallback: no candidate under the max distance -> first
        # item with similarity 0 (``scancontext_matching.py:80-83``)
        return [self.items[0]], [0.0]

    def search_best(self, query: np.ndarray) -> Tuple[Any, Optional[float]]:
        if self.nb_items < 1:
            return None, None
        items, sims = self.search(query, 1)
        return items[0], sims[0]
