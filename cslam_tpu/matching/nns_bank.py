"""Fixed-capacity descriptor bank with device-side batched cosine top-k.

TPU-era equivalent of the reference's ``NearestNeighborsMatching``
(``cslam/nns_matching.py``): same duck-typed ``add_item / search /
search_best`` interface (so the sparse-matching layer and tests port
directly), but the O(N)-per-query Python loop becomes one jitted MXU matmul
+ ``top_k`` over an HBM-resident padded bank.

Design notes:
- Host numpy storage is the source of truth; appends are O(1). The device
  mirror is synchronized lazily in one chunked write right before a search,
  so the per-keyframe ingest path never blocks on device transfers.
- Capacity doubles when full (reference doubles too, ``nns_matching.py:31-37``);
  each capacity tier is a separate compiled program, reused across banks.
- ``k`` is bucketed to a small set of static values to bound compile count.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops import topk as topk_ops

_DEFAULT_CAPACITY = 1024


def _k_bucket(k: int) -> int:
    """Round k up to a power of two to bound the number of compiled variants."""
    b = 1
    while b < k:
        b *= 2
    return b


class DescriptorBank:
    """Growable bank of global descriptors with cosine top-k search."""

    def __init__(self, dim: Optional[int] = None,
                 capacity: int = _DEFAULT_CAPACITY,
                 dtype: str = "float32"):
        self.n = 0
        self.dim = dim
        self.items: Dict[int, Any] = {}
        self._capacity = capacity
        self._host: Optional[np.ndarray] = None
        if dim is not None:
            self._host = np.zeros((capacity, dim), dtype=np.float32)
        # device mirror; host storage stays f32 (source of truth), the
        # mirror optionally stores bfloat16 unit rows — halves HBM traffic
        # per search pass on TPU at ~4e-3 relative similarity error
        self._dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self._bank: Optional[jax.Array] = None
        self._inv_norms: Optional[jax.Array] = None
        self._device_n = 0

    @property
    def capacity(self) -> int:
        return self._capacity

    # -- reference-compatible alias: NearestNeighborsMatching exposed `.data`
    @property
    def data(self) -> np.ndarray:
        if self._host is None:
            return np.zeros((0, 0), dtype=np.float32)
        return self._host

    def add_item(self, vector: np.ndarray, item: Any) -> None:
        """Append one descriptor with its identification info."""
        vector = np.asarray(vector, dtype=np.float32)
        assert vector.ndim == 1
        if self.dim is None:
            self.dim = int(vector.shape[0])
            self._host = np.zeros((self._capacity, self.dim), dtype=np.float32)
        if self.n >= self._capacity:
            self._grow()
        self._host[self.n] = vector
        self.items[self.n] = item
        self.n += 1

    def add_items(self, vectors: np.ndarray, items: List[Any]) -> None:
        """Bulk append (used by gossip intake and benchmarks)."""
        vectors = np.asarray(vectors, dtype=np.float32)
        if self.dim is None:
            self.dim = int(vectors.shape[1])
            self._host = np.zeros((self._capacity, self.dim), dtype=np.float32)
        while self.n + len(vectors) > self._capacity:
            self._grow()
        self._host[self.n:self.n + len(vectors)] = vectors
        for i, it in enumerate(items):
            self.items[self.n + i] = it
        self.n += len(vectors)

    def _grow(self) -> None:
        self._capacity *= 2
        new = np.zeros((self._capacity, self.dim), dtype=np.float32)
        new[:self.n] = self._host[:self.n]
        self._host = new
        self._bank = None  # force device re-upload at next search
        self._device_n = 0

    def _sync_device(self) -> None:
        # the device mirror stores UNIT rows (inv_norms stays all-ones):
        # the streaming kernel then needs no per-dispatch normalization
        # pass, and the XLA paths' inv multiply is a no-op
        if self._bank is None:
            self._bank = jnp.zeros((self._capacity, self.dim), self._dtype)
            self._inv_norms = jnp.ones((self._capacity,), jnp.float32)
            self._device_n = 0
        if self._device_n < self.n:
            chunk = self._host[self._device_n:self.n]
            self._bank = topk_ops.update_rows_unit(
                self._bank, jnp.asarray(chunk), jnp.int32(self._device_n))
            self._device_n = self.n

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    def search(self, query: np.ndarray, k: int) -> Tuple[List[Any], np.ndarray]:
        """Best-k matches of one query, sorted by descending cosine similarity.

        Interface parity with reference ``nns_matching.py:42-61``.
        """
        if self.n == 0 or self._host is None:
            return [], np.zeros((0,))
        sims, idx = self.search_batch(np.asarray(query)[None, :], k)
        kk = min(k, self.n)
        return [self.items[int(i)] for i in idx[0][:kk]], np.asarray(sims[0][:kk])

    def search_best(self, query: np.ndarray) -> Tuple[Any, Optional[float]]:
        """Single nearest neighbor (reference ``nns_matching.py:63-76``)."""
        if self.n == 0:
            return None, None
        items, sims = self.search(query, 1)
        return items[0], float(sims[0])

    def search_batch(self, queries: np.ndarray,
                     k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Batched top-k over the bank: ``[B, dim] -> ([B, k'], [B, k'])``.

        ``k' = min(k_bucket, capacity)``; rows beyond ``self.n`` valid entries
        have similarity ``-inf``. This is the throughput path (the reference
        has no batched equivalent). Large banks on TPU use the fused Pallas
        bank-scan kernel (``ops.nns_pallas``); smaller tiers and CPU use the
        XLA matmul + top_k path.
        """
        sims, idx = self.search_batch_begin(queries, k)
        return np.asarray(sims)[:, :k], np.asarray(idx)[:, :k]

    def search_batch_begin(self, queries: np.ndarray, k: int):
        """Dispatch :meth:`search_batch` without blocking on the result:
        returns ``(sims, idx)`` DEVICE arrays with AT LEAST ``k`` columns
        (the XLA tier computes a ``k``-bucket worth — slice on the host
        after reading). Harvest with ``np.asarray`` (or
        ``utils.device_read.fetch`` to overlap several pending reads)."""
        self._sync_device()
        queries = jnp.asarray(queries, dtype=jnp.float32)
        if self._use_fused_kernel(k):
            from cslam_tpu.ops import nns_pallas
            return nns_pallas.cosine_topk_fused2_pre(
                self._bank, jnp.int32(self.n), queries, k)
        kb = min(_k_bucket(k), self._capacity)
        return topk_ops.cosine_topk(
            self._bank, self._inv_norms, jnp.int32(self.n), queries, kb)

    def _use_fused_kernel(self, k: int) -> bool:
        from cslam_tpu.ops import nns_pallas
        if (k > nns_pallas.MAX_K
                or self._capacity % nns_pallas.TILE_N != 0):
            return False
        return jax.devices()[0].platform not in ("cpu",)
