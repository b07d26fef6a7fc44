"""Mesh-sharded multi-robot descriptor banks.

The sparse matcher keeps one descriptor bank per robot
(``cslam_tpu.matching.sparse_matching``, mirroring reference
``loop_closure_sparse_matching.py:21-31``). At swarm scale those banks are
*sharded over the TPU mesh* — robot r's bank lives on device r — and a
query is matched against every robot's bank in a single dispatch: each
device runs the local fused cosine top-k, then one ICI ``all_gather`` of the
tiny ``[B, k]`` results fans the answers back out. Bank payloads (100k x 64
floats each) never cross the interconnect; only queries and top-k rows do.

This is the scaling axis SURVEY.md §5 calls out for bank length N: capacity
beyond one chip's HBM comes from adding devices, not from spilling.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cslam_tpu.ops import topk as topk_ops

AXIS = "robots"


def make_mesh_search(mesh: Mesh, k: int, capacity: Optional[int] = None):
    """Build the jitted sharded search: every device searches its local bank,
    results are gathered. Returns f(banks_unit, counts, queries) ->
    (sims [R, B, k], idx [R, B, k]).

    Bank rows MUST be unit vectors (``topk.update_rows_unit`` storage —
    what :class:`MeshDescriptorBanks` keeps on device). Both the fused
    Pallas path and the XLA fallback assume it, so CPU and TPU agree."""
    from cslam_tpu.ops.nns_pallas import MAX_K, TILE_N
    fused_ok = (all(d.platform == "tpu" for d in mesh.devices.flat)
                and k <= MAX_K
                and capacity is not None and capacity % TILE_N == 0)
    if fused_ok:
        # same streaming Pallas bank-scan kernel as the single-bank hot
        # path (prenormalized entry point). The kernel needs
        # TILE_N-row-aligned capacity and k <= MAX_K, otherwise fall back
        # to the XLA path.
        from cslam_tpu.ops.nns_pallas import cosine_topk_fused2_pre

        def _search(bank, count, queries, k):
            return cosine_topk_fused2_pre(bank, count, queries, k)
    else:
        def _search(bank, count, queries, k):
            ones = jnp.ones(bank.shape[:1], bank.dtype)
            return topk_ops.cosine_topk(bank, ones, count, queries, k)

    def local_search(banks, counts, queries):
        # per-device block: banks [1, cap, D], counts [1]
        sims, idx = _search(banks[0], counts[0], queries, k)
        sims_all = jax.lax.all_gather(sims, AXIS)   # [R, B, k]
        idx_all = jax.lax.all_gather(idx, AXIS)
        return sims_all, idx_all

    sharded = shard_map(
        local_search, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(sharded)


class MeshDescriptorBanks:
    """One padded descriptor bank per robot, sharded over a device mesh."""

    def __init__(self, mesh: Mesh, nb_robots: int, dim: int,
                 capacity: int = 4096, k: int = 8):
        assert mesh.shape[AXIS] >= nb_robots
        self.mesh = mesh
        self.nb_robots = nb_robots
        self.dim = dim
        self.capacity = capacity
        self.k = k
        self._R = mesh.shape[AXIS]
        self._host = np.zeros((self._R, capacity, dim), np.float32)
        self._counts = np.zeros(self._R, np.int32)
        self.items: List[Dict[int, Any]] = [dict() for _ in range(self._R)]
        self._sharding = NamedSharding(mesh, P(AXIS))
        self._banks: Optional[jax.Array] = None
        self._device_counts = np.zeros(self._R, np.int32)
        self._search = make_mesh_search(mesh, k, capacity=capacity)

    def add_item(self, robot_id: int, vector: np.ndarray, item: Any) -> None:
        n = self._counts[robot_id]
        if n >= self.capacity:
            raise ValueError("mesh bank shard full; raise capacity")
        self._host[robot_id, n] = np.asarray(vector, np.float32)
        self.items[robot_id][int(n)] = item
        self._counts[robot_id] += 1

    def add_items(self, robot_id: int, vectors: np.ndarray,
                  items: List[Any]) -> None:
        for v, it in zip(vectors, items):
            self.add_item(robot_id, v, it)

    def _sync(self) -> None:
        if (self._banks is None
                or np.any(self._device_counts != self._counts)):
            # device banks store UNIT rows (see topk.update_rows_unit) —
            # the contract make_mesh_search requires
            norms = np.linalg.norm(self._host, axis=-1, keepdims=True)
            unit = (self._host / np.maximum(norms, 1e-12)).astype(np.float32)
            self._banks = jax.device_put(jnp.asarray(unit), self._sharding)
            self._counts_dev = jax.device_put(jnp.asarray(self._counts),
                                              self._sharding)
            self._device_counts = self._counts.copy()

    def search_all(self, queries: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Search every robot's bank: ``[B, D] -> ([R, B, k], [R, B, k])``.

        Rows of robots with fewer than k items carry -inf similarities.
        """
        self._sync()
        sims, idx = self._search(self._banks, self._counts_dev,
                                 jnp.asarray(queries, jnp.float32))
        return np.asarray(sims), np.asarray(idx)

    def search_best_others(self, robot_id: int, query: np.ndarray
                           ) -> List[Tuple[int, Any, float]]:
        """Best match per *other* robot bank (the sparse-matching pattern)."""
        sims, idx = self.search_all(np.asarray(query)[None])
        out = []
        for rid in range(self.nb_robots):
            if rid == robot_id or self._counts[rid] == 0:
                continue
            out.append((rid, self.items[rid][int(idx[rid, 0, 0])],
                        float(sims[rid, 0, 0])))
        return out
