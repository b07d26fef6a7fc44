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
from cslam_tpu.utils import device_read, profiling
from cslam_tpu.ops.nns_pallas import (KERNEL_K, TILE_N,
                                      cosine_topk_fused2_pre)


import functools

# Augmented ring-key rows for the streaming-kernel shortlist: padded to a
# VPU-friendly width, with ||rk||^2 folded into the last live column so a
# plain dot product reproduces euclidean ordering (see _RK_AUG_DIM notes
# at _augment_ring_keys).
_RK_AUG_DIM = 32


def _stage2_best(sc_bank: jax.Array, n: jax.Array, idx: jax.Array,
                 queries_sc: jax.Array, num_candidates: int
                 ) -> tuple[jax.Array, jax.Array]:
    """Rescore per-query shortlists with the full rotation-shift distance."""
    def one(idx_row, query_sc):
        cand = jnp.take(sc_bank, idx_row, axis=0)
        dists, _ = sc_ops.scancontext_distances_batch(cand, query_sc)
        dists = jnp.where(jnp.arange(num_candidates) < n, dists, jnp.inf)
        best = jnp.argmin(dists)
        return idx_row[best], dists[best]

    return jax.vmap(one)(idx, queries_sc)


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def _two_stage_best(rk_bank: jax.Array, rk_sq_norms: jax.Array,
                    sc_bank: jax.Array, n: jax.Array, queries_sc: jax.Array,
                    num_candidates: int) -> tuple[jax.Array, jax.Array]:
    """Fused two-stage search for a BATCH of queries in one dispatch.

    Per query: ring-key euclidean shortlist -> device gather -> full
    rotation-shift distance -> best. The unfused path (host-read shortlist
    indices, then a second dispatch) costs 3 relay round-trips per query;
    this is one for the whole batch. Returns ([B] best bank row, [B] best
    distance; padding shortlist slots carry distance inf).
    """
    rk_q = jax.vmap(sc_ops.ring_key)(queries_sc)
    _, idx = topk_ops.euclidean_topk(rk_bank, rk_sq_norms, n, rk_q,
                                     num_candidates)
    return _stage2_best(sc_bank, n, idx, queries_sc, num_candidates)


def _augment_ring_keys(rk: jnp.ndarray) -> jnp.ndarray:
    """``[n, R]`` ring keys -> ``[n, _RK_AUG_DIM]`` rows whose dot product
    with an augmented query reproduces euclidean-distance ordering.

    ``argmin ||q - b||^2 = argmax (2 q.b - ||b||^2)``, and with
    ``b' = [b, ||b||^2, 0...]`` / ``q' = [2q, -1, 0...]`` that objective is
    the plain dot product ``q'.b'`` — which is what the streaming NNS
    kernel computes. Lets the large-tier shortlist ride
    ``cosine_topk_fused2_pre`` instead of a full-width ``lax.top_k`` over
    the bank (the stage-1 cost that dominates the 65k scan-context tier).
    """
    rk = jnp.asarray(rk, jnp.float32)
    n, r = rk.shape
    assert r + 1 <= _RK_AUG_DIM
    out = jnp.zeros((n, _RK_AUG_DIM), jnp.float32)
    out = out.at[:, :r].set(rk)
    return out.at[:, r].set(jnp.sum(rk * rk, axis=-1))


@functools.partial(jax.jit, static_argnames=("num_candidates", "interpret"))
def _two_stage_best_fused(rk_aug: jax.Array, sc_bank: jax.Array,
                          n: jax.Array, queries_sc: jax.Array,
                          num_candidates: int, interpret: bool = False
                          ) -> tuple[jax.Array, jax.Array]:
    """Two-stage search with the streaming Pallas kernel as stage 1.

    Same contract as :func:`_two_stage_best`; requires the augmented
    ring-key bank (``_augment_ring_keys``), ``rows % TILE_N == 0`` and
    ``num_candidates <= KERNEL_K``. The kernel's query-norm scaling of the
    returned values is a positive per-query factor, so the shortlist
    ordering is unchanged; only indices are consumed here.
    """
    rk_q = jax.vmap(sc_ops.ring_key)(queries_sc)
    b, r = rk_q.shape
    q_aug = jnp.zeros((b, _RK_AUG_DIM), jnp.float32)
    q_aug = q_aug.at[:, :r].set(2.0 * rk_q)
    q_aug = q_aug.at[:, r].set(-1.0)
    _, idx = cosine_topk_fused2_pre(rk_aug, n, q_aug, num_candidates,
                                    interpret=interpret)
    return _stage2_best(sc_bank, n, idx, queries_sc, num_candidates)


# Bank appends ride the search dispatch: pending host rows are padded to
# this fixed block size so one program per batch tier serves every pending
# count (each separate dynamic_update_slice dispatch + device_put upload
# costs a relay round-trip; fusing them into the search call collapses the
# per-keyframe bank-maintenance traffic to zero extra round-trips).
_PENDING_PAD = 32

# Bulk device-sync block size (see ScanContextBank._sync_device): deltas
# are written in fixed-shape chunks so each capacity tier compiles exactly
# two tiny update programs, never a varying-span one.
_SYNC_CHUNK = 1024

_augment_full = jax.jit(_augment_ring_keys)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _sync_chunk_unfused(sc_bank, rk_bank, rk_sq, new_sc, new_rk, start):
    """Write one fixed-shape mirror block at ``start`` (unfused layout)."""
    sc_bank = jax.lax.dynamic_update_slice(sc_bank, new_sc, (start, 0, 0))
    rk_bank = jax.lax.dynamic_update_slice(rk_bank, new_rk, (start, 0))
    rk_sq = jax.lax.dynamic_update_slice(
        rk_sq, jnp.sum(new_rk * new_rk, axis=-1), (start,))
    return sc_bank, rk_bank, rk_sq


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _sync_chunk_fused(sc_bank, rk_aug, new_sc, new_rk, start):
    """Write one fixed-shape mirror block at ``start`` (fused layout)."""
    sc_bank = jax.lax.dynamic_update_slice(sc_bank, new_sc, (start, 0, 0))
    rk_aug = jax.lax.dynamic_update_slice(
        rk_aug, _augment_ring_keys(new_rk), (start, 0))
    return sc_bank, rk_aug


@functools.partial(jax.jit, static_argnames=("num_candidates",),
                   donate_argnums=(0, 1, 2))
def _append_two_stage_best(rk_bank, rk_sq_norms, sc_bank, n_dev,
                           new_rk, new_sc, m, queries_sc,
                           num_candidates: int):
    """Append a padded pending block at row ``n_dev`` and search, in ONE
    dispatch. Block rows beyond ``m`` write zeros past the live region;
    they are masked out by ``n = n_dev + m`` and overwritten by the next
    append (which starts exactly at ``n``). The caller guarantees
    ``n_dev + _PENDING_PAD <= capacity`` (dynamic_update_slice would
    otherwise clamp the start and corrupt live rows)."""
    rk_bank = jax.lax.dynamic_update_slice(rk_bank, new_rk, (n_dev, 0))
    rk_sq_norms = jax.lax.dynamic_update_slice(
        rk_sq_norms, jnp.sum(new_rk * new_rk, axis=-1), (n_dev,))
    sc_bank = jax.lax.dynamic_update_slice(sc_bank, new_sc, (n_dev, 0, 0))
    idx, dists = _two_stage_best(rk_bank, rk_sq_norms, sc_bank, n_dev + m,
                                 queries_sc, num_candidates)
    return rk_bank, rk_sq_norms, sc_bank, idx, dists


@functools.partial(jax.jit, static_argnames=("num_candidates",),
                   donate_argnums=(0, 1))
def _append_two_stage_best_fused(rk_aug, sc_bank, n_dev, new_rk, new_sc, m,
                                 queries_sc, num_candidates: int):
    """Fused-stage-1 (streaming-kernel) variant of
    :func:`_append_two_stage_best`."""
    rk_aug = jax.lax.dynamic_update_slice(
        rk_aug, _augment_ring_keys(new_rk), (n_dev, 0))
    sc_bank = jax.lax.dynamic_update_slice(sc_bank, new_sc, (n_dev, 0, 0))
    idx, dists = _two_stage_best_fused(rk_aug, sc_bank, n_dev + m,
                                       queries_sc, num_candidates)
    return rk_aug, sc_bank, idx, dists


@functools.partial(jax.jit, static_argnames=("num_candidates",),
                   donate_argnums=(0, 1, 2))
def _append_multi_bank_best(rk_banks, rk_sqs, sc_banks, starts,
                            new_rks, new_scs, ns_live, query_sc,
                            num_candidates: int):
    """One query against SEVERAL banks, each bank's pending block appended
    in the same dispatch (see :func:`_append_two_stage_best` for the
    padded-block semantics). ``starts`` are the per-bank write offsets and
    ``ns_live`` the post-append live row counts; a bank with nothing
    pending passes an identity block (its first ``_PENDING_PAD`` mirror
    rows at start 0 — a bitwise no-op rewrite), keeping one compiled
    program for every pending combination."""
    out_banks, idxs, ds = [], [], []
    for rk, rksq, sc, start, nrk, nsc, n_live in zip(
            rk_banks, rk_sqs, sc_banks, starts, new_rks, new_scs, ns_live):
        rk = jax.lax.dynamic_update_slice(rk, nrk, (start, 0))
        rksq = jax.lax.dynamic_update_slice(
            rksq, jnp.sum(nrk * nrk, axis=-1), (start,))
        sc = jax.lax.dynamic_update_slice(sc, nsc, (start, 0, 0))
        idx, d = _two_stage_best(rk, rksq, sc, n_live, query_sc[None],
                                 num_candidates)
        out_banks.append((rk, rksq, sc))
        idxs.append(idx[0])
        ds.append(d[0])
    # (idx, dists) packed into ONE [2R] f32 array: the host harvest is a
    # single relay read instead of two (~30 ms RTT each when the result
    # is not yet local; bank rows < 2^24 so the f32 round-trip is exact)
    return tuple(out_banks), jnp.concatenate(
        [jnp.stack(idxs).astype(jnp.float32), jnp.stack(ds)])


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def _multi_bank_best(rk_banks, rk_sqs, sc_banks, ns, query_sc,
                     num_candidates: int) -> tuple[jax.Array, jax.Array]:
    """One query against SEVERAL banks in ONE dispatch.

    ``rk_banks/rk_sqs/sc_banks/ns`` are tuples of per-bank arrays (possibly
    different capacities — compile is keyed on the shape tuple). Replaces
    the per-other-robot ``search_best`` round-trips in the per-keyframe hot
    path (reference ``lcsm.py:36-54`` searches every other robot's bank per
    new descriptor): R-1 dispatch+read cycles become one.
    Returns ([R] best row, [R] best distance).
    """
    outs = [_two_stage_best(rk, rksq, sc, n, query_sc[None], num_candidates)
            for rk, rksq, sc, n in zip(rk_banks, rk_sqs, sc_banks, ns)]
    return (jnp.stack([o[0][0] for o in outs]),
            jnp.stack([o[1][0] for o in outs]))


class ScanContextBank:
    """Growable bank of Scan Context descriptors."""

    def __init__(self, shape: Tuple[int, int] = (20, 60),
                 num_candidates: int = 10, threshold: float = 0.15,
                 capacity: int = 1024, fused_stage1: bool = False):
        self.shape = tuple(shape)
        self.num_candidates = num_candidates
        self.fused_stage1 = fused_stage1
        self.threshold = threshold
        self.items: Dict[int, Any] = {}
        self.nb_items = 0
        self._capacity = capacity
        self._sc_host = np.zeros((capacity,) + self.shape, np.float32)
        self._rk_host = np.zeros((capacity, self.shape[0]), np.float32)
        self._rk_bank: Optional[jax.Array] = None
        self._rk_sq_norms: Optional[jax.Array] = None
        self._rk_aug: Optional[jax.Array] = None
        self._sc_bank: Optional[jax.Array] = None
        self._device_n = 0

    def _fused_stage1_ok(self) -> bool:
        """Streaming-kernel shortlist eligibility: opt-in
        (``frontend.scancontext_fused_stage1`` — off by default until the
        configuration has been A/B'd on real hardware), TPU platform, bank
        capacity on a kernel tile boundary, shortlist within the kernel's
        k budget (constants imported from ``ops.nns_pallas`` so retuning
        the kernel keeps this gate honest)."""
        return (self.fused_stage1
                and jax.devices()[0].platform == "tpu"
                and self._capacity % TILE_N == 0
                and self.num_candidates <= KERNEL_K)

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
        # ring key on the HOST (same math as sc_ops.ring_key — per-ring
        # mean over sectors): routing it through the device op cost one
        # relay dispatch+read PER gossiped descriptor (measured as the
        # bulk of the lidar e2e's 161 ms/flush lcd.gossip_search span)
        self._rk_host[self.nb_items] = sc.mean(axis=-1)
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
        """Bulk catch-up of the device bank from the host mirror.

        Compile-stable by construction: the cold path (fresh/regrown bank)
        is pure ``device_put`` of the full mirror — no XLA program at all
        (sq-norms are computed with numpy; the fused augment is one jitted
        program per capacity tier). The delta path writes fixed-shape
        ``_SYNC_CHUNK``-row blocks sourced from the mirror (the mirror is
        the truth, so a clamped/overlapping block write is always correct).
        The old varying-span ``dynamic_update_slice`` sprayed one-off tiny
        programs through the remote compile service mid-run.
        """
        if self._device_n >= self.nb_items and self._sc_bank is not None \
                and self._sc_bank.shape[0] == self._capacity:
            return
        fused = self._fused_stage1_ok()
        cold = (self._sc_bank is None
                or self._sc_bank.shape[0] != self._capacity
                or self._device_n == 0
                or (fused and self._rk_aug is None)
                or (not fused and self._rk_bank is None))
        if cold:
            self._sc_bank = jnp.asarray(self._sc_host)
            if fused:
                self._rk_bank = None
                self._rk_sq_norms = None
                self._rk_aug = _augment_full(jnp.asarray(self._rk_host))
            else:
                self._rk_aug = None
                self._rk_bank = jnp.asarray(self._rk_host)
                self._rk_sq_norms = jnp.asarray(
                    np.sum(self._rk_host * self._rk_host, axis=-1,
                           dtype=np.float32))
            self._device_n = self.nb_items
            return
        chunk = min(_SYNC_CHUNK, self._capacity)
        lo = self._device_n
        while lo < self.nb_items:
            start = min(lo, self._capacity - chunk)
            # .copy(): the staged transfer may be deferred/zero-copy, and
            # a later add_item writes into this mirror window
            new_sc = self._sc_host[start:start + chunk].copy()
            new_rk = self._rk_host[start:start + chunk].copy()
            if fused:
                self._sc_bank, self._rk_aug = _sync_chunk_fused(
                    self._sc_bank, self._rk_aug, new_sc, new_rk,
                    np.int32(start))
            else:
                (self._sc_bank, self._rk_bank,
                 self._rk_sq_norms) = _sync_chunk_unfused(
                    self._sc_bank, self._rk_bank, self._rk_sq_norms,
                    new_sc, new_rk, np.int32(start))
            lo = start + chunk
        self._device_n = self.nb_items

    # ------------------------------------------------------------------

    def search(self, query: np.ndarray, k: int) -> Tuple[List[Any], List[Any]]:
        """Best match by two-stage search. Returns single-element lists,
        matching the reference interface quirk (``scancontext_matching.py:46-87``
        ignores k and returns one match)."""
        if self.nb_items < 1:
            return [None], [None]
        results = self.search_best_batch(
            np.asarray(query, np.float32).reshape((1,) + self.shape))
        item, sim = results[0]
        return [item], [sim]

    def search_best(self, query: np.ndarray) -> Tuple[Any, Optional[float]]:
        if self.nb_items < 1:
            return None, None
        items, sims = self.search(query, 1)
        return items[0], sims[0]

    def search_best_batch(self, queries: np.ndarray
                          ) -> List[Tuple[Any, float]]:
        """Best (item, similarity) per query, all in ONE device dispatch.

        Distances >= 1.0 keep the reference fallback: first item with
        similarity 0 (``scancontext_matching.py:80-83``).
        """
        return self.search_best_batch_finish(
            self.search_best_batch_begin(queries))

    def search_best_batch_begin(self, queries: np.ndarray):
        """Dispatch the batch search without blocking on the result.

        Returns a handle for :meth:`search_best_batch_finish`; the bank
        mutation (pending-block append / bulk sync) happens NOW, so later
        dispatches see a current bank regardless of when the handle is
        harvested. The handle's ``arrays`` attribute exposes the device
        results for cross-handle ``device_read.prefetch`` batching.
        """
        pend = self.nb_items - self._device_n
        fused_mode = self._fused_stage1_ok()
        bank_ready = (
            self._sc_bank is not None
            and self._sc_bank.shape[0] == self._capacity
            and ((self._rk_aug is not None) if fused_mode
                 else (self._rk_bank is not None)))
        # small pending blocks ride the search dispatch (no extra relay
        # round-trips); bulk syncs (cold bank, post-grow, near-capacity)
        # go through _sync_device
        use_append = (bank_ready and 0 < pend <= _PENDING_PAD
                      and self._device_n + _PENDING_PAD <= self._capacity)
        if not use_append:
            self._sync_device()
        q = np.asarray(queries, np.float32).reshape((-1,) + self.shape)
        b = len(q)
        # pad the query batch to a power-of-two tier: gossip chunk lengths
        # vary per message and each distinct batch size would otherwise be
        # a fresh XLA compile (minutes each on the remote compile service);
        # all-zero padding queries have no engaged columns -> distance 1
        tier = 1
        while tier < b:
            tier *= 2
        if tier != b:
            q = np.concatenate(
                [q, np.zeros((tier - b,) + self.shape, np.float32)])
        # numpy operand: jit stages it asynchronously; an explicit
        # jnp.asarray is a device_put that blocks behind the device queue
        # (benchmarks/relay_dispatch_probe.py)
        queries_sc = q
        if use_append:
            lo = self._device_n
            new_sc = np.zeros((_PENDING_PAD,) + self.shape, np.float32)
            new_sc[:pend] = self._sc_host[lo:lo + pend]
            new_rk = np.zeros((_PENDING_PAD, self.shape[0]), np.float32)
            new_rk[:pend] = self._rk_host[lo:lo + pend]
            if fused_mode:
                (self._rk_aug, self._sc_bank, idx,
                 dists) = _append_two_stage_best_fused(
                    self._rk_aug, self._sc_bank, lo, new_rk,
                    new_sc, pend, queries_sc,
                    self.num_candidates)
            else:
                (self._rk_bank, self._rk_sq_norms, self._sc_bank, idx,
                 dists) = _append_two_stage_best(
                    self._rk_bank, self._rk_sq_norms, self._sc_bank, lo,
                    new_rk, new_sc, pend,
                    queries_sc, self.num_candidates)
            self._device_n = self.nb_items
        elif self._rk_aug is not None:
            idx, dists = _two_stage_best_fused(
                self._rk_aug, self._sc_bank, np.int32(self.nb_items),
                queries_sc, self.num_candidates)
        else:
            idx, dists = _two_stage_best(
                self._rk_bank, self._rk_sq_norms, self._sc_bank,
                np.int32(self.nb_items), queries_sc, self.num_candidates)
        # start the device->host copies NOW: they queue behind the search
        # program and travel while the host does other work, so the
        # harvest-side read finds them local (~0.3 ms) instead of paying a
        # relay round-trip (~30-60 ms; benchmarks/relay_dispatch_probe.py)
        device_read.prefetch((idx, dists))
        return _BatchSearchHandle(self, idx, dists, b)

    def search_best_batch_finish(self, handle: "_BatchSearchHandle"
                                 ) -> List[Tuple[Any, float]]:
        """Materialize a dispatched batch search (see
        :meth:`search_best_batch_begin`). Row indices stay valid across
        interleaved ``add_item`` calls — bank rows are append-only."""
        b = handle.b
        with profiling.span("nns.batch_read"):
            idx = np.asarray(handle.idx)[:b]
            dists = np.asarray(handle.dists)[:b]
        return [(self.items[int(i)], float(1.0 - d)) if d < 1.0
                else (self.items[0], 0.0)
                for i, d in zip(idx, dists)]


class _BatchSearchHandle:
    """Pending device result of ``ScanContextBank.search_best_batch_begin``."""

    __slots__ = ("bank", "idx", "dists", "b")

    def __init__(self, bank, idx, dists, b):
        self.bank, self.idx, self.dists, self.b = bank, idx, dists, b

    @property
    def arrays(self):
        return (self.idx, self.dists)


def warmup_search_tiers(capacity: int, shape: Tuple[int, int] = (20, 60),
                        num_candidates: int = 10,
                        batch_tiers=(1, 2, 4, 8, 16, 32),
                        multi_bank_counts=()) -> None:
    """Precompile the two-stage search for the given query-batch tiers (and
    optionally the multi-bank variant for the given bank counts) at one
    bank capacity, so no live search pays JIT latency (remote-compile
    latency on the relay-attached chip is minutes per program)."""
    rk = jnp.zeros((capacity, shape[0]), jnp.float32)
    rksq = jnp.zeros((capacity,), jnp.float32)
    sc = jnp.zeros((capacity,) + tuple(shape), jnp.float32)
    n = jnp.int32(1)
    pend_rk = jnp.zeros((_PENDING_PAD, shape[0]), jnp.float32)
    pend_sc = jnp.zeros((_PENDING_PAD,) + tuple(shape), jnp.float32)
    # every program runs TWICE with distinct query values: the relay-attached
    # chip sometimes recompiles on the call after a single warmup
    for b in batch_tiers:
        for fill in (0.0, 0.25):
            q = jnp.full((b,) + tuple(shape), fill, jnp.float32)
            _two_stage_best(rk, rksq, sc, n, q,
                            num_candidates)[0].block_until_ready()
            # append-fused variant (donates its bank operands — pass copies)
            _append_two_stage_best(
                rk + 0, rksq + 0, sc + 0, 0, pend_rk, pend_sc, 1, q,
                num_candidates)[-1].block_until_ready()
    # bulk-sync delta chunk program for this capacity tier (the cold bulk
    # path is pure device_put and needs no warming)
    chunk = min(_SYNC_CHUNK, capacity)
    for fill in (0.0, 0.25):
        new_sc = jnp.full((chunk,) + tuple(shape), fill, jnp.float32)
        new_rk = jnp.full((chunk, shape[0]), fill, jnp.float32)
        _sync_chunk_unfused(sc + 0, rk + 0, rksq + 0, new_sc, new_rk,
                            jnp.int32(0))[0].block_until_ready()
    for r in multi_bank_counts:
        if r < 1:
            continue
        for fill in (0.0, 0.25):
            q1 = jnp.full(tuple(shape), fill, jnp.float32)
            _multi_bank_best((rk,) * r, (rksq,) * r, (sc,) * r, (n,) * r,
                             q1, num_candidates)[0].block_until_ready()
            _append_multi_bank_best(
                tuple(rk + 0 for _ in range(r)),
                tuple(rksq + 0 for _ in range(r)),
                tuple(sc + 0 for _ in range(r)),
                (0,) * r, (pend_rk,) * r, (pend_sc,) * r, (1,) * r,
                q1, num_candidates)[-1].block_until_ready()


def multi_search_best(banks: List["ScanContextBank"], query: np.ndarray
                      ) -> List[Tuple[Any, Optional[float]]]:
    """Best (item, similarity) of one query in EACH bank, one dispatch.

    Result-identical to ``[b.search_best(query) for b in banks]`` (each
    bank is searched independently); empty banks return (None, None) and
    are excluded from the device program. Banks in fused-stage-1 mode keep
    their own dispatch (their ring-key layout differs).
    """
    return multi_search_best_finish(multi_search_best_begin(banks, query))


def multi_search_best_begin(banks: List["ScanContextBank"],
                            query: np.ndarray) -> "_MultiSearchHandle":
    """Dispatch :func:`multi_search_best` without blocking on the result.

    Bank state (pending appends / bulk syncs) is updated NOW; the returned
    handle resolves via :func:`multi_search_best_finish`.
    """
    out: List[Tuple[Any, Optional[float]]] = [(None, None)] * len(banks)
    grouped: List[Tuple[int, ScanContextBank]] = []
    for i, b in enumerate(banks):
        if b.nb_items < 1:
            continue
        if b._fused_stage1_ok():  # fused-stage-1 layout: own dispatch
            out[i] = b.search_best(query)
            continue
        pend = b.nb_items - b._device_n
        appendable = (b._sc_bank is not None
                      and b._sc_bank.shape[0] == b._capacity
                      and b._rk_bank is not None
                      and pend <= _PENDING_PAD
                      and b._device_n + _PENDING_PAD <= b._capacity)
        if not appendable:
            b._sync_device()  # bulk path (cold bank / post-grow)
        grouped.append((i, b))
    if grouped:
        shape = grouped[0][1].shape
        q = np.asarray(query, np.float32).reshape(shape)
        # per-bank pending blocks ride the same dispatch; a bank with
        # nothing pending passes m=0 and an identity block (its first
        # _PENDING_PAD mirror rows at start 0 — a bitwise no-op rewrite,
        # keeping one compiled program for every pending combination)
        new_rks, new_scs, starts, ns_live = [], [], [], []
        for _, b in grouped:
            pend = b.nb_items - b._device_n
            new_sc = np.zeros((_PENDING_PAD,) + b.shape, np.float32)
            new_rk = np.zeros((_PENDING_PAD, b.shape[0]), np.float32)
            if pend > 0:
                lo = b._device_n
                new_sc[:pend] = b._sc_host[lo:lo + pend]
                new_rk[:pend] = b._rk_host[lo:lo + pend]
                starts.append(lo)
            else:
                new_sc[:] = b._sc_host[:_PENDING_PAD]
                new_rk[:] = b._rk_host[:_PENDING_PAD]
                starts.append(0)
            new_rks.append(new_rk)
            new_scs.append(new_sc)
            ns_live.append(b.nb_items)
        new_banks, packed = _append_multi_bank_best(
            tuple(b._rk_bank for _, b in grouped),
            tuple(b._rk_sq_norms for _, b in grouped),
            tuple(b._sc_bank for _, b in grouped),
            tuple(starts),
            tuple(new_rks), tuple(new_scs),
            tuple(ns_live), q, grouped[0][1].num_candidates)
        for (i, b), (rk, rksq, sc) in zip(grouped, new_banks):
            b._rk_bank, b._rk_sq_norms, b._sc_bank = rk, rksq, sc
            b._device_n = b.nb_items
        device_read.prefetch((packed,))  # harvest reads find it local
        return _MultiSearchHandle(out, grouped, packed)
    return _MultiSearchHandle(out, [], None)


def multi_search_best_finish(handle: "_MultiSearchHandle"
                             ) -> List[Tuple[Any, Optional[float]]]:
    """Materialize a dispatched :func:`multi_search_best_begin`."""
    out = handle.out
    if handle.grouped:
        with profiling.span("nns.multi_read"):
            packed = np.asarray(handle.packed)
        r = len(handle.grouped)
        idx, dists = packed[:r].astype(np.int64), packed[r:]
        for (i, b), j, d in zip(handle.grouped, idx, dists):
            out[i] = ((b.items[int(j)], float(1.0 - d)) if d < 1.0
                      else (b.items[0], 0.0))
    return out


class _MultiSearchHandle:
    """Pending device result of :func:`multi_search_best_begin`."""

    __slots__ = ("out", "grouped", "packed")

    def __init__(self, out, grouped, packed):
        self.out, self.grouped = out, grouped
        self.packed = packed

    @property
    def arrays(self):
        return () if self.packed is None else (self.packed,)
