"""Maximization of Algebraic Connectivity (MAC) via Frank-Wolfe, on device.

A from-scratch TPU-native implementation of the budgeted edge-selection
problem solved by the vendored MAC solver in the reference
(``cslam/mac/mac.py``): maximize ``lambda_2(L(w))`` over relaxed edge
selections ``w in [0,1]^m, |w| <= k`` with Frank-Wolfe, then round.

Math preserved from the reference:
- supergradient grad_k = weight_k * (v_i - v_j)^2 from the Fiedler vector v
  (``mac.py:112-130``, eq. (8) of arXiv:2203.13897),
- direction step = top-k one-hot rounding of the gradient (``mac.py:132-147``),
- dual upper bound u = min(u, f + grad @ (s - w)) with duality-gap early stop
  (``mac.py:209-230``),
- step size alpha = 2/(it+2) (``mac.py:229``),
- final rounding with (w, weight) lexicographic tie-break (``mac.py:168-189``).

The per-iteration Fiedler eigensolve — the reference's hot loop,
``mac.py:52-59`` — runs jitted on the TPU with two tiers (see
``cslam_tpu.ops.fiedler``):
- dense deflated ``eigh`` for small graphs,
- exact Woodbury shift-invert (tridiagonal odometry chains + low-rank loop
  closures) + LOBPCG for large graphs, where dense factorizations stop
  scaling and plain iterative methods stall on the chain spectrum.

Shapes are padded to power-of-two tiers (nodes and edges) so each tier
compiles once; validity masks cover the padding.
"""
from __future__ import annotations

import functools
import logging
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops import fiedler as fd
from cslam_tpu.ops import highest_precision
from cslam_tpu.types import Edge

_DENSE_MAX_NODES = 512  # above this, use the chain+low-rank solver

# Tier floors. Every distinct (P, E, mf) shape triple compiles its own FW
# program (30-105 s on the relay-attached chip — a mid-run tier crossing
# stalls the whole detection plane, measured as 65% of the round-3 lidar
# e2e steady wall). The marginal device cost of generous padding is tiny
# next to that: the E axis only feeds a top_k + one-hot (E^2 f32 = 4 MB at
# 1024), the mf axis only grows the Woodbury capacitance Cholesky
# ((mf+E)^3/3 flops — microseconds on the MXU), and pose padding is
# masked via `active`. So pad E and mf high enough that a realistic run
# never crosses a tier, and keep the P axis (the real cost axis: dense
# eigh is P^3 per FW iteration, the tridiagonal solves are O(P)).
_E_FLOOR = 1024   # candidate-edge tier floor
_MF_FLOOR = 512   # non-chain fixed-edge (verified loop) tier floor

_SEEN_TIERS: set = set()  # (P, E, mf) triples logged once per process
_logger = logging.getLogger(__name__)


def _tier(n: int, minimum: int = 64) -> int:
    t = minimum
    while t < n:
        t *= 2
    return t


def _pad_edges(edges: Sequence[Edge], size: int):
    i = np.zeros(size, np.int32)
    j = np.zeros(size, np.int32)
    w = np.zeros(size, np.float32)
    for idx, e in enumerate(edges):
        i[idx], j[idx], w[idx] = e.i, e.j, e.weight
    return i, j, w


# Woodbury-tier weight-independent precompute as ONE compiled program per
# shape tier: it runs on every MAC construction (i.e. every detection
# round), and its eager scatter/tridiagonal assembly would otherwise
# dispatch a dozen separate tiny programs each time.
_chain_precompute_jit = jax.jit(fd.chain_lowrank_precompute)


@functools.partial(jax.jit, static_argnames=())
def _dense_fw_step(L_fixed, active, ci, cj, cw, w):
    """One FW evaluation on the dense tier: (lambda_2, supergradient)."""
    P = L_fixed.shape[0]
    Lw = L_fixed + fd.laplacian_from_edges(ci, cj, w * cw, P)
    lam2, v = fd.fiedler_pair(Lw, active)
    diff = v[ci] - v[cj]
    return lam2, cw * diff * diff


@functools.partial(jax.jit,
                   static_argnames=("lobpcg_iters", "lobpcg_short_iters"))
def _woodbury_fw_step(pre, active, chain_i, chain_j, chain_w,
                      lr_i, lr_j, lr_w_fixed, ci, cj, cw, w,
                      lobpcg_iters, lobpcg_short_iters=14):
    """One FW evaluation on the chain+low-rank tier.

    The low-rank block is [fixed loop closures | candidates]; only the
    candidate weights change between calls, so the heavy precompute in
    ``pre`` is reused across the whole Frank-Wolfe loop.
    """
    cand_w = w * cw
    lr_w = jnp.concatenate([lr_w_fixed, cand_w])
    lam2_est, v = fd.fiedler_pair_chain_lowrank(
        pre, lr_w, active, lobpcg_iters=lobpcg_iters,
        short_iters=lobpcg_short_iters)
    # Exact objective at v via the Rayleigh quotient over the real edges
    # (avoids the eps-shift cancellation of the inverted spectrum).
    lam2 = (fd.rayleigh_quotient(chain_i, chain_j, chain_w, v)
            + fd.rayleigh_quotient(lr_i, lr_j, lr_w, v))
    diff = v[ci] - v[cj]
    return lam2, cw * diff * diff


def _round_mask(w, cw, cmask, k):
    """In-program one-hot rounding of a relaxed iterate: top-k of w with a
    small original-weight tie-break (the f32 stand-in for the reference's
    (w, weight) lexicographic rounding, ``mac.py:168-189``). Used only to
    SCORE iterates inside the fused loop — the selection handed to callers
    is still the exact float64 host rounding of the returned iterate."""
    E = w.shape[0]
    score = jnp.where(cmask > 0, w + 1e-6 * cw, -jnp.inf)
    _, idx = jax.lax.top_k(score, E)
    keep = (jnp.arange(E) < k)[:, None]
    return jnp.sum(jax.nn.one_hot(idx, E, dtype=w.dtype) * keep, axis=0)


def _fw_while_loop(eval_fn, w0, cmask, k, max_iters, tol, aux0=None,
                   round_eval_fn=None, cw=None):
    """The whole Frank-Wolfe loop as one traced ``lax.while_loop``.

    Semantics preserved from the reference's host loop (``mac.py:191-233``):
    evaluate (lambda_2, supergradient), one-hot top-k direction, dual
    upper-bound update, duality-gap early stop BEFORE the step, step size
    alpha = 2/(it+2). Returns (relaxed w, dual, iterations used).

    ``k`` is a traced operand, NOT a static: the budget is clamped to the
    (growing) candidate count every detection round, so a static k would
    compile a fresh FW program per distinct count — measured on the lidar
    e2e run as ~3 s of compile/cache-load per selection round, 39% of
    steady wall. The direction step ranks the whole padded edge tier once
    and masks to the first k rows instead.

    ``eval_fn(w, aux) -> (f, grad, aux)`` may thread solver state across
    iterations through ``aux`` (e.g. the warm-started LOBPCG Ritz block);
    tiers without such state pass a scalar dummy through unchanged.

    ``round_eval_fn(mask, aux) -> lambda_2`` enables BEST-ROUNDED-ITERATE
    tracking: measured per-iteration, the objective of the *rounded*
    iterate fluctuates non-monotonically (the relaxed objective improves,
    but rounding a half-converged iterate is noisy — intermediate iterates
    round better than the final one on most instances; sweep in BENCH.md).
    So each iterate's rounding is evaluated in-program and the best one
    seen — including the initialization — is returned. This is a pure
    quality upgrade over the reference's round-the-final-iterate at the
    cost of one extra eigensolve per iteration (cheap post-Tinv).
    """
    E = w0.shape[0]
    if aux0 is None:
        aux0 = jnp.float32(0.0)

    if round_eval_fn is not None:
        f_best0 = round_eval_fn(_round_mask(w0, cw, cmask, k), aux0)
    else:
        f_best0 = jnp.float32(-jnp.inf)

    def cond(st):
        it, done = st[2], st[3]
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    def body(st):
        w, dual, it, _, aux, w_best, f_best = st
        f, grad, aux = eval_fn(w, aux)
        g = jnp.where(cmask > 0, grad, -jnp.inf)
        _, idx = jax.lax.top_k(g, E)
        keep = (jnp.arange(E) < k)[:, None]
        s = jnp.sum(jax.nn.one_hot(idx, E, dtype=w.dtype) * keep, axis=0)
        new_dual = jnp.minimum(
            dual, f + jnp.sum(jnp.where(cmask > 0, grad * (s - w), 0.0)))
        done_now = (new_dual - f) < tol
        alpha = 2.0 / (it.astype(jnp.float32) + 2.0)
        w_new = jnp.where(done_now, w, w + alpha * (s - w))
        if round_eval_fn is not None:
            f_r = round_eval_fn(_round_mask(w_new, cw, cmask, k), aux)
            better = f_r > f_best
            w_best = jnp.where(better, w_new, w_best)
            f_best = jnp.where(better, f_r, f_best)
        return (w_new, new_dual, it + 1, done_now, aux, w_best, f_best)

    init = (w0, jnp.float32(jnp.inf), jnp.int32(0), jnp.bool_(False), aux0,
            w0, f_best0)
    w, dual, it, _, _, w_best, _ = jax.lax.while_loop(cond, body, init)
    if round_eval_fn is not None:
        return w_best, dual, it
    return w, dual, it


@functools.partial(jax.jit, static_argnames=("max_iters", "best_rounding"))
@highest_precision
def _dense_fw_loop(L_fixed, active, ci, cj, cw, w0, cmask, tol,
                   k, max_iters: int, best_rounding: bool = False):
    P = L_fixed.shape[0]

    def eval_fn(w, aux):
        Lw = L_fixed + fd.laplacian_from_edges(ci, cj, w * cw, P)
        lam2, v = fd.fiedler_pair(Lw, active)
        diff = v[ci] - v[cj]
        return lam2, cw * diff * diff, aux

    round_eval_fn = None
    if best_rounding:
        def round_eval_fn(mask, aux):
            Lr = L_fixed + fd.laplacian_from_edges(ci, cj, mask * cw, P)
            return fd.fiedler_pair(Lr, active)[0]

    return _fw_while_loop(eval_fn, w0, cmask, k, max_iters, tol,
                          round_eval_fn=round_eval_fn, cw=cw)


@functools.partial(jax.jit,
                   static_argnames=("max_iters", "lobpcg_iters",
                                    "lobpcg_short_iters", "warm_ritz",
                                    "lobpcg_warm_iters", "best_rounding"))
@highest_precision
def _woodbury_fw_loop(pre, active, chain_i, chain_j, chain_w,
                      lr_i, lr_j, lr_w_fixed, ci, cj, cw, w0, cmask, tol,
                      k, max_iters: int, lobpcg_iters: int,
                      lobpcg_short_iters: int = 14,
                      warm_ritz: bool = False,
                      lobpcg_warm_iters: int = 6,
                      best_rounding: bool = False):
    def eval_fn(w, aux):
        cand_w = w * cw
        lr_w = jnp.concatenate([lr_w_fixed, cand_w])
        if warm_ritz:
            # Carry the Ritz block across FW iterations: successive
            # Laplacians differ only by the alpha*(s-w) candidate-weight
            # step, so the previous block is a near-converged start and
            # the short stage can shrink to ``lobpcg_warm_iters``; the
            # residual-gated continuation in the eigensolver covers the
            # cold first iteration and any stale-block surprise.
            _, v, aux = fd.fiedler_pair_chain_lowrank(
                pre, lr_w, active, lobpcg_iters=lobpcg_iters,
                short_iters=lobpcg_warm_iters, X0=aux, return_block=True)
        else:
            _, v = fd.fiedler_pair_chain_lowrank(
                pre, lr_w, active, lobpcg_iters=lobpcg_iters,
                short_iters=lobpcg_short_iters)
        lam2 = (fd.rayleigh_quotient(chain_i, chain_j, chain_w, v)
                + fd.rayleigh_quotient(lr_i, lr_j, lr_w, v))
        diff = v[ci] - v[cj]
        return lam2, cw * diff * diff, aux

    round_eval_fn = None
    if best_rounding:
        def round_eval_fn(mask, aux):
            lr_w = jnp.concatenate([lr_w_fixed, mask * cw])
            # the carried Ritz block (when warm) is used as a start but
            # NOT updated from rounded evals: the rounded matrices jump
            # around more than the relaxed alpha-step sequence does
            x0 = aux if warm_ritz else None
            si = lobpcg_warm_iters if warm_ritz else lobpcg_short_iters
            _, v = fd.fiedler_pair_chain_lowrank(
                pre, lr_w, active, lobpcg_iters=lobpcg_iters,
                short_iters=si, X0=x0)
            return (fd.rayleigh_quotient(chain_i, chain_j, chain_w, v)
                    + fd.rayleigh_quotient(lr_i, lr_j, lr_w, v))

    aux0 = None
    if warm_ritz:
        P = active.shape[0]
        key = jax.random.PRNGKey(7)
        aux0 = (jax.random.normal(key, (P, 4), jnp.float32)
                * active[:, None])
    return _fw_while_loop(eval_fn, w0, cmask, k, max_iters, tol, aux0=aux0,
                          round_eval_fn=round_eval_fn, cw=cw)


def mac_kwargs_from_params(params: dict) -> dict:
    """MAC constructor kwargs as production (ACM) resolves them from the
    config tree. Warmups and tier prefetches MUST build their MACs with
    exactly these kwargs — they are static jit args, so a mismatch warms
    the wrong program (the round-3 'recompiles after warmup' class)."""
    return dict(
        lobpcg_short_iters=int(params.get(
            "frontend.mac_lobpcg_short_iters", 14)),
        fw_warm_ritz=bool(params.get("frontend.mac_fw_warm_ritz", True)),
        lobpcg_warm_iters=int(params.get(
            "frontend.mac_lobpcg_warm_iters", 6)),
        best_rounding=bool(params.get(
            "frontend.mac_best_rounding", True)),
        e_floor=int(params.get("frontend.mac_e_floor", _E_FLOOR)),
        mf_floor=int(params.get("frontend.mac_mf_floor", _MF_FLOOR)),
        p_floor=int(params.get("frontend.mac_p_floor", 64)))


_PREFETCHED: set = set()
_PREFETCH_LOCK = None  # created lazily (threading import kept off hot path)


def prefetch_selection_tier_async(num_poses: int, num_candidates: int,
                                  num_fixed_loops: int = 0,
                                  max_iters: int = 20,
                                  **mac_kwargs) -> None:
    """Compile the FW program for the given sizes in a daemon thread.

    Tier crossings mid-mission stall the detection plane for the full
    remote-compile latency (measured 105 s for one ``_woodbury_fw_loop``
    on the relay-attached chip). Callers watch their growth counters
    (candidates, verified loops, poses) and invoke this when a counter
    nears its current tier; the compile then happens concurrently with
    normal operation (worker-thread compiles are starved ~3x by main-loop
    dispatches, but 3x-slower-in-background beats a foreground stall) and
    lands in both the in-process and persistent compilation caches.
    Deduplicated per tier key; errors are swallowed (a failed prefetch
    just means the crossing pays the compile like before).
    """
    import threading
    global _PREFETCH_LOCK
    if _PREFETCH_LOCK is None:
        _PREFETCH_LOCK = threading.Lock()
    p = _tier(max(num_poses, 2), minimum=mac_kwargs.get("p_floor", 64))
    e = _tier(max(num_candidates, 1),
              minimum=mac_kwargs.get("e_floor", _E_FLOOR))
    mf = _tier(max(num_fixed_loops, 1),
               minimum=mac_kwargs.get("mf_floor", _MF_FLOOR))
    key = (p, e, mf, max_iters, tuple(sorted(mac_kwargs.items())))
    with _PREFETCH_LOCK:
        if key in _PREFETCHED:
            return
        _PREFETCHED.add(key)

    def _compile():
        try:
            fixed = [Edge(i, i + 1, 1.0) for i in range(p - 1)]
            # enough non-chain fixed edges to land exactly on the mf tier
            nf = (1 if mf <= mac_kwargs.get("mf_floor", _MF_FLOOR)
                  else mf // 2 + 1)
            fixed += [Edge(i % (p - 2), (i + p // 2) % p, 1.0)
                      for i in range(nf)]
            # zero candidate weights: identical program, but the FW loop
            # early-exits after one iteration (see warmup_selection_tiers)
            cands = [Edge(i % (p - 1), (i + p // 3 + 1) % p, 0.0)
                     for i in range(e)]
            m = MAC(fixed, cands, p, **mac_kwargs)
            m.fw_subset(np.zeros(e), 4, max_iters=max_iters)
            m.fw_subset(np.full(e, 0.5), 4, max_iters=max_iters)
        except Exception:  # noqa: BLE001 - prefetch is best-effort
            pass

    threading.Thread(target=_compile, daemon=True,
                     name=f"mac-prefetch-{p}-{e}-{mf}").start()


def warmup_selection_tiers(expected_poses: int, expected_candidates: int,
                           max_iters: int = 20, **mac_kwargs) -> None:
    """Precompile the fused Frank-Wolfe program for every (pose tier,
    candidate tier) up to the expected sizes.

    The budget ``k`` is a traced operand, so ONE program per tier pair
    serves every detection round; without this warmup the first selection
    at each new tier pays the remote compile/cache-load (measured 3-16 s
    per program on the relay-attached chip — it dominated the lidar e2e
    steady state at 39% of wall). Combine with jax's persistent
    compilation cache, like ``DecentralizedPGO.warmup``.

    ``mac_kwargs`` defaults to the CONFIG-DEFAULT production kwargs (via
    :func:`mac_kwargs_from_params`), NOT the MAC constructor defaults:
    they are static jit args, so warming a different combination compiles
    the wrong program (bitten round 4 when the warm-ritz default flipped
    on and warmups kept compiling the warm_ritz=False variant). Callers
    with non-default params must pass ``**mac_kwargs_from_params(params)``.
    """
    if not mac_kwargs:
        mac_kwargs = mac_kwargs_from_params({})
    for p, e in selection_tier_grid(
            expected_poses, expected_candidates,
            e_floor=mac_kwargs.get("e_floor", _E_FLOOR),
            p_floor=mac_kwargs.get("p_floor", 64)):
        warmup_selection_tier(p, e, max_iters=max_iters, **mac_kwargs)


def selection_tier_grid(expected_poses: int, expected_candidates: int,
                        e_floor: int = _E_FLOOR, p_floor: int = 64):
    """Every (pose tier, candidate tier) pair ``warmup_selection_tiers``
    covers — exposed so callers can spread the tier compiles over a thread
    pool (the remote compile service accepts concurrent programs; a serial
    warmup pays the full per-program latency end to end). ``e_floor`` must
    match the production config's ``frontend.mac_e_floor``. The mf axis is
    not part of the grid: deployments pin it to ONE tier by flooring
    ``frontend.mac_mf_floor`` above the mission's expected verified-loop
    total (the round-5 lidar e2e crossed mf=512 at loop ~512 and paid two
    90-380 s mid-run Woodbury compiles)."""
    grid = []
    p = max(p_floor, 2)
    while True:
        e = e_floor
        while True:
            grid.append((p, e))
            if e >= _tier(max(expected_candidates, 1), minimum=e_floor):
                break
            e *= 2
        if p >= _tier(max(expected_poses, 2), minimum=max(p_floor, 2)):
            break
        p *= 2
    return grid


def warmup_selection_tier(p: int, e: int, max_iters: int = 20,
                          **mac_kwargs) -> None:
    """Precompile ONE (pose tier, candidate tier) FW program (see
    ``warmup_selection_tiers``)."""
    if not mac_kwargs:
        mac_kwargs = mac_kwargs_from_params({})
    fixed = [Edge(i, i + 1, 1.0) for i in range(p - 1)]
    # ZERO-weight candidates: the compiled program is identical
    # (weights are operands, not statics) but the supergradient is
    # all-zero, so the duality gap closes after ONE Frank-Wolfe
    # iteration — each warmup execution costs one eigensolve
    # instead of max_iters of them (the big-tier warmups were
    # seconds of real solve time apiece, most of the lidar e2e's
    # ~9-minute warmup phase).
    cands = [Edge(i % (p - 1), (i + p // 2) % p, 0.0)
             for i in range(e)]
    m = MAC(fixed, cands, p, **mac_kwargs)
    # twice with distinct inits: the relay-attached chip sometimes
    # recompiles on the call after a single warmup
    m.fw_subset(np.zeros(e), min(4, e), max_iters=max_iters)
    m.fw_subset(np.full(e, 0.5), min(4, e), max_iters=max_iters)


class MAC:
    """Budgeted edge selection by algebraic-connectivity maximization.

    Same surface as the reference solver (``cslam/mac/mac.py:19-33,191-233``):
    fixed measurements define the base graph; candidates carry weights;
    ``fw_subset`` returns a rounded one-hot selection of ``k`` candidates plus
    the relaxed solution and the dual upper bound.
    """

    def __init__(self, fixed_edges: Sequence[Edge],
                 candidate_edges: Sequence[Edge], num_poses: int,
                 lobpcg_iters: int = 48, lobpcg_short_iters: int = 14,
                 fw_warm_ritz: bool = False, lobpcg_warm_iters: int = 6,
                 best_rounding: bool = False,
                 e_floor: int = _E_FLOOR, mf_floor: int = _MF_FLOOR,
                 p_floor: int = 64):
        self.num_poses = num_poses
        self._best_rounding = best_rounding
        self._mf_floor = mf_floor
        self._P = _tier(max(num_poses, 2), minimum=max(p_floor, 2))
        self._E = _tier(max(len(candidate_edges), 1), minimum=e_floor)
        self._m = len(candidate_edges)
        self._lobpcg_iters = lobpcg_iters
        self._lobpcg_short_iters = lobpcg_short_iters
        self._fw_warm_ritz = fw_warm_ritz
        self._lobpcg_warm_iters = lobpcg_warm_iters
        self._dense = self._P <= _DENSE_MAX_NODES

        self.num_lr_fixed = 0  # set by _setup_chain_lowrank on its tier

        active = np.zeros(self._P, np.float32)
        active[:num_poses] = 1.0
        self._active = jnp.asarray(active)

        ci, cj, cw = _pad_edges(candidate_edges, self._E)
        self.weights = cw[:self._m]
        self.edge_list = np.stack([ci[:self._m], cj[:self._m]], axis=1)
        self._ci, self._cj, self._cw = (jnp.asarray(ci), jnp.asarray(cj),
                                        jnp.asarray(cw))

        if self._dense:
            # Host (numpy) assembly: the fixed Laplacian is a
            # weight-independent precompute, and the fixed-edge list GROWS
            # every detection round — an eager device assembly compiled 8
            # tiny programs at a fresh shape per round (caught by
            # CompileWatch in the lidar e2e). numpy + one device_put is
            # shape-insensitive and compiles nothing.
            L = np.zeros((self._P, self._P), np.float32)
            for e in fixed_edges:
                w = np.float32(e.weight)
                L[e.i, e.i] += w
                L[e.j, e.j] += w
                L[e.i, e.j] -= w
                L[e.j, e.i] -= w
            self._L_fixed = jnp.asarray(L)
        else:
            self._setup_chain_lowrank(fixed_edges, ci, cj, cw)
        # One log line per NEW padded shape tier seen in this process: the
        # shape triple keys the compiled FW program, so this is the
        # breadcrumb that explains any mid-run compile stall (jax's own
        # cache-miss log names the program but not the shapes).
        tier = (self._P, self._E, 0 if self._dense else self._mf)
        if tier not in _SEEN_TIERS:
            _SEEN_TIERS.add(tier)
            _logger.info(
                "MAC tier first use: P=%d E=%d mf=%s (poses=%d cands=%d "
                "fixed_loops=%d)", self._P, self._E,
                "dense" if self._dense else self._mf, num_poses, self._m,
                self.num_lr_fixed)

    def _setup_chain_lowrank(self, fixed_edges: Sequence[Edge],
                             ci: np.ndarray, cj: np.ndarray,
                             cw: np.ndarray) -> None:
        """Split fixed edges into tridiagonal (|i-j|=1 odometry chain) and
        generic low-rank parts, then run the weight-independent precompute."""
        chain_w = np.zeros(self._P - 1, np.float32)
        lr_fixed: List[Edge] = []
        for e in fixed_edges:
            if abs(e.i - e.j) == 1:
                chain_w[min(e.i, e.j)] += e.weight
            else:
                lr_fixed.append(e)
        self.num_lr_fixed = len(lr_fixed)
        # Floor the non-chain fixed-edge pad high (see _MF_FLOOR): verified
        # loop closures accumulate into lr_fixed during a run, and every
        # tier crossing recompiles the whole FW program. Round 3's floor of
        # 128 was crossed at loop 129 of the lidar e2e (132 loops total) —
        # a 105 s _woodbury_fw_loop recompile mid-run.
        mf = _tier(max(len(lr_fixed), 1), minimum=self._mf_floor)
        self._mf = mf
        fi, fj, fw = _pad_edges(lr_fixed, mf)

        # sigma must dominate lambda_max over any candidate weighting:
        # Gershgorin with all candidates fully selected.
        deg = np.zeros(self._P, np.float64)
        deg[:-1] += chain_w
        deg[1:] += chain_w
        np.add.at(deg, fi, fw)
        np.add.at(deg, fj, fw)
        np.add.at(deg, ci, cw)
        np.add.at(deg, cj, cw)
        sigma = jnp.float32(2.0 * deg.max() + 1.0)

        self._chain_i = jnp.asarray(
            np.arange(self._P - 1, dtype=np.int32))
        self._chain_j = jnp.asarray(
            np.arange(1, self._P, dtype=np.int32))
        self._chain_w = jnp.asarray(chain_w)
        lr_i = np.concatenate([fi, ci])
        lr_j = np.concatenate([fj, cj])
        self._lr_i, self._lr_j = jnp.asarray(lr_i), jnp.asarray(lr_j)
        self._lr_w_fixed = jnp.asarray(fw)
        self._pre = _chain_precompute_jit(
            self._chain_w, self._lr_i, self._lr_j, self._active, sigma)

    # ------------------------------------------------------------------

    def _evaluate(self, w_pad: jnp.ndarray) -> Tuple[float, np.ndarray]:
        """(lambda_2(L(w)), supergradient) — one jitted device step."""
        if self._dense:
            lam2, grad = _dense_fw_step(self._L_fixed, self._active,
                                        self._ci, self._cj, self._cw, w_pad)
        else:
            lam2, grad = _woodbury_fw_step(
                self._pre, self._active, self._chain_i, self._chain_j,
                self._chain_w, self._lr_i, self._lr_j, self._lr_w_fixed,
                self._ci, self._cj, self._cw, w_pad, self._lobpcg_iters,
                self._lobpcg_short_iters)
        return float(lam2), np.asarray(grad)[:self._m]

    def evaluate_objective(self, w: np.ndarray) -> float:
        """lambda_2(L(w)) (reference ``mac.py:99-110``)."""
        w_pad = np.zeros(self._E, np.float32)
        w_pad[:self._m] = w
        return self._evaluate(jnp.asarray(w_pad))[0]

    def round_solution(self, grad: np.ndarray, k: int) -> np.ndarray:
        """One-hot top-k (direction-finding step, reference ``mac.py:132-147``)."""
        rounded = np.zeros(len(grad))
        if k > 0:
            rounded[np.argpartition(grad, -k)[-k:]] = 1.0
        return rounded

    def round_solution_tiebreaker(self, w: np.ndarray, k: int,
                                  decimal_tol: int = 10) -> np.ndarray:
        """Round relaxed w to k one-hot edges, ties broken by original weight
        (reference ``mac.py:168-189``)."""
        rounded = np.zeros(len(w))
        if k <= 0:
            return rounded
        trunc = np.round(w, decimals=decimal_tol)
        order = np.lexsort((self.weights[:len(w)], trunc))  # ascending
        rounded[order[-k:]] = 1.0
        return rounded

    def fw_subset_dispatch(self, w_init: np.ndarray, k: int,
                           max_iters: int = 5,
                           duality_gap_tol: float = 1e-8):
        """Dispatch the fused FW program; returns device futures ``(w,
        dual, k)`` without blocking. The chip crunches the eigensolves
        while the host moves on; :meth:`fw_subset_finish` materializes
        the selection (ONE readback). Pipelining pattern for detection
        rounds: the selection plane must not stall keyframe intake (the
        reference isolates it in its own node/process,
        ``loop_closure_detection_node.py``; our single-host equivalent is
        dispatch-now/harvest-next-cycle)."""
        from cslam_tpu.utils import device_read, profiling
        k = min(k, self._m)
        w0 = np.zeros(self._E, np.float32)
        w0[:self._m] = np.asarray(w_init, np.float32)
        # host operands stay numpy: the jit arg-staging path ships them
        # asynchronously, while an explicit device_put/jnp.asarray blocks
        # behind whatever the device queue is running (measured ~53 ms
        # each behind one busy program, and the full queue-drain — over a
        # second — in the round-4 e2e; benchmarks/relay_dispatch_probe.py)
        cmask = (np.arange(self._E) < self._m).astype(np.float32)
        tol = np.float32(duality_gap_tol)
        with profiling.span("mac.fw_dispatch"):
            if self._dense:
                w, dual, it = _dense_fw_loop(
                    self._L_fixed, self._active, self._ci, self._cj,
                    self._cw, w0, cmask, tol, k=k,
                    max_iters=max_iters,
                    best_rounding=self._best_rounding)
            else:
                w, dual, it = _woodbury_fw_loop(
                    self._pre, self._active, self._chain_i, self._chain_j,
                    self._chain_w, self._lr_i, self._lr_j, self._lr_w_fixed,
                    self._ci, self._cj, self._cw, w0, cmask,
                    tol, k=k, max_iters=max_iters,
                    lobpcg_iters=self._lobpcg_iters,
                    lobpcg_short_iters=self._lobpcg_short_iters,
                    warm_ritz=self._fw_warm_ritz,
                    lobpcg_warm_iters=self._lobpcg_warm_iters,
                    best_rounding=self._best_rounding)
            device_read.prefetch((w, dual, it))  # harvest reads ~free
        return w, dual, k, it

    #: FW iterations consumed by the last harvested solve (diagnostic:
    #: the per-solve device cost is iterations x eigensolve, so this is
    #: the number a warm-start A/B needs to explain its wall-clock)
    last_fw_iters: int = -1

    def fw_subset_finish(self, pending
                         ) -> Tuple[np.ndarray, np.ndarray, float]:
        """Materialize a :meth:`fw_subset_dispatch` result (blocks on the
        device read) and round it."""
        from cslam_tpu.utils import profiling
        w, dual, k, it = pending
        with profiling.span("mac.fw_read"):
            w_host = np.asarray(w)[:self._m].astype(np.float64)
            dual = float(dual)
            self.last_fw_iters = int(it)
        if self._best_rounding:
            # the selection must be EXACTLY the mask whose objective the
            # fused loop measured when it chose this iterate — so round
            # with the loop's own scoring, not the legacy lexicographic
            # tie-break (they can disagree within 1e-6 of a tie, and a
            # disagreement here silently swaps in an unmeasured selection)
            return (self._round_mask_host(w_host.astype(np.float32),
                                          k)[:self._m],
                    w_host, dual)
        return (self.round_solution_tiebreaker(w_host, k), w_host, dual)

    def fw_subset(self, w_init: np.ndarray, k: int, max_iters: int = 5,
                  duality_gap_tol: float = 1e-8
                  ) -> Tuple[np.ndarray, np.ndarray, float]:
        """Frank-Wolfe subset selection (reference ``mac.py:191-233``).

        Returns (rounded selection, relaxed w, dual upper bound). The whole
        FW loop — Fiedler eigensolve, supergradient, top-k direction,
        duality-gap stop — runs as ONE jitted ``lax.while_loop`` dispatch
        with a single readback, instead of the reference's per-iteration
        host round trips (2 blocking reads x max_iters; on a relay-attached
        TPU that alone is ~30 ms x 2 x 20). Compiles once per
        (node tier, edge tier, max_iters); k is a traced operand.
        """
        if self._m == 0:
            return np.zeros(0), np.zeros(0), 0.0
        return self.fw_subset_finish(self.fw_subset_dispatch(
            w_init, k, max_iters=max_iters,
            duality_gap_tol=duality_gap_tol))

    def _round_mask_host(self, w: np.ndarray, k: int) -> np.ndarray:
        """numpy mirror of the fused loop's in-program ``_round_mask``."""
        score = (w[:self._m].astype(np.float32)
                 + np.float32(1e-6) * self.weights.astype(np.float32))
        order = np.argsort(-score, kind="stable")
        mask = np.zeros(self._E, np.float32)
        mask[order[:k]] = 1.0
        return mask

    def fw_subset_host(self, w_init: np.ndarray, k: int, max_iters: int = 5,
                       duality_gap_tol: float = 1e-8
                       ) -> Tuple[np.ndarray, np.ndarray, float]:
        """Host-driven FW loop (one device step per iteration) — kept as
        the differential oracle for the fused ``fw_subset``, including the
        best-rounded-iterate tracking when the MAC enables it."""
        if self._m == 0:
            return np.zeros(0), np.zeros(0), 0.0
        k = min(k, self._m)
        w = np.zeros(self._E, np.float32)
        w[:self._m] = np.asarray(w_init, np.float32)
        dual = float("inf")
        w_best, f_best = w.copy(), -np.inf
        if self._best_rounding:
            f_best = self._evaluate(jnp.asarray(
                self._round_mask_host(w, k)))[0]
        for it in range(max_iters):
            f, grad = self._evaluate(jnp.asarray(w))
            s = np.zeros(self._E, np.float32)
            s[:self._m] = self.round_solution(grad, k)
            dual = min(dual, f + float(grad @ (s[:self._m] - w[:self._m])))
            if dual - f < duality_gap_tol:
                break
            alpha = 2.0 / (it + 2.0)
            w = w + alpha * (s - w)
            if self._best_rounding:
                f_r = self._evaluate(jnp.asarray(
                    self._round_mask_host(w, k)))[0]
                if f_r > f_best:
                    w_best, f_best = w.copy(), f_r
        if self._best_rounding:
            w_host = w_best[:self._m].astype(np.float64)
            return (self._round_mask_host(w_best, k)[:self._m], w_host,
                    float(dual))
        w_host = w[:self._m].astype(np.float64)
        return (self.round_solution_tiebreaker(w_host, k), w_host,
                float(dual))
