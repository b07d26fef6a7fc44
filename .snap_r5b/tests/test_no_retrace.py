"""Warmup/production call-structure equality: no steady-state compiles.

jax.jit's cache key includes WHICH keyword arguments were explicitly
passed, not just their values — a warmup call spelled with fewer kwargs
than the production call retraces and recompiles the entire program on
first real use (measured 40+ s per tier on the relay-attached chip; this
was the round-3 lidar e2e's dominant cost and the source of the
"recompiles after a single warmup" lore). These tests warm a tier the
production way, then run the real product path under a CompileWatch and
assert ZERO compiles. Any future drift between a warmup and its
production call shape fails here on CPU instead of burning minutes on
chip.
"""
import numpy as np
import pytest

from cslam_tpu.utils.profiling import CompileWatch


def test_backend_gnc_no_retrace_after_warmup():
    """DecentralizedPGO.warmup must compile the exact programs
    _optimize_impl dispatches (reference behavior: GTSAM has no JIT; our
    equivalent guarantee is warm-tier coverage)."""
    from cslam_tpu.runtime.bus import MessageBus, RobotContext
    from cslam_tpu.runtime.clock import VirtualClock
    from cslam_tpu.runtime.backend_node import DecentralizedPGO
    from cslam_tpu.pgo.factor_graph import FactorGraph

    bus, clock = MessageBus(), VirtualClock()
    be = DecentralizedPGO(RobotContext(
        bus, clock, 0, {"robot_id": 0, "max_nb_robots": 2}))
    be.warmup(expected_poses=12, expected_edges=14)

    # production-style graph in the warmed tier (16 poses / 16 edges)
    g = FactorGraph()
    rng = np.random.default_rng(0)
    for k in range(12):
        T = np.eye(4)
        T[:3, 3] = [k, 0.1 * k, 0]
        g.add_variable((0, k), T)
    for k in range(11):
        z = np.eye(4)
        z[:3, 3] = [1, 0.1, 0] + rng.normal(scale=0.01, size=3)
        g.add_between((0, k), (0, k + 1), z, np.full(6, 0.1))
    z = np.eye(4)
    z[:3, 3] = [11, 1.1, 0]
    g.add_between((0, 0), (0, 11), z, np.full(6, 0.1), robust=True)
    g.add_prior((0, 0), np.eye(4), np.full(6, 0.1))

    with CompileWatch() as w:
        be._optimize(g)
    assert w.count == 0, f"cold path compiled: {sorted(set(w.names))}"

    # the incremental (gnc_reoptimize) path too
    be._warmed_this_round = True
    be.optimization_count = 1
    with CompileWatch() as w2:
        be._optimize(g)
    assert w2.count == 0, f"warm path compiled: {sorted(set(w2.names))}"


def test_mac_selection_no_retrace_after_warmup():
    """warmup_selection_tiers must cover the program ACM's production
    fw_subset dispatches, including small-candidate rounds. The MACs are
    built with the PRODUCTION kwargs (mac_kwargs_from_params) — warming a
    different static-arg combination compiles the wrong program (bitten
    round 4 when the warm-ritz default flipped on and the bench warmup
    kept compiling the warm_ritz=False variant mid-run)."""
    from cslam_tpu.selection.mac import (MAC, Edge, mac_kwargs_from_params,
                                         warmup_selection_tiers)

    warmup_selection_tiers(48, 40)
    kw = mac_kwargs_from_params({})

    fixed = [Edge(i, i + 1, 1.0) for i in range(47)]
    # verified loop closures become non-chain FIXED edges mid-run; their
    # count must not shift the compiled program (host L_fixed assembly in
    # the dense tier / lr pad floor in the Woodbury tier), and MAC
    # construction itself runs every detection round so it sits INSIDE
    # the watch.
    fixed += [Edge(i, i + 20, 1.5) for i in range(12)]
    cands = [Edge(3 * i % 47, (3 * i + 17) % 48, float(1 + i % 3))
             for i in range(9)]
    with CompileWatch() as w:
        m = MAC(fixed, cands, 48, **kw)
        sel, _, _ = m.fw_subset(np.zeros(len(cands)), 4, max_iters=20)
        # a later round: MORE fixed edges (odometry + new verified loops)
        m2 = MAC(fixed + [Edge(2 * i, 2 * i + 9, 1.0) for i in range(5)],
                 cands[:7], 48, **kw)
        m2.fw_subset(np.zeros(7), 3, max_iters=20)
    assert sel.sum() == 4
    assert w.count == 0, f"selection compiled: {sorted(set(w.names))}"


def test_mac_woodbury_construction_no_retrace():
    """The Woodbury tier's weight-independent precompute must be ONE
    program per shape tier: constructing a second MAC in the same tiers
    (different fixed/candidate counts) compiles nothing."""
    from cslam_tpu.selection.mac import MAC, Edge

    P = 600  # > _DENSE_MAX_NODES -> chain+low-rank tier
    fixed = [Edge(i, i + 1, 1.0) for i in range(P - 1)]
    cands = [Edge(7 * i % P, (7 * i + 31) % P, 1.0) for i in range(20)]
    m = MAC(fixed, cands, P)
    m.fw_subset(np.zeros(len(cands)), 4, max_iters=8)
    with CompileWatch() as w:
        # Round-3 regression shape: 140 verified loops crossed the old
        # mf floor of 128 mid-run (a 105 s foreground recompile on chip)
        # and a 300-candidate round crossed the old E tier of 256. Both
        # must now land inside the floored tiers.
        many_loops = [Edge((5 * i) % (P - 3), (5 * i + 41) % P, 1.1)
                      for i in range(140)]
        many_cands = [Edge((3 * i) % (P - 2), (3 * i + 67) % P, 1.0)
                      for i in range(300)]
        m2 = MAC(fixed + many_loops, many_cands, P)
        m2.fw_subset(np.zeros(300), 4, max_iters=8)
    assert w.count == 0, f"woodbury tier compiled: {sorted(set(w.names))}"


def test_registration_batch_no_retrace_after_warmup():
    """LidarFrontEnd.warmup + the pair-tier cap must cover every
    compute_transform_batch dispatch, including chunked large batches."""
    from cslam_tpu.runtime.bus import MessageBus, RobotContext
    from cslam_tpu.runtime.clock import VirtualClock
    from cslam_tpu.runtime.lidar_frontend import LidarFrontEnd
    from cslam_tpu.ops import registration

    fe = LidarFrontEnd(RobotContext(
        MessageBus(), VirtualClock(), 0,
        {"robot_id": 0, "max_nb_robots": 2, "frontend.voxel_size": 0.5}))
    fe.warmup(pair_tiers=(1, 2), pad_size=96)

    rng = np.random.default_rng(1)
    cloud = rng.normal(size=(80, 3)).astype(np.float32) * 4
    # 3 pairs with the cap at 2 -> chunks of (2, 1), both warmed tiers
    pairs = [(cloud, cloud + rng.normal(scale=0.01, size=cloud.shape)
              .astype(np.float32)) for _ in range(3)]
    with CompileWatch() as w:
        res = registration.compute_transform_batch(
            pairs, 0.5, 10, pad_size=96, max_pair_tier=2)
    assert len(res) == 3
    assert w.count == 0, f"verification compiled: {sorted(set(w.names))}"


def test_scancontext_multi_bank_no_retrace_after_warmup():
    """warmup_search_tiers(multi_bank_counts=...) must cover the varying
    non-empty-bank counts multi_search_best groups at runtime."""
    from cslam_tpu.matching.scancontext_bank import (
        ScanContextBank, multi_search_best, warmup_search_tiers)

    warmup_search_tiers(1024, batch_tiers=(1, 2),
                        multi_bank_counts=(1, 2))
    rng = np.random.default_rng(2)

    def sc():
        return rng.uniform(size=(20, 60)).astype(np.float32)

    banks = [ScanContextBank(), ScanContextBank(), ScanContextBank()]
    banks[0].add_item(sc(), ("r1", 0))
    banks[1].add_item(sc(), ("r2", 0))
    # banks[2] stays empty -> grouped count 2; then 1 after r2 excluded
    with CompileWatch() as w:
        multi_search_best(banks, sc())
        multi_search_best([banks[0], banks[2]], sc())
    assert w.count == 0, f"multi-bank search compiled: {sorted(set(w.names))}"
