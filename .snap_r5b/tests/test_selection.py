"""Selection-stack tests: ACM bookkeeping + MAC solver semantics.

Covers the same invariants as the reference suite
(reference tests/test_algebraic_connectivity.py): selection cardinality,
greedy init = top-k weights, incremental add/fix/remove, connectivity
detection with excluded robots, offset/rekey/recover round-trips, and
max-weight dedup in add_match.
"""
import random

import numpy as np
import pytest

from cslam_tpu.selection.acm import AlgebraicConnectivityMaximization
from cslam_tpu.types import Edge, EdgeInterRobot

from helpers import all_considered, multi_robot_graph, simple_graph


def make_acm(robot_id=0, nb_robots=1):
    return AlgebraicConnectivityMaximization(robot_id=robot_id,
                                             max_nb_robots=nb_robots)


class TestSingleRobotSelection:

    def test_selection_cardinality(self):
        fixed, candidates = simple_graph(100, 50, seed=1)
        ac = make_acm()
        ac.set_graph(fixed, candidates)
        selection = ac.select_candidates(10, all_considered(1),
                                         greedy_initialization=False)
        assert len(selection) == 10

    def test_budget_larger_than_pool(self):
        fixed, candidates = simple_graph(50, 5, seed=2)
        ac = make_acm()
        ac.set_graph(fixed, candidates)
        selection = ac.select_candidates(10, all_considered(1),
                                         greedy_initialization=False)
        assert len(selection) == 5

    def test_greedy_initialization_is_topk(self):
        fixed, candidates = simple_graph(100, 50, seed=3)
        weights = np.random.default_rng(3).random(50)
        candidates = [e._replace(weight=float(w))
                      for e, w in zip(candidates, weights)]
        ac = make_acm()
        ac.set_graph(fixed, candidates)
        included = ac.check_graph_disconnections(all_considered(1))
        ac.compute_offsets(included)
        edges = ac.rekey_edges(ac.candidate_edges.values(), included)
        w_init = ac.greedy_initialization(10, edges)
        edge_weights = np.array([e.weight for e in edges])
        assert np.isclose(np.sum(edge_weights[w_init.astype(bool)]),
                          np.sum(np.sort(edge_weights)[-10:]))

    def test_incremental_additions(self):
        fixed, candidates = simple_graph(100, 50, seed=4)
        ac = make_acm()
        ac.set_graph(fixed, candidates)
        considered = all_considered(1)
        assert len(ac.select_candidates(10, considered, False)) == 10
        rng = random.Random(4)
        for _ in range(10):
            ac.add_candidate_edge(EdgeInterRobot(
                0, rng.randrange(100), 0, rng.randrange(100), 1.0))
        assert len(ac.select_candidates(10, considered, False)) == 10
        assert len(ac.select_candidates(12, considered, False)) == 12
        for _ in range(10):
            ac.add_candidate_edge(EdgeInterRobot(
                0, rng.randrange(100), 0, rng.randrange(100), 1.0))
        assert len(ac.select_candidates(12, considered, False)) == 12

    def test_fixed_edges_do_not_change_budget(self):
        fixed, candidates = simple_graph(100, 50, seed=5)
        ac = make_acm()
        ac.set_graph(fixed, candidates)
        considered = all_considered(1)
        assert len(ac.select_candidates(10, considered, False)) == 10
        rng = random.Random(5)
        for _ in range(10):
            ac.add_fixed_edge(EdgeInterRobot(
                0, rng.randrange(100), 0, rng.randrange(100), 1.0))
        assert len(ac.select_candidates(10, considered, False)) == 10

    def test_selection_comes_from_pool_no_duplicates(self):
        fixed, candidates = simple_graph(100, 50, seed=6)
        ac = make_acm()
        ac.set_graph(fixed, candidates)
        pool_before = list(ac.candidate_edges.values())
        selection = ac.select_candidates(10, all_considered(1), False)
        assert len(selection) == 10
        seen = set()
        for e in selection:
            assert e in pool_before
            seen.add(e)
        assert len(seen) == 10

    def test_remove_candidates(self):
        fixed, candidates = simple_graph(100, 50, seed=7)
        ac = make_acm()
        ac.set_graph(fixed, candidates)
        n0 = len(ac.candidate_edges)
        ac.remove_candidate_edges(list(ac.candidate_edges.values())[:10])
        assert len(ac.candidate_edges) == n0 - 10
        # removing a non-existent edge is a no-op for the pool
        ac.remove_candidate_edges([EdgeInterRobot(0, 1, 4, 1, 1.0)])
        assert len(ac.candidate_edges) == n0 - 10

    def test_removed_candidates_never_return(self):
        ac = make_acm()
        e = EdgeInterRobot(0, 1, 0, 30, 0.5)
        ac.add_candidate_edge(e)
        ac.remove_candidate_edges([e], failed=True)
        ac.add_candidate_edge(e)  # demoted permanently
        assert len(ac.candidate_edges) == 0

    def test_pool_mutation_counter(self):
        """pool_mutations drives the detection plane's MAC round-skip
        (frontend.mac_min_new_candidates): it must tick on every change
        that can alter a solve and stay flat on no-ops."""
        ac = make_acm()
        e = EdgeInterRobot(0, 1, 0, 30, 0.5)
        m = ac.pool_mutations
        ac.add_match(e)
        assert ac.pool_mutations == m + 1
        ac.add_match(e._replace(weight=0.3))  # lower weight: ignored
        assert ac.pool_mutations == m + 1
        ac.add_match(e._replace(weight=0.9))  # upgrade: counts
        assert ac.pool_mutations == m + 2
        ac.candidate_edges_to_fixed([e])      # promote + remove
        m2 = ac.pool_mutations
        assert m2 > m + 2
        ac.add_candidate_edge(e)              # demoted permanently: no-op
        ac.remove_candidate_edges([EdgeInterRobot(0, 1, 4, 1, 1.0)])
        assert ac.pool_mutations == m2

    def test_bounded_candidate_pool(self):
        """frontend.max_candidate_pool evicts the weakest candidate (not
        permanently) so the MAC E axis stays on one padded tier."""
        ac = AlgebraicConnectivityMaximization(
            robot_id=0, max_nb_robots=2,
            extra_params={"frontend.max_candidate_pool": 4})
        for k in range(6):
            ac.add_match(EdgeInterRobot(0, k, 1, k + 2, 0.1 * (k + 1)))
        assert len(ac.candidate_edges) == 4
        weights = sorted(e.weight for e in ac.candidate_edges.values())
        assert weights == pytest.approx([0.3, 0.4, 0.5, 0.6])
        # evicted edges re-enter on a stronger re-match
        ac.add_match(EdgeInterRobot(0, 0, 1, 2, 0.9))
        assert len(ac.candidate_edges) == 4
        assert max(e.weight for e in ac.candidate_edges.values()) \
            == pytest.approx(0.9)

    def test_bounded_pool_suppresses_candidate_tier_prefetch(self, monkeypatch):
        """With max_candidate_pool <= the current E tier, the next
        candidate tier is unreachable — the background prefetch must NOT
        compile it (it would burn the serialized compile service; a
        103 s bg stall was measured in the round-5 lidar e2e)."""
        from cslam_tpu.selection import mac as mac_mod
        calls = []
        monkeypatch.setattr(
            mac_mod, "prefetch_selection_tier_async",
            lambda num_poses, num_candidates, num_fixed_loops=0, **kw:
                calls.append((num_poses, num_candidates, num_fixed_loops)))
        # 50 candidates on a 64-wide E tier (e_floor 16) is past the 60%
        # watermark, so only the pool bound (50 <= 64) stands between us
        # and a prefetch of the unreachable 128 tier.
        rng = random.Random(9)
        fixed = [Edge(i, i + 1, 1.0) for i in range(99)]
        candidates = list({(a, b) for a, b in
                           (sorted(rng.sample(range(100), 2))
                            for _ in range(200))})[:50]
        candidates = [Edge(a, b, 1.0) for a, b in candidates]
        w_init = np.zeros(len(candidates))
        ac = AlgebraicConnectivityMaximization(
            robot_id=0, max_nb_robots=1,
            extra_params={"frontend.mac_e_floor": 16,
                          "frontend.max_candidate_pool": 50})
        ac.total_nb_poses = 100
        ac.run_mac_solver(fixed, candidates, w_init, 10)
        assert all(c[1] <= 50 for c in calls), calls
        # control: without the pool bound the same graph prefetches the
        # next candidate tier
        calls.clear()
        ac2 = AlgebraicConnectivityMaximization(
            robot_id=0, max_nb_robots=1,
            extra_params={"frontend.mac_e_floor": 16})
        ac2.total_nb_poses = 100
        ac2.run_mac_solver(fixed, candidates, w_init, 10)
        assert any(c[1] > 50 for c in calls), calls

    def test_candidate_to_fixed_promotion(self):
        fixed, candidates = simple_graph(100, 50, seed=8)
        ac = make_acm()
        ac.set_graph(fixed, candidates)
        pool_before = dict(ac.candidate_edges)
        considered = all_considered(1)
        selection0 = ac.select_candidates(10, considered, False)
        ac.candidate_edges_to_fixed(selection0)
        for e in selection0:
            assert e not in list(ac.candidate_edges.values())
        selection1 = ac.select_candidates(10, considered, False)
        for e in selection1:
            assert e in list(pool_before.values())
        for e0 in selection0:
            for e1 in selection1:
                assert not (e0.robot0_keyframe_id == e1.robot0_keyframe_id
                            and e0.robot1_keyframe_id == e1.robot1_keyframe_id)


class TestMultiRobot:

    def test_remove_candidate_multi(self):
        fixed, candidates = multi_robot_graph(10, 10, 3, seed=10)
        ac = make_acm(0, 3)
        ac.set_graph(fixed, candidates)
        pool_before = dict(ac.candidate_edges)
        selection = ac.select_candidates(3, all_considered(3), False)
        assert len(selection) == 3
        for e in selection:
            assert e in list(pool_before.values())
        n0 = len(ac.candidate_edges)
        ac.remove_candidate_edges([list(ac.candidate_edges.values())[0]])
        assert len(ac.candidate_edges) == n0 - 1
        ac.remove_candidate_edges([EdgeInterRobot(0, 1, 4, 1, 1.0)])
        assert len(ac.candidate_edges) == n0 - 1

    def test_graph_disconnections(self):
        fixed, candidates = multi_robot_graph(10, 10, 3, seed=11)
        ac = make_acm(0, 3)
        ac.set_graph(fixed, candidates)
        included = ac.check_graph_disconnections(all_considered(3))
        assert all(included.values())

        considered = all_considered(3)
        considered[1] = False
        included = ac.check_graph_disconnections(considered)
        assert included[0] and included[2] and not included[1]

    def test_graph_disconnections_robot_absent(self):
        fixed, candidates = multi_robot_graph(10, 10, 3, seed=12)
        fixed = [e for e in fixed if 0 not in (e.robot0_id, e.robot1_id)]
        candidates = [e for e in candidates
                      if 0 not in (e.robot0_id, e.robot1_id)]
        ac = make_acm(1, 3)
        ac.set_graph(fixed, candidates)
        included = ac.check_graph_disconnections(all_considered(3))
        assert not included[0]
        assert included[1] and included[2]

    def test_compute_offsets(self):
        fixed, candidates = multi_robot_graph(10, 10, 5, seed=13)
        ac = make_acm(1, 5)
        ac.set_graph(fixed, candidates)
        included = ac.check_graph_disconnections(all_considered(5))
        ac.compute_offsets(included)
        nb = ac.nb_poses
        assert ac.offsets[0] == 0
        for r in range(1, 5):
            assert ac.offsets[r] == ac.offsets[r - 1] + nb[r - 1]

    def test_compute_offsets_with_excluded_robots(self):
        fixed, candidates = multi_robot_graph(10, 10, 5, seed=14)
        nb = {r: 10 for r in range(5)}

        def drop(robot, edges):
            return [e for e in edges if robot not in (e.robot0_id, e.robot1_id)]

        # robot 0 absent from the graph
        fixed1, cand1 = drop(0, fixed), drop(0, candidates)
        ac = make_acm(1, 5)
        ac.set_graph(fixed1, cand1)
        included = ac.check_graph_disconnections(all_considered(5))
        ac.compute_offsets(included)
        assert ac.offsets[0] == 0 and ac.offsets[1] == 0
        assert ac.offsets[2] == ac.offsets[1] + nb[1]
        assert ac.offsets[3] == ac.offsets[2] + nb[2]
        assert ac.offsets[4] == ac.offsets[3] + nb[3]

        # robots 0 and 3 absent; 1-4 linked to keep connectivity
        fixed2, cand2 = drop(3, fixed1), drop(3, cand1)
        fixed2.append(EdgeInterRobot(1, 1, 4, 1, 1.0))
        ac = make_acm(1, 5)
        ac.set_graph(fixed2, cand2)
        included = ac.check_graph_disconnections(all_considered(5))
        ac.compute_offsets(included)
        assert ac.offsets[0] == 0 and ac.offsets[1] == 0
        assert ac.offsets[2] == ac.offsets[1] + nb[1]
        assert ac.offsets[3] == 0
        assert ac.offsets[4] == ac.offsets[2] + nb[2]

    def test_rekey_recover_roundtrip(self):
        nb_poses = 10
        fixed, candidates = multi_robot_graph(nb_poses, 10, 3, seed=15)
        ac = make_acm(0, 3)
        ac.set_graph(fixed, candidates)
        included = ac.check_graph_disconnections(all_considered(3))
        ac.compute_offsets(included)

        rekeyed_fixed = ac.rekey_edges(ac.fixed_edges, included)
        assert len(ac.fixed_edges) == 2
        rekeyed_fixed.extend(ac.fill_odometry())
        assert len(rekeyed_fixed) == 3 * (nb_poses - 1) + 2

        rekeyed = ac.rekey_edges(ac.candidate_edges.values(), included)
        values = list(ac.candidate_edges.values())
        for e, r in zip(values, rekeyed):
            assert r.i == e.robot0_keyframe_id + e.robot0_id * nb_poses
            assert r.j == e.robot1_keyframe_id + e.robot1_id * nb_poses

        recovered = ac.recover_inter_robot_edges(rekeyed, included)
        for e, r in zip(values, recovered):
            assert r.robot0_keyframe_id == e.robot0_keyframe_id
            assert r.robot1_keyframe_id == e.robot1_keyframe_id

    @pytest.mark.parametrize("robot_id", [0, 1])
    def test_multi_robot_selection(self, robot_id):
        fixed, candidates = multi_robot_graph(100, 100, 3, seed=16 + robot_id)
        ac = make_acm(robot_id, 3)
        ac.set_graph(fixed, candidates)
        selection = ac.select_candidates(10, all_considered(3), False)
        assert len(selection) == 10
        for s in selection:
            assert 0 <= s.robot0_keyframe_id < 100
            assert 0 <= s.robot1_keyframe_id < 100
            assert 0 <= s.robot0_id < 3
            assert 0 <= s.robot1_id < 3

    def test_add_match_max_weight_dedup(self):
        ac = make_acm(0, 3)
        ac.add_match(EdgeInterRobot(0, 1, 1, 3, 0.1))
        assert len(ac.candidate_edges) == 1
        ac.add_match(EdgeInterRobot(0, 2, 2, 4, 0.1))
        assert len(ac.candidate_edges) == 2
        ac.add_match(EdgeInterRobot(0, 1, 1, 3, 0.2))
        assert len(ac.candidate_edges) == 2
        assert ac.candidate_edges[(0, 1, 1, 3)].weight == pytest.approx(0.2)
        # lower-weight re-observation does not downgrade
        ac.add_match(EdgeInterRobot(0, 1, 1, 3, 0.05))
        assert ac.candidate_edges[(0, 1, 1, 3)].weight == pytest.approx(0.2)

    def test_symmetric_edge_equality(self):
        a = EdgeInterRobot(0, 1, 1, 3, 0.1)
        b = EdgeInterRobot(1, 3, 0, 1, 0.9)
        assert a == b
        assert hash(a) == hash(b)
        assert a != EdgeInterRobot(0, 1, 1, 4, 0.1)


class TestMacSolver:

    def test_mac_improves_connectivity_over_greedy(self):
        """MAC should pick a selection whose lambda_2 is at least as good as
        greedy's on a graph where weights mislead greedy."""
        from cslam_tpu.selection.mac import MAC
        rng = np.random.default_rng(0)
        n = 40
        # chain graph (odometry)
        fixed = [Edge(i, i + 1, 1.0) for i in range(n - 1)]
        # candidates: many short-range edges with high weight, a few
        # long-range with low weight
        candidates = []
        for i in range(0, n - 2, 2):
            candidates.append(Edge(i, i + 2, 1.0))
        candidates.append(Edge(0, n - 1, 0.5))
        candidates.append(Edge(5, n - 5, 0.5))
        mac = MAC(fixed, candidates, n)

        k = 2
        weights = np.array([c.weight for c in candidates])
        greedy = np.zeros(len(candidates))
        greedy[np.argsort(weights)[-k:]] = 1.0
        rounded, _, _ = mac.fw_subset(greedy, k, max_iters=20)
        assert rounded.sum() == k
        assert (mac.evaluate_objective(rounded)
                >= mac.evaluate_objective(greedy) - 1e-6)

    def test_solver_bug_surfaces(self, monkeypatch):
        """A programming error inside the eigensolver must propagate, not be
        silently swallowed into the greedy fallback (round-1 VERDICT: the
        blanket except in run_mac_solver hid any device-solver bug)."""
        import pytest

        from cslam_tpu.selection import acm as acm_mod
        from cslam_tpu.selection.acm import (
            AlgebraicConnectivityMaximization)

        def boom(self, *a, **k):
            raise RuntimeError("injected eigensolver bug")

        monkeypatch.setattr(acm_mod.MAC, "fw_subset_finish", boom)
        acm = AlgebraicConnectivityMaximization(robot_id=0, max_nb_robots=2)
        acm.total_nb_poses = 4
        with pytest.raises(RuntimeError, match="injected"):
            acm.run_mac_solver([Edge(0, 1, 1.0)], [Edge(1, 2, 1.0)],
                               np.zeros(1), 1)

    def test_numeric_failure_falls_back_and_counts(self, monkeypatch):
        """Genuine numeric failures degrade to the initial guess with a
        visible counter."""
        from cslam_tpu.selection import acm as acm_mod
        from cslam_tpu.selection.acm import (
            AlgebraicConnectivityMaximization)

        def singular(self, *a, **k):
            raise np.linalg.LinAlgError("singular")

        monkeypatch.setattr(acm_mod.MAC, "fw_subset_finish", singular)
        acm = AlgebraicConnectivityMaximization(robot_id=0, max_nb_robots=2)
        acm.total_nb_poses = 4
        w_init = np.array([1.0])
        out = acm.run_mac_solver([Edge(0, 1, 1.0)], [Edge(1, 2, 1.0)],
                                 w_init, 1)
        np.testing.assert_array_equal(out, w_init)
        assert acm.mac_solver_failures == 1

    def test_numeric_failure_retry_ladder_recovers(self, monkeypatch):
        """The reference retries MAC with increasingly random inits on
        singular-matrix failure before degrading (acm.py:448-465); a
        failure that clears on a re-initialization must recover without
        counting as a solver failure."""
        from cslam_tpu.selection import acm as acm_mod
        from cslam_tpu.selection.acm import (
            AlgebraicConnectivityMaximization)

        calls = {"n": 0}

        def flaky(self, pending):
            calls["n"] += 1
            if calls["n"] < 3:
                raise np.linalg.LinAlgError("singular")
            # a pending handle is (w_dev, dual_dev, k): recover w_init
            w = np.asarray(pending[0])[:self._m]
            return w, None, None

        monkeypatch.setattr(acm_mod.MAC, "fw_subset_finish", flaky)
        acm = AlgebraicConnectivityMaximization(robot_id=0, max_nb_robots=2)
        acm.total_nb_poses = 8
        candidates = [Edge(0, 2, 1.0), Edge(1, 3, 0.9), Edge(2, 4, 0.8),
                      Edge(0, 4, 0.7)]
        out = acm.run_mac_solver([Edge(0, 1, 1.0)], candidates,
                                 np.array([1.0, 1.0, 1.0, 0.0]), 3)
        assert calls["n"] == 3           # two failures, then recovery
        assert acm.mac_solver_failures == 0
        assert out.sum() >= 1            # a pseudo-greedy re-init solution

    def test_disconnected_graph_does_not_raise(self):
        """Where the reference's LU eigensolver throws on disconnected graphs
        (reference acm.py:449-465), ours returns lambda_2 = 0 gracefully."""
        from cslam_tpu.selection.mac import MAC
        fixed = [Edge(0, 1, 1.0), Edge(2, 3, 1.0)]  # two components
        candidates = [Edge(1, 2, 1.0), Edge(0, 3, 0.9)]
        mac = MAC(fixed, candidates, 4)
        rounded, _, _ = mac.fw_subset(np.zeros(2), 1, max_iters=5)
        assert rounded.sum() == 1


class TestTierFloors:
    """Config-driven shape-tier floors (frontend.mac_{p,e,mf}_floor):
    deployments pin each padded axis above the mission's expected totals
    so a growing graph never crosses a tier mid-run (a crossing compiles
    a fresh FW program — 90-380 s each on the remote compile service,
    the round-5 lidar-e2e throughput ceiling)."""

    def test_floors_flow_from_params(self):
        from cslam_tpu.selection.mac import MAC, mac_kwargs_from_params
        kw = mac_kwargs_from_params({"frontend.mac_p_floor": 1024,
                                     "frontend.mac_e_floor": 256,
                                     "frontend.mac_mf_floor": 64})
        fixed = [Edge(i, i + 1, 1.0) for i in range(9)] + [Edge(0, 5, 1.0)]
        cands = [Edge(i, (i + 4) % 10, 1.0) for i in range(6)]
        mac = MAC(fixed, cands, 10, **kw)
        assert (mac._P, mac._E, mac._mf) == (1024, 256, 64)
        assert not mac._dense  # floored past _DENSE_MAX_NODES

    def test_floored_woodbury_matches_dense_selection(self):
        """The same small graph selects identically on the floored
        (P=1024 Woodbury) tier and the default (dense eigh) tier."""
        from cslam_tpu.selection.mac import MAC, mac_kwargs_from_params
        fixed = [Edge(i, i + 1, 1.0) for i in range(49)] + [Edge(0, 25, 1.0)]
        cands = [Edge(i, (i + 20) % 50, 1.0) for i in range(8)]
        kw = mac_kwargs_from_params({"frontend.mac_p_floor": 1024,
                                     "frontend.mac_e_floor": 256,
                                     "frontend.mac_mf_floor": 64})
        sel_f, _, _ = MAC(fixed, cands, 50, **kw).fw_subset(
            np.full(8, 0.5), 3, max_iters=5)
        sel_d, _, _ = MAC(fixed, cands, 50, **mac_kwargs_from_params({})
                          ).fw_subset(np.full(8, 0.5), 3, max_iters=5)
        assert np.array_equal(sel_f, sel_d)

    def test_tier_grid_respects_floors(self):
        from cslam_tpu.selection.mac import selection_tier_grid
        grid = selection_tier_grid(300, 300, e_floor=256, p_floor=512)
        assert grid == [(512, 256), (512, 512)]
        # one-tier mission: floors at/above every expected count
        grid = selection_tier_grid(1500, 3000, e_floor=4096, p_floor=2048)
        assert grid == [(2048, 4096)]
