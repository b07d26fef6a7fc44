"""Shared synthetic-graph builders for the selection-stack tests.

Mirrors the reference test strategy (reference tests/test_algebraic_connectivity.py:15-74):
random single- and multi-robot graphs with fixed spanning edges plus random
candidate edges, built from plain EdgeInterRobot records — no runtime needed.
"""
import random

import numpy as np

from cslam_tpu.types import EdgeInterRobot


def simple_graph(nb_poses, nb_candidates, weight=1.0, seed=None):
    """Single-robot graph: no fixed edges, random candidate self-edges."""
    rng = random.Random(seed)
    candidates = {}
    while len(candidates) < nb_candidates:
        e = EdgeInterRobot(0, rng.randrange(nb_poses), 0,
                           rng.randrange(nb_poses), weight)
        candidates[(e.robot0_keyframe_id, e.robot1_keyframe_id)] = e
    return [], list(candidates.values())


def multi_robot_graph(nb_poses, nb_candidates, nb_robots, weight=1.0,
                      seed=None):
    """Multi-robot graph: a fixed chain of inter-robot links for base
    connectivity plus random inter-robot candidates."""
    rng = random.Random(seed)
    fixed = [EdgeInterRobot(i, nb_poses - 1, i + 1, nb_poses - 1, weight)
             for i in range(nb_robots - 1)]
    candidates = {}
    while len(candidates) < nb_candidates:
        r0 = rng.randrange(nb_robots)
        r1 = rng.choice([r for r in range(nb_robots) if r != r0])
        e = EdgeInterRobot(r0, rng.randrange(nb_poses), r1,
                           rng.randrange(nb_poses), weight)
        candidates[e.key()] = e
    return fixed, list(candidates.values())


def all_considered(nb_robots):
    return {i: True for i in range(nb_robots)}


def unit_vectors(n, dim, rng=None):
    rng = rng or np.random.default_rng(0)
    v = rng.random((n, dim))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def matching_params(robot_id=0, max_nb_robots=2, sensor_type="stereo",
                    similarity_threshold=0.0):
    return {
        "robot_id": robot_id,
        "max_nb_robots": max_nb_robots,
        "frontend.sensor_type": sensor_type,
        "frontend.similarity_threshold": similarity_threshold,
        "frontend.enable_sparsification": True,
        "frontend.nb_best_matches": 10,
        "frontend.intra_loop_min_inbetween_keyframes": 10,
        "evaluation.enable_sparsification_comparison": False,
    }
