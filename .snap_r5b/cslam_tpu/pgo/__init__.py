"""From-scratch robust SE(3) pose-graph optimization (replaces GTSAM)."""

from cslam_tpu.pgo.factor_graph import FactorGraph, PoseGraphArrays  # noqa: F401
from cslam_tpu.pgo.solver import gnc_optimize, lm_optimize  # noqa: F401
