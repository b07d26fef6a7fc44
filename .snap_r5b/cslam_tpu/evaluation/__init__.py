"""Evaluation, metrics logging, and trajectory accuracy tooling."""

from cslam_tpu.evaluation.ate import absolute_trajectory_error  # noqa: F401
from cslam_tpu.evaluation.logger import ExperimentLogger  # noqa: F401
