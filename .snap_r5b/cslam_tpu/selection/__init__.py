"""Budgeted inter-robot loop-closure selection (MAC) and the comm broker."""

from cslam_tpu.selection.acm import AlgebraicConnectivityMaximization  # noqa: F401
from cslam_tpu.selection.broker import Broker  # noqa: F401
from cslam_tpu.selection.mac import MAC  # noqa: F401
