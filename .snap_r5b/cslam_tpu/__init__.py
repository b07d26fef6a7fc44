"""cslam_tpu — a TPU-native decentralized collaborative-SLAM engine.

A from-scratch rebuild of the capabilities of Swarm-SLAM's ``cslam`` core
(reference: lajoiepy/cslam) designed for JAX/XLA/Pallas on TPU:

- per-keyframe global-descriptor place recognition (CosPlace / NetVLAD /
  ScanContext) as batched JAX inference (``cslam_tpu.models``),
- top-k cosine nearest-neighbor search over HBM-resident descriptor banks
  as fused XLA/Pallas kernels (``cslam_tpu.matching``, ``cslam_tpu.ops``),
- communication-budgeted inter-robot loop-closure selection by algebraic
  connectivity maximization with an on-device Fiedler eigensolver
  (``cslam_tpu.selection``),
- a minimum-vertex-cover communication broker (``cslam_tpu.selection.broker``),
- a from-scratch robust SE(3) pose-graph optimizer (GNC-TLS around a jitted
  Gauss-Newton/LM core, plus a mesh-sharded distributed Gauss-Seidel mode)
  (``cslam_tpu.pgo``),
- a thin host-side runtime for the gossip / heartbeat / neighbor-management
  plane and the decentralized PGO state machine (``cslam_tpu.runtime``).

The reference system's behavior contract (state-machine semantics, edge
selection math, estimate fidelity, message schema) is preserved; its
architecture (ROS 2 nodes, PyTorch/GTSAM/RTAB-Map) is replaced by an
idiomatic TPU-first design.
"""

__version__ = "0.1.0"

from cslam_tpu.types import Edge, EdgeInterRobot  # noqa: F401
