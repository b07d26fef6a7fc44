"""Scan Context descriptor wrapper (lidar technique selection target).

Parity with reference ``cslam/lidar_pr/scancontext.py``: fixed 20x60 shape,
80 m max radius, flattened output.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops import scancontext as sc_ops


class ScanContext:
    """Scan Context descriptor for point clouds."""

    def __init__(self, params: dict, node=None):
        self.params = params
        self.shape = [sc_ops.NUM_RING, sc_ops.NUM_SECTOR]
        self.max_length = sc_ops.MAX_LENGTH

    def compute_embedding(self, keyframe: np.ndarray) -> np.ndarray:
        """``[N, 3]`` points -> flattened ``[1200]`` descriptor."""
        sc = sc_ops.points_to_scancontext(jnp.asarray(keyframe, jnp.float32))
        return np.asarray(sc).reshape(-1)
