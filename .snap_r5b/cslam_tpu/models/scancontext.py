"""Scan Context descriptor wrapper (lidar technique selection target).

Parity with reference ``cslam/lidar_pr/scancontext.py``: fixed 20x60 shape,
80 m max radius, flattened output.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops import scancontext as sc_ops

# Clouds are padded up to power-of-two point-count tiers before the jitted
# binning op: voxel-downsampled clouds have a different row count every
# keyframe, and an unpadded call would recompile per distinct N (measured:
# 104 XLA compiles of points_to_scancontext in a 250-keyframe e2e run —
# minutes each on the remote TPU compile service). Padding rows are NaN,
# which the op already treats as invalid (scancontext_utils.py:58 parity).
_MIN_TIER = 512


def _pad_tier(n: int) -> int:
    tier = _MIN_TIER
    while tier < n:
        tier *= 2
    return tier


class ScanContext:
    """Scan Context descriptor for point clouds."""

    def __init__(self, params: dict, node=None):
        self.params = params
        self.shape = [sc_ops.NUM_RING, sc_ops.NUM_SECTOR]
        self.max_length = sc_ops.MAX_LENGTH
        # A 20x60 max-binning over a few thousand points costs ~0.5 ms on
        # the host — cheaper than the device dispatch it replaces (a full
        # relay round-trip per keyframe on the tunneled chip). The device
        # path remains for huge clouds and as the parity oracle.
        self.host_binning = bool(params.get(
            "frontend.scancontext_host_binning", True))

    def warmup(self, max_points: int) -> None:
        """Precompile the binning op for every point-count tier up to
        ``max_points`` (no-op on the host-binning path)."""
        if self.host_binning:
            return
        tier = _MIN_TIER
        while True:
            self.compute_embedding(np.zeros((tier, 3), np.float32))
            if tier >= max_points:
                return
            tier *= 2

    def compute_embedding(self, keyframe: np.ndarray) -> np.ndarray:
        """``[N, 3]`` points -> flattened ``[1200]`` descriptor."""
        pts = np.asarray(keyframe, np.float32).reshape(-1, 3)
        if self.host_binning:
            return sc_ops.points_to_scancontext_np(pts).reshape(-1)
        tier = _pad_tier(len(pts))
        if tier != len(pts):
            padded = np.full((tier, 3), np.nan, np.float32)
            padded[:len(pts)] = pts
            pts = padded
        sc = sc_ops.points_to_scancontext(jnp.asarray(pts))
        return np.asarray(sc).reshape(-1)
