"""Scan Context descriptors as vectorized JAX ops.

TPU-native rebuild of the reference's per-point Python loops
(``cslam/lidar_pr/scancontext_utils.py``): polar (ring x sector) max-height
binning becomes one scatter-max, and the rotation-invariant distance — the
reference's double 60x60 Python loop (``scancontext_utils.py:78-114``, a
ranked hot loop) — becomes a single batched gather + einsum over all
circular shifts.

Semantics preserved:
- descriptor shape (num_ring=20, num_sector=60), max radius 80 m, heights
  offset by +2 m and implicitly clamped at 0 (the reference's zero-filled
  storage has the same effect),
- out-of-range radii clamp to the outermost ring,
- column pairs where either column is all-zero are excluded from the mean
  cosine similarity,
- ``distance = 1 - max_shift mean_cossim``; yaw index convention matches the
  reference (shift s compares ``roll(candidate, s+1)`` against the query,
  yaw_diff = argmax + 1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NUM_RING = 20
NUM_SECTOR = 60
MAX_LENGTH = 80.0
HEIGHT_OFFSET = 2.0


@functools.partial(jax.jit, static_argnames=("num_ring", "num_sector"))
def points_to_scancontext(points: jax.Array, num_ring: int = NUM_RING,
                          num_sector: int = NUM_SECTOR,
                          max_length: float = MAX_LENGTH) -> jax.Array:
    """Polar max-height descriptor from a (padded) point cloud.

    Args:
        points: ``[N, 3]`` float32; invalid/padding points marked by any
            non-finite coordinate (the reference skips NaNs the same way,
            ``scancontext_utils.py:58``).

    Returns:
        ``[num_ring, num_sector]`` float32 descriptor.
    """
    points = points.astype(jnp.float32)
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    x = jnp.where(finite, points[:, 0], 1.0)
    y = jnp.where(finite, points[:, 1], 1.0)
    z = jnp.where(finite, points[:, 2], 0.0)

    r = jnp.sqrt(x * x + y * y)
    theta = jnp.degrees(jnp.arctan2(y, x)) % 360.0

    gap_ring = max_length / num_ring
    gap_sector = 360.0 / num_sector
    ring = jnp.clip((r / gap_ring).astype(jnp.int32), 0, num_ring - 1)
    sector = jnp.clip((theta / gap_sector).astype(jnp.int32), 0,
                      num_sector - 1)
    height = z + HEIGHT_OFFSET

    # route invalid points out of range; 'drop' mode discards them
    ring = jnp.where(finite, ring, num_ring)
    grid = jnp.zeros((num_ring, num_sector), jnp.float32)
    return grid.at[ring, sector].max(height, mode="drop")


def points_to_scancontext_np(points, num_ring: int = NUM_RING,
                             num_sector: int = NUM_SECTOR,
                             max_length: float = MAX_LENGTH):
    """Host (numpy) twin of :func:`points_to_scancontext`.

    Same math in the same float32 precision. A 20x60 max-binning over a
    few thousand points is ~0.5 ms on a robot CPU — cheaper than one
    device dispatch (a full relay round-trip on the tunneled chip, and a
    queue slot on a local one), so the per-keyframe embedding defaults to
    this path (``frontend.scancontext_host_binning``). Bit-parity with
    the device op is pinned in ``tests/test_scancontext.py``.
    """
    import numpy as np
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    finite = np.all(np.isfinite(pts), axis=-1)
    x = np.where(finite, pts[:, 0], np.float32(1.0))
    y = np.where(finite, pts[:, 1], np.float32(1.0))
    z = np.where(finite, pts[:, 2], np.float32(0.0))

    r = np.sqrt(x * x + y * y)
    theta = np.degrees(np.arctan2(y, x)) % np.float32(360.0)

    gap_ring = np.float32(max_length / num_ring)
    gap_sector = np.float32(360.0 / num_sector)
    ring = np.clip((r / gap_ring).astype(np.int32), 0, num_ring - 1)
    sector = np.clip((theta / gap_sector).astype(np.int32), 0,
                     num_sector - 1)
    height = (z + np.float32(HEIGHT_OFFSET)).astype(np.float32)

    grid = np.zeros((num_ring, num_sector), np.float32)
    np.maximum.at(grid, (ring[finite], sector[finite]), height[finite])
    return grid


def ring_key(sc: jax.Array) -> jax.Array:
    """Rotation-invariant ring key: per-ring mean over sectors
    (reference ``scancontext_utils.py:75-76``)."""
    return jnp.mean(sc, axis=-1)


def _shifted_similarities(candidate: jax.Array, query: jax.Array) -> jax.Array:
    """Mean column cosine similarity for every circular shift: ``[S]``.

    Entry s corresponds to ``roll(candidate, s+1, axis=1)`` vs ``query``
    (the reference's loop rolls before comparing)."""
    R, S = candidate.shape
    j = jnp.arange(S)
    s = jnp.arange(S)
    # rolled[s][:, j] = candidate[:, (j - (s+1)) mod S]
    src = (j[None, :] - (s[:, None] + 1)) % S
    rolled = candidate[:, src]                      # [R, S_shift, S_col]
    rolled = jnp.moveaxis(rolled, 0, 1)             # [S_shift, R, S_col]

    q_norm = jnp.linalg.norm(query, axis=0)         # [S_col]
    r_norm = jnp.linalg.norm(rolled, axis=1)        # [S_shift, S_col]
    engaged = (q_norm[None, :] > 0) & (r_norm > 0)

    dots = jnp.einsum("srj,rj->sj", rolled, query)
    cos = jnp.where(engaged,
                    dots / jnp.maximum(r_norm * q_norm[None, :], 1e-30),
                    0.0)
    count = jnp.sum(engaged, axis=1)
    return jnp.where(count > 0, jnp.sum(cos, axis=1) / jnp.maximum(count, 1),
                     0.0)


@jax.jit
def scancontext_distance(candidate: jax.Array,
                         query: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(distance, yaw_diff) for one pair, matching reference
    ``distance_sc`` (``scancontext_utils.py:78-114``)."""
    sims = _shifted_similarities(candidate, query)
    yaw = jnp.argmax(sims) + 1
    return 1.0 - jnp.max(sims), yaw


@jax.jit
def scancontext_distances_batch(candidates: jax.Array,
                                query: jax.Array
                                ) -> tuple[jax.Array, jax.Array]:
    """Batched (distances, yaw_diffs) of ``[B, R, S]`` candidates vs one query."""
    sims = jax.vmap(_shifted_similarities, in_axes=(0, None))(candidates,
                                                              query)
    yaw = jnp.argmax(sims, axis=1) + 1
    return 1.0 - jnp.max(sims, axis=1), yaw
