"""Visual geometric verification: robust alignment of matched 3D keypoints.

Replaces the reference's rtabmap ``RegistrationVis::computeTransformation``
(RANSAC PnP, ``src/front_end/rgbd_handler.cpp:433-554``, gated by
``Vis/MinInliers``): candidate loop closures are verified by matching binary
descriptors (host C++, ``cslam_tpu.native``) and robustly aligning the
matched keypoints' 3D positions — RGB-D and stereo front ends both give
metric 3D per keypoint, so 3D-3D alignment replaces 2D-3D PnP.

The robust core is graduated non-convexity (TLS) over the correspondence
residuals around the closed-form weighted Kabsch solve — a batched,
fixed-shape, jittable program (same family as ``ops.registration`` but with
known correspondences, so no ICP loop is needed).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.native import hamming_match
from cslam_tpu.ops import highest_precision
from cslam_tpu.ops.registration import _weighted_kabsch

MAX_CORRESPONDENCES = 512


def _gnc_align_core(src: jax.Array, dst: jax.Array, valid: jax.Array,
                    inlier_dist: float, iters: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """GNC-TLS rigid alignment of corresponded points src[i] <-> dst[i].

    Returns (T [4,4] mapping src->dst, inlier count). Pure traced body —
    jitted below both standalone and vmapped over a pair batch.
    """
    eps_sq = jnp.float32(inlier_dist * inlier_dist)

    def residual_sq(R, t):
        moved = src @ R.T + t
        return jnp.sum((moved - dst) ** 2, axis=-1)

    R0, t0 = _weighted_kabsch(src, dst, valid)
    r2 = residual_sq(R0, t0)
    max_r2 = jnp.max(jnp.where(valid > 0, r2, 0.0))
    mu0 = jnp.maximum(eps_sq / jnp.maximum(2.0 * max_r2 - eps_sq, 1e-9), 1e-6)

    def body(i, state):
        R, t, mu = state
        r2 = residual_sq(R, t)
        upper = (mu + 1.0) / mu * eps_sq
        lower = mu / (mu + 1.0) * eps_sq
        mid = jnp.sqrt(eps_sq * mu * (mu + 1.0)
                       / jnp.maximum(r2, 1e-12)) - mu
        w = jnp.where(r2 >= upper, 0.0,
                      jnp.where(r2 <= lower, 1.0, jnp.clip(mid, 0.0, 1.0)))
        w = w * valid
        R, t = _weighted_kabsch(src, dst, w)
        return R, t, mu * 1.4

    R, t, _ = jax.lax.fori_loop(0, iters, body, (R0, t0, mu0))
    r2 = residual_sq(R, t)
    inliers = jnp.sum((r2 < eps_sq) * valid)
    T = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
    return T, inliers


@functools.partial(jax.jit, static_argnames=("iters",))
@highest_precision
def gnc_align(src: jax.Array, dst: jax.Array, valid: jax.Array,
              inlier_dist: float, iters: int = 12
              ) -> Tuple[jax.Array, jax.Array]:
    """Single-pair GNC-TLS alignment (see ``_gnc_align_core``)."""
    return _gnc_align_core(src, dst, valid, inlier_dist, iters)


@functools.partial(jax.jit, static_argnames=("iters",))
@highest_precision
def gnc_align_batch(src: jax.Array, dst: jax.Array, valid: jax.Array,
                    inlier_dist: float, iters: int = 12
                    ) -> Tuple[jax.Array, jax.Array]:
    """Batched GNC-TLS alignment over P candidate pairs in ONE dispatch.

    src/dst: [P, N, 3]; valid: [P, N]. Returns (T [P,4,4], inliers [P]).
    One keyframe message can request verification against many local
    keyframes (reference loops over them one RANSAC-PnP call at a time,
    rgbd_handler.cpp:493-554); on the relay-attached TPU each dispatch
    costs ~30 ms RTT, so batching P pairs into one vmapped solve is a
    P-fold latency win on the verification plane.
    """
    return jax.vmap(
        lambda s, d, v: _gnc_align_core(s, d, v, inlier_dist, iters)
    )(src, dst, valid)


def _pair_tier(p: int) -> int:
    """Pad batch size to a power-of-two tier so XLA compiles once per tier."""
    tier = 1
    while tier < p:
        tier *= 2
    return tier


def warmup_verification(tiers=(1, 2, 4, 8, 16),
                        inlier_dist: float = 0.3) -> None:
    """Precompile ``gnc_align_batch`` for the given pair tiers.

    The batch-16 tier was observed to take >1 min to compile on the remote
    TPU compile service; warming at startup (ideally with jax's persistent
    compilation cache enabled) keeps the verification plane responsive —
    same pattern as ``DecentralizedPGO.warmup()`` for the PGO tiers.
    """
    for tier in tiers:
        z3 = jnp.zeros((tier, MAX_CORRESPONDENCES, 3), jnp.float32)
        v = jnp.ones((tier, MAX_CORRESPONDENCES), jnp.float32)
        jax.block_until_ready(gnc_align_batch(z3, z3, v, inlier_dist))


def _build_correspondences(kp3d_a: np.ndarray, desc_a: np.ndarray,
                           kp3d_b: np.ndarray, desc_b: np.ndarray,
                           min_inliers: int, max_hamming: int
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Host matching + fixed-shape padding for one candidate pair.

    Returns (src [N,3], dst [N,3], valid [N], enough) — ``enough`` is False
    when descriptor matching alone cannot reach ``min_inliers`` (no device
    work needed for that pair).
    """
    src = np.zeros((MAX_CORRESPONDENCES, 3), np.float32)
    dst = np.zeros((MAX_CORRESPONDENCES, 3), np.float32)
    valid = np.zeros(MAX_CORRESPONDENCES, np.float32)
    pairs = hamming_match(desc_a, desc_b, max_dist=max_hamming)
    if len(pairs) < max(min_inliers, 3):
        return src, dst, valid, False
    n = min(len(pairs), MAX_CORRESPONDENCES)
    src[:n] = kp3d_a[pairs[:n, 0]]
    dst[:n] = kp3d_b[pairs[:n, 1]]
    valid[:n] = 1.0
    # drop correspondences with invalid depth (zeros / non-finite)
    finite = np.isfinite(src).all(1) & np.isfinite(dst).all(1)
    nonzero = (np.abs(src).sum(1) > 1e-9) & (np.abs(dst).sum(1) > 1e-9)
    valid *= (finite & nonzero).astype(np.float32)
    return src, dst, valid, True


def verify_keyframe_pair(kp3d_a: np.ndarray, desc_a: np.ndarray,
                         kp3d_b: np.ndarray, desc_b: np.ndarray,
                         min_inliers: int = 6, inlier_dist: float = 0.3,
                         max_hamming: int = 64
                         ) -> Tuple[np.ndarray, bool, int]:
    """Full verification: descriptor matching + robust 3D alignment.

    Returns (T mapping a-frame points into b-frame, success, inliers) —
    mirroring the reference's success gate ``Vis/MinInliers``
    (rgbd_handler.cpp:115-118: pnp_min_inliers).
    """
    return verify_keyframe_pairs(
        [(kp3d_a, desc_a, kp3d_b, desc_b)], min_inliers=min_inliers,
        inlier_dist=inlier_dist, max_hamming=max_hamming)[0]


def verify_keyframe_pairs(pairs_abab,
                          min_inliers: int = 6, inlier_dist: float = 0.3,
                          max_hamming: int = 64):
    """Verify MANY candidate pairs with one batched device dispatch.

    ``pairs_abab``: sequence of ``(kp3d_a, desc_a, kp3d_b, desc_b)``.
    Returns a list of ``(T_ab, success, inliers)`` in input order. The
    reference verifies candidates one RANSAC call at a time
    (rgbd_handler.cpp:493-554); here descriptor matching stays on the host
    (C++ hamming), alignment of all pairs runs as one vmapped GNC solve
    padded to a power-of-two pair tier.
    """
    P = len(pairs_abab)
    if P == 0:
        return []
    built = [_build_correspondences(a3, ad, b3, bd, min_inliers, max_hamming)
             for a3, ad, b3, bd in pairs_abab]
    enough = [b[3] for b in built]
    live = [i for i in range(P) if enough[i]]
    results = [(np.eye(4), False, 0)] * P
    if not live:
        return results
    tier = _pair_tier(len(live))
    src = np.zeros((tier, MAX_CORRESPONDENCES, 3), np.float32)
    dst = np.zeros((tier, MAX_CORRESPONDENCES, 3), np.float32)
    valid = np.zeros((tier, MAX_CORRESPONDENCES), np.float32)
    for slot, i in enumerate(live):
        src[slot], dst[slot], valid[slot] = built[i][:3]
    Ts, inliers = gnc_align_batch(jnp.asarray(src), jnp.asarray(dst),
                                  jnp.asarray(valid), inlier_dist)
    Ts = np.asarray(Ts, np.float64)
    inliers = np.asarray(inliers)
    for slot, i in enumerate(live):
        n_in = int(inliers[slot])
        # Ts[slot] maps a->b in point coordinates: p_b = R p_a + t. As a pose
        # transform (X_a^-1 X_b) convention used by the back end, the relative
        # pose of b's camera in a's frame is the inverse of the point map.
        T_ab = np.linalg.inv(Ts[slot])
        results[i] = (T_ab, n_in >= min_inliers, n_in)
    return results


def project_to_3d(kp_xy: np.ndarray, depth: np.ndarray, fx: float, fy: float,
                  cx: float, cy: float) -> np.ndarray:
    """Back-project pixel keypoints through a depth image (RGB-D path).

    Returns [N, 3] camera-frame points; zero depth yields zero points
    (filtered downstream).
    """
    if len(kp_xy) == 0:
        return np.zeros((0, 3), np.float32)
    z = depth[kp_xy[:, 1], kp_xy[:, 0]].astype(np.float32)
    x = (kp_xy[:, 0].astype(np.float32) - cx) * z / fx
    y = (kp_xy[:, 1].astype(np.float32) - cy) * z / fy
    return np.stack([x, y, z], axis=1)
