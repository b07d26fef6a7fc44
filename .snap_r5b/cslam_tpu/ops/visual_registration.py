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


# ---------------------------------------------------------------------------
# Projective (PnP-parity) residual
# ---------------------------------------------------------------------------
#
# The reference verifies with RANSAC-PnP minimizing REPROJECTION error
# (rgbd_handler.cpp:493-554 via rtabmap RegistrationVis; gate
# Vis/MinInliers ll.115-118). The 3D-3D GNC above needs valid depth on
# BOTH sides and weights far points poorly (stereo depth error grows
# quadratically with range). This projective variant is the parity
# option: it consumes the remote keyframe's 3D points and only the LOCAL
# keyframe's 2D pixels, minimizing robust pixel error — the local side's
# depth is used solely to seed the initialization, never in the residual.


def _so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues with a small-angle guard (f32-safe)."""
    theta = jnp.linalg.norm(w)
    k = jnp.where(theta > 1e-8, w / jnp.maximum(theta, 1e-8), jnp.zeros(3))
    K = jnp.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]], jnp.float32)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3, dtype=jnp.float32) + s * K + (1.0 - c) * (K @ K)
    return jnp.where(theta > 1e-8, R,
                     jnp.eye(3, dtype=jnp.float32) + K * theta)


def _gnc_pnp_core(p3d: jax.Array, uv: jax.Array, valid: jax.Array,
                  init_dst3d: jax.Array, fx, fy, cx, cy,
                  inlier_px: float, iters: int
                  ) -> Tuple[jax.Array, jax.Array]:
    """GNC-TLS perspective-n-point: find T with ``project(T p3d[i]) ~ uv[i]``.

    p3d: [N, 3] points in the REMOTE keyframe's camera frame.
    uv: [N, 2] observed pixels in the LOCAL camera.
    valid: [N] correspondence mask.
    init_dst3d: [N, 3] local back-projections (possibly coarse/noisy depth;
        zero rows where depth is missing) — initialization only.

    Returns (T [4,4] = X_local^-1 X_remote, reprojection-inlier count).
    One Gauss-Newton step on the robustly weighted pixel residual per GNC
    graduation round (the same alternation shape as ``_gnc_align_core``);
    everything is fixed-shape fori_loop — jittable and vmappable.
    """
    eps_sq = jnp.float32(inlier_px * inlier_px)
    uv = uv.astype(jnp.float32)

    # init: Kabsch over pairs whose LOCAL depth exists (noisy depth still
    # gives a pose within GN's basin); identity when too few such pairs
    has_dst = (jnp.abs(init_dst3d).sum(-1) > 1e-9).astype(jnp.float32)
    w_init = valid * has_dst
    R_k, t_k = _weighted_kabsch(p3d, init_dst3d, w_init)
    enough = jnp.sum(w_init) >= 3.0
    R0 = jnp.where(enough, R_k, jnp.eye(3, dtype=jnp.float32))
    t0 = jnp.where(enough, t_k, jnp.zeros(3, jnp.float32))

    def reproj_r2(R, t):
        q = p3d @ R.T + t
        z = jnp.maximum(q[:, 2], 1e-3)
        u = fx * q[:, 0] / z + cx
        v = fy * q[:, 1] / z + cy
        r = jnp.stack([u, v], axis=1) - uv
        r2 = jnp.sum(r * r, axis=1)
        # points behind the camera can never be inliers
        return jnp.where(q[:, 2] > 1e-3, r2, 1e12), r, q

    r2, _, _ = reproj_r2(R0, t0)
    max_r2 = jnp.max(jnp.where(valid > 0, jnp.minimum(r2, 1e8), 0.0))
    mu0 = jnp.maximum(eps_sq / jnp.maximum(2.0 * max_r2 - eps_sq, 1e-9),
                      1e-6)

    def body(i, state):
        R, t, mu = state
        r2, r, q = reproj_r2(R, t)
        upper = (mu + 1.0) / mu * eps_sq
        lower = mu / (mu + 1.0) * eps_sq
        mid = jnp.sqrt(eps_sq * mu * (mu + 1.0)
                       / jnp.maximum(r2, 1e-12)) - mu
        w = jnp.where(r2 >= upper, 0.0,
                      jnp.where(r2 <= lower, 1.0, jnp.clip(mid, 0.0, 1.0)))
        w = w * valid
        # one weighted GN step on se(3), tangent order [rotation, trans]
        z = jnp.maximum(q[:, 2], 1e-3)
        zero = jnp.zeros_like(z)
        # d(residual)/dq  [N, 2, 3]
        drdq = jnp.stack([
            jnp.stack([fx / z, zero, -fx * q[:, 0] / (z * z)], axis=1),
            jnp.stack([zero, fy / z, -fy * q[:, 1] / (z * z)], axis=1)],
            axis=1)
        # dq/dxi = [-[q]x | I]  (left-multiplicative update)
        qx, qy, qz = q[:, 0], q[:, 1], q[:, 2]
        skew = jnp.stack([
            jnp.stack([zero, -qz, qy], axis=1),
            jnp.stack([qz, zero, -qx], axis=1),
            jnp.stack([-qy, qx, zero], axis=1)], axis=1)
        J = jnp.concatenate([-jnp.einsum("nij,njk->nik", drdq, skew),
                             drdq], axis=2)          # [N, 2, 6]
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J) \
            + 1e-6 * jnp.eye(6, dtype=jnp.float32)
        g = jnp.einsum("nij,ni->j", Jw, r)
        dx = -jnp.linalg.solve(H, g)
        dR = _so3_exp(dx[:3])
        R_new = dR @ R
        t_new = dR @ t + dx[3:]
        # reject a diverging step (robust cost is only a proxy here)
        r2_new, _, _ = reproj_r2(R_new, t_new)
        cost_old = jnp.sum(w * jnp.minimum(r2, upper))
        cost_new = jnp.sum(w * jnp.minimum(r2_new, upper))
        ok = cost_new <= cost_old
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        return R, t, mu * 1.4

    R, t, _ = jax.lax.fori_loop(0, iters, body, (R0, t0, mu0))
    r2, _, _ = reproj_r2(R, t)
    inliers = jnp.sum((r2 < eps_sq) * valid)
    T = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
    return T, inliers


@functools.partial(jax.jit, static_argnames=("iters",))
@highest_precision
def gnc_pnp_batch(p3d: jax.Array, uv: jax.Array, valid: jax.Array,
                  init_dst3d: jax.Array, fx, fy, cx, cy,
                  inlier_px: float = 4.0, iters: int = 24
                  ) -> Tuple[jax.Array, jax.Array]:
    """Batched GNC-TLS PnP over P candidate pairs in ONE dispatch.

    p3d/init_dst3d: [P, N, 3]; uv: [P, N, 2]; valid: [P, N].
    Returns (T [P,4,4] = X_local^-1 X_remote, reproj inliers [P]).
    """
    return jax.vmap(
        lambda p, u, v, d: _gnc_pnp_core(p, u, v, d, fx, fy, cx, cy,
                                         inlier_px, iters)
    )(p3d, uv, valid, init_dst3d)


def warmup_verification_projective(tiers=(1, 2, 4, 8, 16),
                                   fx: float = 300.0, fy: float = 300.0,
                                   cx: float = 160.0, cy: float = 120.0
                                   ) -> None:
    """Precompile ``gnc_pnp_batch`` pair tiers (see warmup_verification)."""
    for tier in tiers:
        z3 = jnp.zeros((tier, MAX_CORRESPONDENCES, 3), jnp.float32)
        z3 = z3.at[..., 2].set(1.0)
        uv = jnp.zeros((tier, MAX_CORRESPONDENCES, 2), jnp.float32)
        v = jnp.ones((tier, MAX_CORRESPONDENCES), jnp.float32)
        jax.block_until_ready(gnc_pnp_batch(
            z3, uv, v, z3, np.float32(fx), np.float32(fy),
            np.float32(cx), np.float32(cy)))


def verify_keyframe_pairs_projective(pairs, fx: float, fy: float,
                                     cx: float, cy: float,
                                     min_inliers: int = 6,
                                     inlier_px: float = 4.0,
                                     max_hamming: int = 64):
    """Projective-residual verification of MANY candidate pairs, one
    batched dispatch (the reference's RANSAC-PnP decision surface,
    rgbd_handler.cpp:493-554, as a GNC-TLS program).

    ``pairs``: sequence of ``(kp_a_uv, kp3d_a, desc_a, kp3d_b, desc_b)``
    where ``a`` is the LOCAL keyframe (2D pixels + possibly-degraded
    depth back-projections) and ``b`` the remote one (3D points). Returns
    ``(T_ab, success, inliers)`` per pair with the back end's convention
    T_ab = X_a^-1 X_b — for the projective map this IS the estimated
    pose (remote points land in the local camera through it), no inverse.
    """
    P = len(pairs)
    if P == 0:
        return []
    built = []
    for uv_a, a3, ad, b3, bd in pairs:
        uv = np.zeros((MAX_CORRESPONDENCES, 2), np.float32)
        src = np.zeros((MAX_CORRESPONDENCES, 3), np.float32)
        dst = np.zeros((MAX_CORRESPONDENCES, 3), np.float32)
        valid = np.zeros(MAX_CORRESPONDENCES, np.float32)
        m = hamming_match(ad, bd, max_dist=max_hamming)
        if len(m) < max(min_inliers, 3):
            built.append((uv, src, dst, valid, False))
            continue
        n = min(len(m), MAX_CORRESPONDENCES)
        uv[:n] = uv_a[m[:n, 0]]
        src[:n] = b3[m[:n, 1]]          # remote 3D (the residual's source)
        dst[:n] = a3[m[:n, 0]]          # local 3D (init only; zeros OK)
        finite = np.isfinite(src).all(1)
        nonzero = np.abs(src).sum(1) > 1e-9   # remote depth must exist
        valid[:n] = 1.0
        valid *= (finite & nonzero).astype(np.float32)
        built.append((uv, src, dst, valid, True))
    live = [i for i in range(P) if built[i][4]]
    results = [(np.eye(4), False, 0)] * P
    if not live:
        return results
    tier = _pair_tier(len(live))
    uv = np.zeros((tier, MAX_CORRESPONDENCES, 2), np.float32)
    src = np.zeros((tier, MAX_CORRESPONDENCES, 3), np.float32)
    dst = np.zeros((tier, MAX_CORRESPONDENCES, 3), np.float32)
    valid = np.zeros((tier, MAX_CORRESPONDENCES), np.float32)
    for slot, i in enumerate(live):
        uv[slot], src[slot], dst[slot], valid[slot] = built[i][:4]
    Ts, inl = gnc_pnp_batch(src, uv, valid, dst, np.float32(fx),
                            np.float32(fy), np.float32(cx), np.float32(cy),
                            inlier_px=inlier_px)
    Ts = np.asarray(Ts, np.float64)
    inl = np.asarray(inl)
    for slot, i in enumerate(live):
        n_in = int(inl[slot])
        results[i] = (Ts[slot], n_in >= min_inliers, n_in)
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
