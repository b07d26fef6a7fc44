"""Batched SE(3) Lie-group operations in JAX.

From-scratch replacement for the GTSAM ``Pose3`` machinery the reference
back end delegates to (``src/back_end/decentralized_pgo.cpp``,
``src/back_end/gtsam_utils.cpp``). Everything is expressed over ``[..., 4, 4]``
homogeneous matrices and ``[..., 6]`` tangent vectors so it vmaps/shards
cleanly on TPU.

Tangent convention matches GTSAM: ``xi = [omega(3), v(3)]`` — rotation first,
then translation — which is also the ordering of the reference's 6-sigma
diagonal noise models (rotation std then translation std,
``decentralized_pgo.cpp:64-70``).

All routines are Taylor-guarded around the identity so they are safe under
``jax.jacfwd`` (the PGO solver differentiates ``between``/``log`` directly
instead of hand-coding Jacobians).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: ``[..., 3] -> [..., 3, 3]`` skew matrices."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zero, -wz, wy], axis=-1),
        jnp.stack([wz, zero, -wx], axis=-1),
        jnp.stack([-wy, wx, zero], axis=-1),
    ], axis=-2)


# f32 cancellation guard: direct formulas like (t - sin t)/t^3 lose most of
# their bits for t well above the usual 1e-4 guard (measured 4.7e-2 relative
# error at t = 1e-3, the typical odometry-edge magnitude). All ratios below
# switch to a 3-4 term Taylor branch for theta < 0.5, where the series
# truncation error (<1e-10) is far below f32 eps, and the direct formula's
# cancellation at theta >= 0.5 is down to ~1e-6 absolute.
_TAYLOR_SQ = 0.25


def _sinc_coeffs(theta_sq: jax.Array):
    """Cancellation-safe (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3)."""
    theta = jnp.sqrt(jnp.maximum(theta_sq, _SMALL ** 2))
    small = theta_sq < _SMALL
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    # (1 - cos t)/t^2 = 0.5 (sin(t/2)/(t/2))^2 — exact, no subtraction
    half_sinc = jnp.where(small, 1.0 - theta_sq / 24.0,
                          jnp.sin(0.5 * theta) / (0.5 * theta))
    b = 0.5 * half_sinc * half_sinc
    t4 = theta_sq * theta_sq
    c = jnp.where(theta_sq < _TAYLOR_SQ,
                  1.0 / 6.0 - theta_sq / 120.0 + t4 / 5040.0
                  - t4 * theta_sq / 362880.0,
                  (theta - jnp.sin(theta))
                  / jnp.maximum(theta_sq * theta, _SMALL ** 3))
    return a, b, c


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues: ``[..., 3] -> [..., 3, 3]`` rotation matrices."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def log_so3(R: jax.Array) -> jax.Array:
    """Inverse Rodrigues: ``[..., 3, 3] -> [..., 3]``.

    Uses the quaternion route, which stays accurate near pi where the
    classic trace formula degrades.
    """
    # rotation matrix -> quaternion (w, x, y, z), Shepperd-style but branch-
    # free: build all four candidates and pick the best-conditioned one.
    m = R
    t0 = 1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    t1 = 1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2]
    t2 = 1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2]
    t3 = 1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2]

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q0 = jnp.stack([safe_sqrt(t0),
                    (m[..., 2, 1] - m[..., 1, 2]) / safe_sqrt(t0),
                    (m[..., 0, 2] - m[..., 2, 0]) / safe_sqrt(t0),
                    (m[..., 1, 0] - m[..., 0, 1]) / safe_sqrt(t0)], axis=-1)
    q1 = jnp.stack([(m[..., 2, 1] - m[..., 1, 2]) / safe_sqrt(t1),
                    safe_sqrt(t1),
                    (m[..., 0, 1] + m[..., 1, 0]) / safe_sqrt(t1),
                    (m[..., 0, 2] + m[..., 2, 0]) / safe_sqrt(t1)], axis=-1)
    q2 = jnp.stack([(m[..., 0, 2] - m[..., 2, 0]) / safe_sqrt(t2),
                    (m[..., 0, 1] + m[..., 1, 0]) / safe_sqrt(t2),
                    safe_sqrt(t2),
                    (m[..., 1, 2] + m[..., 2, 1]) / safe_sqrt(t2)], axis=-1)
    q3 = jnp.stack([(m[..., 1, 0] - m[..., 0, 1]) / safe_sqrt(t3),
                    (m[..., 0, 2] + m[..., 2, 0]) / safe_sqrt(t3),
                    (m[..., 1, 2] + m[..., 2, 1]) / safe_sqrt(t3),
                    safe_sqrt(t3)], axis=-1)
    ts = jnp.stack([t0, t1, t2, t3], axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4 candidates, 4]
    best = jnp.argmax(ts, axis=-1)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = 0.5 * q
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # ensure w >= 0 for the shortest arc
    q = q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))

    qw = jnp.clip(q[..., 0], -1.0, 1.0)
    qv = q[..., 1:]
    # guarded norm: max() zeroes the tangent at qv = 0, so jacfwd through a
    # zero-residual log (the common case in PGO) stays finite
    qv_sq = jnp.sum(qv * qv, axis=-1)
    sin_half = jnp.sqrt(jnp.maximum(qv_sq, 1e-24))
    half = jnp.arctan2(sin_half, qw)
    scale = jnp.where(sin_half < _SMALL,
                      2.0 + 2.0 * half * half / 3.0,
                      2.0 * half / jnp.maximum(sin_half, _SMALL))
    return qv * scale[..., None]


def exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential: ``[..., 6] (omega, v) -> [..., 4, 4]``."""
    w, v = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * (W @ W)
    V = eye + b[..., None, None] * W + c[..., None, None] * (W @ W)
    t = (V @ v[..., None])[..., 0]
    return _rt_to_matrix(R, t)


def log(T: jax.Array) -> jax.Array:
    """SE(3) logarithm: ``[..., 4, 4] -> [..., 6] (omega, v)``."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    _, b, c = _sinc_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * (W @ W)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def _rt_to_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0]), batch + (1, 4))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (no linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _rt_to_matrix(Rt, -(Rt @ t[..., None])[..., 0])


def compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return A @ B


def between(A: jax.Array, B: jax.Array) -> jax.Array:
    """Relative transform A^-1 B (GTSAM ``between``)."""
    return inverse(A) @ B


def retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Right-multiplicative retraction: ``T * Exp(xi)``."""
    return T @ exp(xi)


def adjoint(T: jax.Array) -> jax.Array:
    """SE(3) adjoint as a ``[..., 6, 6]`` matrix in (omega, v) ordering:
    ``Ad(T) [w; u] = [R w; t x (R w) + R u]``."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, zero], axis=-1)
    bottom = jnp.concatenate([hat(t) @ R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def _so3_jl_inv(w: jax.Array) -> jax.Array:
    """Inverse LEFT Jacobian of SO(3): ``I - W/2 + e W^2`` with
    ``e = 1/theta^2 - cot(theta/2)/(2 theta)`` (half-angle form stays finite
    through theta = pi)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _SMALL ** 2))
    half = 0.5 * theta
    t4 = theta_sq * theta_sq
    # the direct form subtracts two ~1/theta^2 terms — catastrophic in f32
    # below theta ~ 0.1, so the Taylor branch is wide (see _TAYLOR_SQ)
    e = jnp.where(
        theta_sq < _TAYLOR_SQ,
        1.0 / 12.0 + theta_sq / 720.0 + t4 / 30240.0
        + t4 * theta_sq / 1209600.0,
        1.0 / jnp.maximum(theta_sq, _SMALL ** 2)
        - jnp.cos(half) / jnp.maximum(2.0 * theta * jnp.sin(half),
                                      _SMALL ** 2))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    return eye - 0.5 * W + e[..., None, None] * (W @ W)


def _se3_Q(w: jax.Array, v: jax.Array) -> jax.Array:
    """Coupling block of the SE(3) LEFT Jacobian (Barfoot eq. 7.86): the
    translation-rows / rotation-columns block of ``Jl([w, v])``."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _SMALL ** 2))
    small = theta_sq < _TAYLOR_SQ
    t3 = jnp.maximum(theta_sq * theta, _SMALL ** 3)
    t4 = jnp.maximum(theta_sq * theta_sq, _SMALL ** 4)
    t5 = jnp.maximum(t4 * theta, _SMALL ** 5)
    ts4 = theta_sq * theta_sq
    ts6 = ts4 * theta_sq
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    # wide Taylor branches: the direct ratios cancel catastrophically in f32
    # up to theta ~ 1e-2 (see _TAYLOR_SQ note above)
    c1 = jnp.where(small,
                   1.0 / 6.0 - theta_sq / 120.0 + ts4 / 5040.0
                   - ts6 / 362880.0,
                   (theta - sin_t) / t3)
    c2 = jnp.where(small,
                   1.0 / 24.0 - theta_sq / 720.0 + ts4 / 40320.0
                   - ts6 / 3628800.0,
                   (0.5 * theta_sq + cos_t - 1.0) / t4)
    # (theta - sin t - t^3/6)/t^5
    c5 = jnp.where(small,
                   -1.0 / 120.0 + theta_sq / 5040.0 - ts4 / 362880.0
                   + ts6 / 39916800.0,
                   (theta - sin_t - theta_sq * theta / 6.0) / t5)
    c4 = 0.5 * (c2 + 3.0 * c5)
    W, V = hat(w), hat(v)
    WV, VW = W @ V, V @ W
    WVW = WV @ W
    Q = (0.5 * V
         + c1[..., None, None] * (WV + VW + WVW)
         + c2[..., None, None] * (W @ WV + VW @ W - 3.0 * WVW)
         + c4[..., None, None] * (WVW @ W + W @ WVW))
    return Q


def se3_jr_inv(xi: jax.Array) -> jax.Array:
    """Inverse RIGHT Jacobian of SE(3) as ``[..., 6, 6]`` (omega, v order):

        Log(Exp(xi) Exp(eps)) ~= xi + Jr_inv(xi) eps.

    Computed as ``Jl_inv(-xi)`` with the block structure
    ``[[Jl_inv, 0], [-Jl_inv Q Jl_inv, Jl_inv]]``. Verified against
    ``jax.jacfwd`` of the defining relation in tests/test_se3.py — this is
    the hand-coded replacement for the jacfwd linearization in the PGO
    solver's hot loop.
    """
    w, v = -xi[..., :3], -xi[..., 3:]
    Jinv = _so3_jl_inv(w)
    Q = _se3_Q(w, v)
    corner = -Jinv @ Q @ Jinv
    zero = jnp.zeros_like(Jinv)
    top = jnp.concatenate([Jinv, zero], axis=-1)
    bottom = jnp.concatenate([corner, Jinv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def normalize(T: jax.Array) -> jax.Array:
    """Re-orthonormalize the rotation block (drift control after many
    retractions in float32) via symmetric orthogonalization."""
    R = T[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate([jnp.ones(det.shape + (2,)), det[..., None]],
                          axis=-1)
    Rn = (u * fix[..., None, :]) @ vt
    return _rt_to_matrix(Rn, T[..., :3, 3])
