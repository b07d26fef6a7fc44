"""SE(3) Lie-group ops: round trips, group laws, batching, autodiff safety."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cslam_tpu.ops import se3


def random_xi(rng, n=None, scale=1.0):
    shape = (6,) if n is None else (n, 6)
    return jnp.asarray(rng.normal(scale=scale, size=shape))


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = random_xi(rng, 32)
    np.testing.assert_allclose(np.asarray(se3.log(se3.exp(xi))),
                               np.asarray(xi), atol=1e-5)


def test_exp_matches_scipy_rotation():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(16, 3))
    R_ours = np.asarray(se3.exp_so3(jnp.asarray(w)))
    R_scipy = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-6)


def test_log_so3_near_pi():
    w = np.array([np.pi - 1e-4, 0.0, 0.0])
    R = Rotation.from_rotvec(w).as_matrix()
    back = np.asarray(se3.log_so3(jnp.asarray(R)))
    np.testing.assert_allclose(back, w, atol=1e-4)


def test_log_so3_identity():
    np.testing.assert_allclose(np.asarray(se3.log_so3(jnp.eye(3))),
                               np.zeros(3), atol=1e-7)


def test_inverse_and_compose():
    rng = np.random.default_rng(2)
    T = se3.exp(random_xi(rng, 8))
    eye = np.broadcast_to(np.eye(4), (8, 4, 4))
    np.testing.assert_allclose(np.asarray(se3.compose(T, se3.inverse(T))),
                               eye, atol=1e-5)


def test_between_consistency():
    rng = np.random.default_rng(3)
    A = se3.exp(random_xi(rng))
    B = se3.exp(random_xi(rng))
    Z = se3.between(A, B)
    np.testing.assert_allclose(np.asarray(A @ Z), np.asarray(B), atol=1e-5)


def test_retract_small_step():
    rng = np.random.default_rng(4)
    T = se3.exp(random_xi(rng))
    xi = random_xi(rng, scale=1e-3)
    T2 = se3.retract(T, xi)
    np.testing.assert_allclose(np.asarray(se3.log(se3.between(T, T2))),
                               np.asarray(xi), atol=1e-6)


def test_jacfwd_of_residual_is_finite():
    """The PGO solver differentiates through between/log — the chart must be
    smooth at xi = 0 (Taylor guards)."""
    rng = np.random.default_rng(5)
    Ti = se3.exp(random_xi(rng))
    Tj = se3.exp(random_xi(rng))
    Z = se3.between(Ti, Tj)  # zero-residual measurement

    def residual(xi_pair):
        xi_i, xi_j = xi_pair[:6], xi_pair[6:]
        return se3.log(se3.between(Z, se3.between(se3.retract(Ti, xi_i),
                                                  se3.retract(Tj, xi_j))))

    J = jax.jacfwd(residual)(jnp.zeros(12))
    assert np.all(np.isfinite(np.asarray(J)))
    # at zero residual, d r / d xi_j = identity (right perturbation)
    np.testing.assert_allclose(np.asarray(J[:, 6:]), np.eye(6), atol=1e-4)


def test_normalize_restores_orthonormality():
    rng = np.random.default_rng(6)
    T = np.array(se3.exp(random_xi(rng)))
    T[:3, :3] += rng.normal(scale=1e-3, size=(3, 3))
    Tn = np.asarray(se3.normalize(jnp.asarray(T)))
    R = Tn[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)


class TestAnalyticDerivatives:

    def test_jr_inv_matches_jacfwd(self):
        """Log(Exp(xi) Exp(eps)) ~= xi + Jr_inv(xi) eps across small and
        near-pi rotations."""
        rng = np.random.default_rng(13)
        for scale in (1e-7, 1e-3, 0.3, 1.5, 2.9):
            w = rng.normal(size=3)
            w = w / np.linalg.norm(w) * scale
            v = rng.normal(size=3) * 3
            xi = jnp.asarray(np.concatenate([w, v]), jnp.float32)
            J_num = jax.jacfwd(
                lambda e: se3.log(se3.exp(xi) @ se3.exp(e)))(
                    jnp.zeros(6, jnp.float32))
            np.testing.assert_allclose(np.asarray(se3.se3_jr_inv(xi)),
                                       np.asarray(J_num),
                                       atol=3e-4, rtol=3e-4)

    def test_adjoint_conjugation(self):
        """T Exp(xi) T^-1 = Exp(Ad(T) xi)."""
        rng = np.random.default_rng(14)
        for _ in range(5):
            T = se3.exp(jnp.asarray(rng.normal(size=6) * 0.8, jnp.float32))
            xi = jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32)
            lhs = T @ se3.exp(xi) @ se3.inverse(T)
            rhs = se3.exp((se3.adjoint(T) @ xi[:, None])[:, 0])
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                       atol=1e-5)
