"""SE(3)/SO(3) algebra tests.

Mirrors the reference test strategy of
okvis_kinematics/test/TestTransformation.cpp: random transforms, check
inverse, composition, oplus consistency, and Jacobian identities against
numeric differentiation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation


def random_transform(key):
    k1, k2 = jax.random.split(key)
    r = jax.random.normal(k1, (3,))
    q = so3.quat_normalize(jax.random.normal(k2, (4,)))
    return Transformation(r=r, q=q)


@pytest.fixture
def keys():
    return jax.random.split(jax.random.PRNGKey(42), 16)


def test_quat_matrix_roundtrip(keys):
    for k in keys:
        q = so3.quat_normalize(jax.random.normal(k, (4,)))
        C = so3.quat_to_matrix(q)
        q2 = so3.matrix_to_quat(C)
        # up to sign
        assert min(
            float(jnp.linalg.norm(q - q2)), float(jnp.linalg.norm(q + q2))
        ) < 1e-9
        np.testing.assert_allclose(C @ C.T, np.eye(3), atol=1e-12)
        assert float(jnp.linalg.det(C)) == pytest.approx(1.0, abs=1e-12)


def test_rotate_matches_matrix(keys):
    for k in keys:
        q = so3.quat_normalize(jax.random.normal(k, (4,)))
        v = jax.random.normal(jax.random.fold_in(k, 1), (3,))
        np.testing.assert_allclose(
            so3.rotate(q, v), so3.quat_to_matrix(q) @ v, atol=1e-12
        )


def test_quat_multiply_matches_matrix_product(keys):
    q1 = so3.quat_normalize(jax.random.normal(keys[0], (4,)))
    q2 = so3.quat_normalize(jax.random.normal(keys[1], (4,)))
    C = so3.quat_to_matrix(so3.quat_multiply(q1, q2))
    np.testing.assert_allclose(
        C, so3.quat_to_matrix(q1) @ so3.quat_to_matrix(q2), atol=1e-12
    )


def test_plus_oplus_matrices(keys):
    q1 = so3.quat_normalize(jax.random.normal(keys[0], (4,)))
    q2 = so3.quat_normalize(jax.random.normal(keys[1], (4,)))
    prod = so3.quat_multiply(q1, q2)
    np.testing.assert_allclose(so3.quat_plus(q1) @ q2, prod, atol=1e-12)
    np.testing.assert_allclose(so3.quat_oplus(q2) @ q1, prod, atol=1e-12)


def test_exp_log_roundtrip(keys):
    for k in keys:
        a = jax.random.normal(k, (3,)) * 0.9
        q = so3.delta_q(a)
        np.testing.assert_allclose(so3.quat_log(q), a, atol=1e-9)


def test_exp_log_small_angle():
    a = jnp.array([1e-10, -2e-10, 3e-11])
    np.testing.assert_allclose(so3.quat_log(so3.delta_q(a)), a, atol=1e-15)


def test_inverse_composition(keys):
    for k in keys[:8]:
        T = random_transform(k)
        I = T @ T.inverse()
        np.testing.assert_allclose(I.r, np.zeros(3), atol=1e-12)
        np.testing.assert_allclose(
            np.abs(np.asarray(I.q)), [0, 0, 0, 1], atol=1e-12
        )


def test_compose_matches_matrix(keys):
    T1 = random_transform(keys[0])
    T2 = random_transform(keys[1])
    np.testing.assert_allclose(
        (T1 @ T2).matrix(), T1.matrix() @ T2.matrix(), atol=1e-12
    )


def test_apply_homogeneous(keys):
    T = random_transform(keys[0])
    p = jax.random.normal(keys[1], (3,))
    hp = jnp.concatenate([p * 2.0, jnp.array([2.0])])
    out = T.apply_homogeneous(hp)
    np.testing.assert_allclose(out[:3] / out[3], T.apply(p), atol=1e-12)


def test_oplus_ominus_roundtrip(keys):
    T = random_transform(keys[0])
    delta = jax.random.normal(keys[1], (6,)) * 0.3
    T2 = T.oplus(delta)
    np.testing.assert_allclose(T2.ominus(T), delta, atol=1e-9)


def test_oplus_zero_is_identity(keys):
    T = random_transform(keys[0])
    T2 = T.oplus(jnp.zeros(6))
    np.testing.assert_allclose(T2.r, T.r, atol=1e-15)
    np.testing.assert_allclose(T2.q, T.q, atol=1e-15)


def test_right_jacobian_identity(keys):
    """exp(phi + J_r(phi)^-1 would be exact; first-order check instead:
    exp(phi) exp(J_r dphi) ~ exp(phi + dphi)."""
    phi = jax.random.normal(keys[0], (3,))
    dphi = jax.random.normal(keys[1], (3,)) * 1e-6
    Jr = so3.right_jacobian(phi)
    lhs = so3.quat_multiply(so3.delta_q(phi), so3.delta_q(Jr @ dphi))
    rhs = so3.delta_q(phi + dphi)
    assert float(jnp.linalg.norm(lhs - rhs)) < 1e-12


def test_right_jacobian_small_angle():
    Jr = so3.right_jacobian(jnp.zeros(3))
    np.testing.assert_allclose(Jr, np.eye(3), atol=1e-12)
    # Taylor branch agrees with the closed form near the threshold
    phi = np.full((3,), 1e-4 / np.sqrt(3))
    angle = np.linalg.norm(phi)
    px = np.asarray(so3.cross_mx(jnp.asarray(phi)))
    exact = (
        np.eye(3)
        - (1 - np.cos(angle)) / angle**2 * px
        + (angle - np.sin(angle)) / angle**3 * (px @ px)
    )
    np.testing.assert_allclose(so3.right_jacobian(jnp.asarray(phi)), exact, atol=1e-12)


def test_batched_ops(keys):
    q = so3.quat_normalize(jax.random.normal(keys[0], (5, 7, 4)))
    v = jax.random.normal(keys[1], (5, 7, 3))
    out = so3.rotate(q, v)
    assert out.shape == (5, 7, 3)
    ref = jnp.einsum("...ij,...j->...i", so3.quat_to_matrix(q), v)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_oplus_jacobian_vs_numeric(keys):
    """d(T ⊞ delta)/d delta at 0 via autodiff equals numeric diff."""
    T = random_transform(keys[0])

    def params(delta):
        return T.oplus(delta).parameters()

    J = jax.jacfwd(params)(jnp.zeros(6))
    eps = 1e-7
    for i in range(6):
        d = jnp.zeros(6).at[i].set(eps)
        num = (params(d) - params(-d)) / (2 * eps)
        np.testing.assert_allclose(J[:, i], num, atol=1e-6)
