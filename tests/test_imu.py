"""IMU preintegration tests.

Mirrors the reference's numerical strategy (okvis_ceres/test/TestImuError.cpp):
synthesise an analytic trajectory, generate *exact* IMU measurements from its
derivatives, and check that preintegration/propagation reproduces the ground
truth; plus covariance sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.imu import (
    ImuParameters,
    preintegrate,
    propagate_state,
    init_pose_from_accel,
)
from okvis2_tpu.imu.preintegration import correct_for_bias


PARAMS = ImuParameters.create(g=9.81)
AXIS = np.array([1.0, 2.0, 0.5])
AXIS /= np.linalg.norm(AXIS)


def theta(t):
    return 0.7 * jnp.sin(2.0 * t) + 0.3 * t


def pos(t):
    return jnp.stack(
        [jnp.sin(1.3 * t), 0.5 * jnp.cos(2.1 * t), 0.2 * jnp.sin(0.7 * t) + 0.1 * t]
    )


def true_state(t):
    t = jnp.asarray(t, dtype=jnp.float64)
    u = jnp.asarray(AXIS)
    q = so3.delta_q(u * theta(t))
    p = pos(t)
    v = jax.jacfwd(pos)(t)
    return Transformation(r=p, q=q), v


def imu_at(t):
    """Exact gyro/accel for the analytic trajectory."""
    t = jnp.asarray(t, dtype=jnp.float64)
    u = jnp.asarray(AXIS)
    w_S = u * jax.grad(theta)(t)  # fixed-axis rotation: body rate = u*thetadot
    a_W = jax.jacfwd(jax.jacfwd(pos))(t)
    C_WS = so3.quat_to_matrix(so3.delta_q(u * theta(t)))
    a_S = C_WS.T @ (a_W - PARAMS.gravity_w)
    return w_S, a_S


def make_segment(t0, t1, n):
    ts = np.linspace(t0, t1, n + 1)
    w, a = jax.vmap(imu_at)(jnp.asarray(ts))
    w = np.asarray(w)
    a = np.asarray(a)
    w_avg = 0.5 * (w[:-1] + w[1:])
    a_avg = 0.5 * (a[:-1] + a[1:])
    dt = np.diff(ts)
    return jnp.asarray(w_avg), jnp.asarray(a_avg), jnp.asarray(dt)


def test_propagation_matches_ground_truth():
    t0, t1 = 0.0, 1.0
    w, a, dt = make_segment(t0, t1, 1000)
    T0, v0 = true_state(t0)
    T1_gt, v1_gt = true_state(t1)
    sb0 = jnp.concatenate([v0, jnp.zeros(6)])
    T1, sb1 = propagate_state(PARAMS, T0, sb0, w, a, dt)
    np.testing.assert_allclose(T1.r, T1_gt.r, atol=2e-5)
    np.testing.assert_allclose(sb1[:3], v1_gt, atol=2e-5)
    dq = so3.quat_multiply(so3.quat_conjugate(T1_gt.q), T1.q)
    assert float(jnp.linalg.norm(so3.quat_log(dq))) < 1e-5


def test_masked_padding_is_noop():
    w, a, dt = make_segment(0.0, 0.5, 100)
    pad = 28
    wp = jnp.concatenate([w, jnp.zeros((pad, 3))])
    ap = jnp.concatenate([a, jnp.zeros((pad, 3))])
    dtp = jnp.concatenate([dt, jnp.zeros(pad)])
    bg = jnp.zeros(3)
    ba = jnp.zeros(3)
    p1 = preintegrate(PARAMS, w, a, dt, bg, ba)
    p2 = preintegrate(PARAMS, wp, ap, dtp, bg, ba)
    np.testing.assert_allclose(p1.delta_q, p2.delta_q, atol=1e-12)
    np.testing.assert_allclose(p1.acc_dint, p2.acc_dint, atol=1e-12)
    np.testing.assert_allclose(p1.covariance, p2.covariance, atol=1e-14)


def test_bias_correction_first_order():
    """Preintegrating at a slightly wrong bias and correcting to first order
    should approximate preintegrating at the true bias."""
    w, a, dt = make_segment(0.0, 1.0, 500)
    bg_true = jnp.array([0.004, -0.002, 0.003])
    ba_true = jnp.array([0.03, -0.02, 0.01])
    # exact preintegration at the true bias
    p_exact = preintegrate(PARAMS, w, a, dt, bg_true, ba_true)
    # preintegrate at zero bias, correct to first order
    p_lin = preintegrate(PARAMS, w, a, dt, jnp.zeros(3), jnp.zeros(3))
    dq_c, dv_c, dp_c = correct_for_bias(p_lin, bg_true, ba_true)
    np.testing.assert_allclose(dv_c, p_exact.acc_int, atol=2e-4)
    np.testing.assert_allclose(dp_c, p_exact.acc_dint, atol=2e-4)
    dq_err = so3.quat_multiply(so3.quat_conjugate(p_exact.delta_q), dq_c)
    assert float(jnp.linalg.norm(so3.quat_log(dq_err))) < 1e-4


def test_covariance_psd_and_scaling():
    w, a, dt = make_segment(0.0, 1.0, 200)
    p = preintegrate(PARAMS, w, a, dt, jnp.zeros(3), jnp.zeros(3))
    ev = np.linalg.eigvalsh(np.asarray(p.covariance))
    assert ev.min() > 0.0
    # doubling the duration should grow the covariance
    w2, a2, dt2 = make_segment(0.0, 2.0, 400)
    p2 = preintegrate(PARAMS, w2, a2, dt2, jnp.zeros(3), jnp.zeros(3))
    assert np.trace(np.asarray(p2.covariance)) > np.trace(np.asarray(p.covariance))
    # whitening: sqrt_info^T sqrt_info ~= inv(P)
    si = np.asarray(p.sqrt_info)
    info = np.linalg.inv(np.asarray(p.covariance))
    np.testing.assert_allclose(si.T @ si, info, rtol=1e-6, atol=1e-6 * np.abs(info).max())


def test_init_pose_gravity_alignment():
    # static IMU tilted arbitrarily: accel measures C_SW * (0,0,+g)
    q_true = so3.delta_q(jnp.array([0.3, -0.2, 0.0]))
    C_WS = so3.quat_to_matrix(q_true)
    a_meas = C_WS.T @ jnp.array([0.0, 0.0, 9.81])
    T = init_pose_from_accel(a_meas)
    # the recovered pose must map the measured accel back to world +z
    up = so3.rotate(T.q, a_meas / jnp.linalg.norm(a_meas))
    np.testing.assert_allclose(up, [0.0, 0.0, 1.0], atol=1e-8)
