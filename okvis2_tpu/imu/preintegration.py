"""IMU preintegration as a `lax.scan`, TPU-native.

Covers the roles of okvis::ceres::ImuError's preintegration/propagation
machinery (reference: okvis_ceres/src/ImuError.cpp:278-487 redoPreintegration,
:557-780 propagation, :781-809 initPose) re-designed for XLA:

- measurements live in **fixed-shape** buffers ``[N,3] gyro, [N,3] accel,
  [N] dt, [N] mask`` so the scan compiles once; variable measurement counts
  are handled by masking (dt=0 steps are identity updates).
- preintegration is a single `jax.lax.scan` with a 15x15 covariance carry
  (midpoint/trapezoidal integration like the reference).
- the factor residual (see factors/imu_factor.py) is a *pure function* of the
  two states closed over the `Preintegrated` data; minimal Jacobians come
  from autodiff instead of the reference's hand-derived blocks, so they are
  exactly consistent with the residual by construction.

Error-state convention (matches the reference's block order,
[dp, dalpha, dv, dbg, dba], ImuError.cpp:~430): rotation error is a *left*
perturbation on the preintegrated rotation, C_true = Exp(dalpha) C_hat.

Bias handling mirrors the reference: preintegrate at a linearisation bias,
store first-order bias Jacobians (d_alpha_dbg, d_v_dbg, d_p_dbg and the
integrals C_int / C_dint which are the accel-bias Jacobians), correct at
evaluation time; callers can re-preintegrate when the deviation grows
(ImuError.cpp:860-874 does the same with a 0.1 threshold).
"""

from __future__ import annotations

import math
import dataclasses

import jax
import jax.numpy as jnp

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ImuParameters:
    """Continuous-time noise densities (config imu_parameters section,
    reference Parameters.hpp:57-100 / config/euroc.yaml:42-51)."""

    sigma_g_c: jnp.ndarray  # gyro noise density [rad/s/sqrt(Hz)]
    sigma_a_c: jnp.ndarray  # accel noise density [m/s^2/sqrt(Hz)]
    sigma_gw_c: jnp.ndarray  # gyro bias random walk
    sigma_aw_c: jnp.ndarray  # accel bias random walk
    g: jnp.ndarray  # gravity magnitude (9.81007 for EuRoC)

    def tree_flatten(self):
        return (
            self.sigma_g_c,
            self.sigma_a_c,
            self.sigma_gw_c,
            self.sigma_aw_c,
            self.g,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(
        cls,
        sigma_g_c=12.0e-4,
        sigma_a_c=8.0e-3,
        sigma_gw_c=4.0e-6,
        sigma_aw_c=4.0e-5,
        g=9.81007,
        dtype=None,
    ):
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        a = lambda v: jnp.asarray(v, dtype=dtype)
        return cls(a(sigma_g_c), a(sigma_a_c), a(sigma_gw_c), a(sigma_aw_c), a(g))

    @property
    def gravity_w(self) -> jnp.ndarray:
        """Gravity acceleration in world frame (z up): [0, 0, -g]."""
        return jnp.stack(
            [jnp.zeros_like(self.g), jnp.zeros_like(self.g), -self.g]
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Preintegrated:
    """Result of preintegrating an IMU segment at a linearisation bias.

    All quantities are expressed in the frame of the segment's *start*
    sensor frame S0 (the relocatable form the reference caches).
    """

    delta_q: jnp.ndarray  # [4] rotation S0 <- S1 (xyzw)
    c_int: jnp.ndarray  # [3,3]  integral of C_0t dt       (= -d v / d ba)
    c_dint: jnp.ndarray  # [3,3] double integral           (= -d p / d ba)
    acc_int: jnp.ndarray  # [3]   integral of C_0t a dt    (velocity delta)
    acc_dint: jnp.ndarray  # [3]  double integral          (position delta)
    d_alpha_dbg: jnp.ndarray  # [3,3] rotation-error / gyro-bias Jacobian
    d_v_dbg: jnp.ndarray  # [3,3]
    d_p_dbg: jnp.ndarray  # [3,3]
    covariance: jnp.ndarray  # [15,15] error-state covariance
    sqrt_info: jnp.ndarray  # [15,15] upper-triangular whitening (chol of inv)
    dt_total: jnp.ndarray  # []
    bg_lin: jnp.ndarray  # [3] gyro bias linearisation point
    ba_lin: jnp.ndarray  # [3] accel bias linearisation point

    def tree_flatten(self):
        return (
            self.delta_q,
            self.c_int,
            self.c_dint,
            self.acc_int,
            self.acc_dint,
            self.d_alpha_dbg,
            self.d_v_dbg,
            self.d_p_dbg,
            self.covariance,
            self.sqrt_info,
            self.dt_total,
            self.bg_lin,
            self.ba_lin,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.jit
def preintegrate(
    params: ImuParameters,
    gyro: jnp.ndarray,  # [N,3] averaged-interval gyro measurements
    accel: jnp.ndarray,  # [N,3]
    dt: jnp.ndarray,  # [N] interval lengths (0 => masked out)
    bg: jnp.ndarray,  # [3] gyro bias linearisation point
    ba: jnp.ndarray,  # [3] accel bias linearisation point
) -> Preintegrated:
    """Preintegrate one IMU segment with midpoint integration.

    Callers with raw samples at times t_k should pass per-interval averages
    (trapezoid: 0.5*(m_k + m_{k+1})) and dt_k = t_{k+1}-t_k — the
    `segment_from_samples` helper does this, mirroring the reference's
    trapezoidal rule (ImuError.cpp:335-344).
    """
    dtype = gyro.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        (q, c_int, c_dint, acc_int, acc_dint, d_a_bg, d_v_bg, d_p_bg, P) = carry
        w_m, a_m, h = inp
        w = w_m - bg
        a = a_m - ba

        dq = so3.delta_q(w * h)
        q1 = so3.quat_normalize(so3.quat_multiply(q, dq))
        C = so3.quat_to_matrix(q)
        C1 = so3.quat_to_matrix(q1)
        Ca = C @ a
        C1a = C1 @ a
        half_sum_C = 0.5 * (C + C1)

        acc_int1 = acc_int + 0.5 * (Ca + C1a) * h
        acc_dint1 = acc_dint + acc_int * h + 0.25 * (Ca + C1a) * h * h
        c_int1 = c_int + half_sum_C * h
        c_dint1 = c_dint + c_int * h + 0.5 * half_sum_C * h * h

        # bias Jacobians (left rotation-error convention)
        Jr = so3.right_jacobian(w * h)
        d_a_bg1 = d_a_bg - C1 @ Jr * h
        cross_k = -so3.cross_mx(Ca) @ d_a_bg
        cross_k1 = -so3.cross_mx(C1a) @ d_a_bg1
        d_v_bg1 = d_v_bg + 0.5 * h * (cross_k + cross_k1)
        d_p_bg1 = d_p_bg + h * d_v_bg + 0.25 * h * h * (cross_k + cross_k1)

        # discrete error-state transition F (order [dp, da, dv, dbg, dba])
        F_va = -0.5 * h * (so3.cross_mx(Ca) + so3.cross_mx(C1a))
        # within-step bg->v coupling is O(h^2); the accumulated coupling is
        # captured across steps via F_a_bg then F_va
        F_v_bg = 0.25 * h * h * (so3.cross_mx(C1a) @ (C1 @ Jr))
        F_v_ba = -half_sum_C * h
        F_a_bg = -C1 @ Jr * h

        F = jnp.zeros((15, 15), dtype=dtype)
        F = F.at[0:3, 0:3].set(eye3)
        F = F.at[0:3, 3:6].set(0.5 * h * F_va)
        F = F.at[0:3, 6:9].set(eye3 * h)
        F = F.at[0:3, 9:12].set(0.5 * h * F_v_bg)
        F = F.at[0:3, 12:15].set(0.5 * h * F_v_ba)
        F = F.at[3:6, 3:6].set(eye3)
        F = F.at[3:6, 9:12].set(F_a_bg)
        F = F.at[6:9, 3:6].set(F_va)
        F = F.at[6:9, 6:9].set(eye3)
        F = F.at[6:9, 9:12].set(F_v_bg)
        F = F.at[6:9, 12:15].set(F_v_ba)
        F = F.at[9:12, 9:12].set(eye3)
        F = F.at[12:15, 12:15].set(eye3)

        P1 = F @ P @ F.T
        # additive discrete noise (diagonal approximation, as the reference
        # does after its F_delta product, ImuError.cpp:448-460)
        s2_a = params.sigma_g_c**2 * h
        s2_v = params.sigma_a_c**2 * h
        diag = jnp.concatenate(
            [
                jnp.full((3,), 0.25 * h * h * s2_v, dtype),
                jnp.full((3,), s2_a, dtype),
                jnp.full((3,), s2_v, dtype),
                jnp.full((3,), params.sigma_gw_c**2 * h, dtype),
                jnp.full((3,), params.sigma_aw_c**2 * h, dtype),
            ]
        )
        P1 = P1 + jnp.diag(diag)

        # masked (h == 0) steps are exact identities already: dq=identity,
        # all increments scale with h, F=I, noise diag=0.
        return (q1, c_int1, c_dint1, acc_int1, acc_dint1, d_a_bg1, d_v_bg1,
                d_p_bg1, P1), None

    zero3 = jnp.zeros((3,), dtype=dtype)
    zero33 = jnp.zeros((3, 3), dtype=dtype)
    init = (
        so3.identity_quat(dtype=dtype),
        zero33,
        zero33,
        zero3,
        zero3,
        zero33,
        zero33,
        zero33,
        jnp.zeros((15, 15), dtype=dtype),
    )
    (q, c_int, c_dint, acc_int, acc_dint, d_a_bg, d_v_bg, d_p_bg, P), _ = (
        jax.lax.scan(step, init, (gyro, accel, dt))
    )

    P = 0.5 * (P + P.T)
    # Covariance floor: (a) a zero-length segment must stay invertible;
    # (b) near-noiseless measurements (synthetic data, very short
    # segments) would otherwise give information ~1e12 that swamps the
    # vision terms when the normal equations are accumulated in float32
    # on TPU. The floor models preintegration discretisation error and
    # bounds the whitened scale to f32-safe magnitudes.
    floor = jnp.concatenate(
        [
            jnp.full((3,), 1e-8, dtype),  # position [m^2]  (σ=0.1 mm)
            jnp.full((3,), 1e-10, dtype),  # rotation [rad^2]
            jnp.full((3,), 1e-8, dtype),  # velocity [(m/s)^2]
            jnp.full((6,), 1e-12, dtype),  # biases
        ]
    )
    P = P + jnp.diag(floor)
    from okvis2_tpu.ops.linalg import spd_inverse_sqrt

    sqrt_info = spd_inverse_sqrt(P)

    return Preintegrated(
        delta_q=q,
        c_int=c_int,
        c_dint=c_dint,
        acc_int=acc_int,
        acc_dint=acc_dint,
        d_alpha_dbg=d_a_bg,
        d_v_dbg=d_v_bg,
        d_p_dbg=d_p_bg,
        covariance=P,
        sqrt_info=sqrt_info,
        dt_total=jnp.sum(dt),
        bg_lin=bg,
        ba_lin=ba,
    )


def segment_from_samples(t, gyro, accel, t0, t1, n_max):
    """Host-side helper: raw timestamped samples -> fixed-shape trapezoid
    segment buffers for `preintegrate` (numpy in, numpy out).

    Resamples the boundary measurements by linear interpolation at t0/t1
    like the reference (ImuError.cpp:318-334) and zero-pads to `n_max`.
    """
    import numpy as np

    t = np.asarray(t, dtype=np.float64)
    gyro = np.asarray(gyro, dtype=np.float64)
    accel = np.asarray(accel, dtype=np.float64)

    # measurement times covering [t0, t1]
    ts = [t0]
    for tk in t:
        if t0 < tk < t1:
            ts.append(float(tk))
    ts.append(t1)
    ts = np.asarray(ts)

    def interp(tq):
        gi = np.stack([np.interp(tq, t, gyro[:, i]) for i in range(3)], -1)
        ai = np.stack([np.interp(tq, t, accel[:, i]) for i in range(3)], -1)
        return gi, ai

    g_at, a_at = interp(ts)
    w_avg = 0.5 * (g_at[:-1] + g_at[1:])
    a_avg = 0.5 * (a_at[:-1] + a_at[1:])
    dts = np.diff(ts)

    n = len(dts)
    if n > n_max:
        raise ValueError(f"segment has {n} intervals > capacity {n_max}")
    w_out = np.zeros((n_max, 3))
    a_out = np.zeros((n_max, 3))
    dt_out = np.zeros((n_max,))
    w_out[:n] = w_avg
    a_out[:n] = a_avg
    dt_out[:n] = dts
    return w_out, a_out, dt_out


def correct_for_bias(pre: Preintegrated, bg: jnp.ndarray, ba: jnp.ndarray):
    """First-order bias-corrected (delta_q, delta_v, delta_p) in S0 frame."""
    dbg = bg - pre.bg_lin
    dba = ba - pre.ba_lin
    dq_corr = so3.quat_multiply(
        so3.delta_q(pre.d_alpha_dbg @ dbg), pre.delta_q
    )
    dv = pre.acc_int + pre.d_v_dbg @ dbg - pre.c_int @ dba
    dp = pre.acc_dint + pre.d_p_dbg @ dbg - pre.c_dint @ dba
    return dq_corr, dv, dp


@jax.jit
def propagate_state(
    params: ImuParameters,
    T_WS: Transformation,
    speed_and_bias: jnp.ndarray,  # [9] = [v_W, bg, ba]
    gyro: jnp.ndarray,
    accel: jnp.ndarray,
    dt: jnp.ndarray,
):
    """Dead-reckon a state through an IMU segment (reference
    ImuError::propagation, ImuError.cpp:557-780). Returns (T_WS1, sb1)."""
    v0 = speed_and_bias[0:3]
    bg = speed_and_bias[3:6]
    ba = speed_and_bias[6:9]
    pre = preintegrate(params, gyro, accel, dt, bg, ba)
    dt_tot = pre.dt_total
    g_W = params.gravity_w
    C_WS0 = so3.quat_to_matrix(T_WS.q)

    r1 = T_WS.r + v0 * dt_tot + 0.5 * g_W * dt_tot**2 + C_WS0 @ pre.acc_dint
    v1 = v0 + g_W * dt_tot + C_WS0 @ pre.acc_int
    q1 = so3.quat_normalize(so3.quat_multiply(T_WS.q, pre.delta_q))
    sb1 = jnp.concatenate([v1, bg, ba])
    return Transformation(r=r1, q=q1), sb1


def init_pose_from_accel(accel_mean: jnp.ndarray) -> Transformation:
    """Gravity-aligned initial pose (reference ImuError::initPose,
    ImuError.cpp:781-809): find q_WS s.t. the measured specific force
    (≈ +g up in sensor frame) maps to world +z; yaw is arbitrary (0).
    """
    a = accel_mean / jnp.linalg.norm(accel_mean)
    z_w = jnp.array([0.0, 0.0, 1.0], dtype=accel_mean.dtype)
    # rotation taking sensor-frame 'up' (a) to world z
    v = jnp.cross(a, z_w)
    c = jnp.dot(a, z_w)
    s = jnp.linalg.norm(v)
    safe_s = jnp.where(s > 1e-9, s, 1.0)
    angle = jnp.arctan2(s, c)
    axis = jnp.where(s > 1e-9, v / safe_s, jnp.array([1.0, 0.0, 0.0], a.dtype))
    q_WS = so3.delta_q(axis * angle)
    return Transformation(r=jnp.zeros(3, dtype=accel_mean.dtype), q=q_WS)


def propagate_state_np(g, T_WS7, speed_and_bias, gyro, accel, dt):
    """Pure-numpy dead-reckoning (host mirror of `propagate_state`) for
    the per-frame pose prediction: an initial guess does not need the
    device, and over the TPU tunnel a device call plus readback costs
    ~100 ms (reference role: ThreadedSlam's propagation for detection,
    ThreadedSlam.cpp:397-409, which likewise avoids the estimator).

    g: scalar gravity magnitude; T_WS7 numpy [7]; speed_and_bias [9];
    gyro/accel [N,3]; dt [N]. Returns (T_WS7', speed_and_bias')."""
    import numpy as np

    from okvis2_tpu.core import se3_np

    r = T_WS7[:3].astype(np.float64).copy()
    q = T_WS7[3:7].astype(np.float64).copy()
    v = speed_and_bias[:3].astype(np.float64).copy()
    bg = speed_and_bias[3:6]
    ba = speed_and_bias[6:9]
    g_W = np.array([0.0, 0.0, -float(g)])
    for k in range(len(dt)):
        h = float(dt[k])
        if h <= 0.0:
            continue
        w = gyro[k] - bg
        a = accel[k] - ba
        half = 0.5 * w * h
        ang = np.linalg.norm(half)
        dq = np.concatenate([
            half * (np.sinc(ang / np.pi)), [np.cos(ang)]
        ])
        q1 = se3_np.quat_mul(q, dq)
        C = se3_np.quat_to_mat(q)
        C1 = se3_np.quat_to_mat(q1)
        acc_w = 0.5 * (C @ a + C1 @ a)
        r = r + v * h + 0.5 * g_W * h * h + 0.5 * acc_w * h * h
        v = v + g_W * h + acc_w * h
        q = q1
    sb1 = np.concatenate([v, bg, ba])
    return np.concatenate([r, q]), sb1


def preintegrate_np(params, gyro, accel, dt, bg, ba):
    """Pure-numpy mirror of `preintegrate` for the host packing path.

    The per-frame hot loop preintegrates ONE short segment (~10 samples);
    doing it on device costs a dispatch plus a dozen small readbacks over
    the TPU tunnel (~100 ms), while the numpy scan below is microseconds.
    Returns a Preintegrated with numpy leaves (same math, same floor).
    Whitening uses the symmetric eigh-based inverse square root — a
    different square-root factor than the device path's, but the same
    quadratic form, so the induced cost is identical.
    """
    import numpy as np

    from okvis2_tpu.core import se3_np

    gyro = np.asarray(gyro, np.float64)
    accel = np.asarray(accel, np.float64)
    dt = np.asarray(dt, np.float64)
    bg = np.asarray(bg, np.float64)
    ba = np.asarray(ba, np.float64)

    # The scan below runs ~2x per frame on the host critical path
    # (new-state segment + marginalisation-merged segment, up to
    # imu_seg_capacity samples). Everything that does not genuinely
    # chain is BATCH-precomputed over all steps (rotations, skews,
    # right Jacobians, F blocks) and the linear recurrences collapse
    # to exclusive-prefix cumsums — numpy cumsum accumulates
    # sequentially, so values match the former per-step loop to
    # float64 rounding (~1e-15; the device-parity test bounds are
    # 1e-12). Only the quaternion chain and the 15x15 covariance
    # propagation remain sequential (both cheap).
    dt_total = np.sum(dt)
    keep = dt > 0.0
    if not np.all(keep):
        gyro, accel, dt = gyro[keep], accel[keep], dt[keep]
    N = len(dt)

    eye3 = np.eye(3)
    s_g = float(params.sigma_g_c)
    s_a = float(params.sigma_a_c)
    s_gw = float(params.sigma_gw_c)
    s_aw = float(params.sigma_aw_c)
    noise_base = np.concatenate([
        np.full(3, s_a * s_a),  # x0.25*h*h per step (position channel)
        np.full(3, s_g * s_g),
        np.full(3, s_a * s_a),
        np.full(3, s_gw * s_gw),
        np.full(3, s_aw * s_aw),
    ])

    if N == 0:
        q = np.array([0.0, 0, 0, 1.0])
        c_int = np.zeros((3, 3)); c_dint = np.zeros((3, 3))
        acc_int = np.zeros(3); acc_dint = np.zeros(3)
        d_a_bg = np.zeros((3, 3)); d_v_bg = np.zeros((3, 3))
        d_p_bg = np.zeros((3, 3))
        P = np.zeros((15, 15))
    else:
        h = dt
        w_all = gyro - bg[None, :]          # [N,3]
        a_all = accel - ba[None, :]
        half = 0.5 * w_all * h[:, None]
        ang = np.sqrt(np.sum(half * half, axis=1))  # [N]
        dqs = np.empty((N, 4))
        dqs[:, :3] = half * np.sinc(ang / np.pi)[:, None]
        dqs[:, 3] = np.cos(ang)

        # quaternion chain (genuinely sequential; scalar arithmetic in
        # the exact operation order of se3_np.quat_mul — np.cross/norm
        # per step cost 6 ms/128 samples in call overhead alone)
        qs = np.empty((N + 1, 4))
        qs[0] = (0.0, 0.0, 0.0, 1.0)
        x1 = y1 = z1 = 0.0
        w1 = 1.0
        for k in range(N):
            x2, y2, z2, w2 = dqs[k]
            vx = w1 * x2 + w2 * x1 + (y1 * z2 - z1 * y2)
            vy = w1 * y2 + w2 * y1 + (z1 * x2 - x1 * z2)
            vz = w1 * z2 + w2 * z1 + (x1 * y2 - y1 * x2)
            vw = w1 * w2 - (x1 * x2 + y1 * y2 + z1 * z2)
            nrm = math.sqrt(vx * vx + vy * vy + vz * vz + vw * vw)
            x1, y1, z1, w1 = vx / nrm, vy / nrm, vz / nrm, vw / nrm
            qs[k + 1] = (x1, y1, z1, w1)
        q = qs[-1]

        # batch rotation matrices (same formula as se3_np.quat_to_mat)
        x, y, z, w = qs[:, 0], qs[:, 1], qs[:, 2], qs[:, 3]
        C_all = np.empty((N + 1, 3, 3))
        C_all[:, 0, 0] = 1 - 2 * (y * y + z * z)
        C_all[:, 0, 1] = 2 * (x * y - z * w)
        C_all[:, 0, 2] = 2 * (x * z + y * w)
        C_all[:, 1, 0] = 2 * (x * y + z * w)
        C_all[:, 1, 1] = 1 - 2 * (x * x + z * z)
        C_all[:, 1, 2] = 2 * (y * z - x * w)
        C_all[:, 2, 0] = 2 * (x * z - y * w)
        C_all[:, 2, 1] = 2 * (y * z + x * w)
        C_all[:, 2, 2] = 1 - 2 * (x * x + y * y)
        C0, C1 = C_all[:-1], C_all[1:]

        def cross_b(v):  # [N,3] -> [N,3,3]
            K = np.zeros((len(v), 3, 3))
            K[:, 0, 1] = -v[:, 2]; K[:, 0, 2] = v[:, 1]
            K[:, 1, 0] = v[:, 2]; K[:, 1, 2] = -v[:, 0]
            K[:, 2, 0] = -v[:, 1]; K[:, 2, 1] = v[:, 0]
            return K

        Ca = np.einsum("nij,nj->ni", C0, a_all)
        C1a = np.einsum("nij,nj->ni", C1, a_all)
        CaC1a = Ca + C1a
        half_sum_C = 0.5 * (C0 + C1)

        def excl(inc):
            """Exclusive prefix sums of per-step increments (value
            ENTERING step k); numpy cumsum accumulates sequentially,
            matching the former loop's addition order."""
            c = np.cumsum(inc, axis=0)
            out = np.empty_like(c)
            out[0] = 0.0
            out[1:] = c[:-1]
            return out, c[-1]

        inc_ai = (0.5 * h)[:, None] * CaC1a
        ai_pre, acc_int = excl(inc_ai)
        _, acc_dint = excl(ai_pre * h[:, None]
                           + (0.25 * h * h)[:, None] * CaC1a)
        inc_ci = half_sum_C * h[:, None, None]
        ci_pre, c_int = excl(inc_ci)
        _, c_dint = excl(ci_pre * h[:, None, None]
                         + (0.5 * h * h)[:, None, None] * half_sum_C)

        # right Jacobians (same branches as the scalar version)
        phi = w_all * h[:, None]
        ang2 = 2.0 * ang
        K = cross_b(phi)
        KK = np.einsum("nij,njk->nik", K, K)
        small = ang2 < 1e-8
        angs = np.where(small, 1.0, ang2)
        c1 = np.where(small, 0.5, (1.0 - np.cos(angs)) / (angs * angs))
        c2 = np.where(small, 0.0,
                      (angs - np.sin(angs)) / (angs * angs * angs))
        Jr = (eye3[None] - c1[:, None, None] * K
              + c2[:, None, None] * KK)

        C1Jr = np.einsum("nij,njk->nik", C1, Jr)
        dabg_pre, d_a_bg = excl(-C1Jr * h[:, None, None])
        dabg_post = dabg_pre - C1Jr * h[:, None, None]
        crossCa = cross_b(Ca)
        crossC1a = cross_b(C1a)
        ck_sum = (-np.einsum("nij,njk->nik", crossCa, dabg_pre)
                  - np.einsum("nij,njk->nik", crossC1a, dabg_post))
        inc_dv = (0.5 * h)[:, None, None] * ck_sum
        dvbg_pre, d_v_bg = excl(inc_dv)
        _, d_p_bg = excl(h[:, None, None] * dvbg_pre
                         + (0.25 * h * h)[:, None, None] * ck_sum)

        # batch F, then the (sequential) covariance propagation
        F_va = -0.5 * h[:, None, None] * (crossCa + crossC1a)
        F_v_bg = (0.25 * h * h)[:, None, None] * np.einsum(
            "nij,njk->nik", crossC1a, C1Jr
        )
        F_v_ba = -half_sum_C * h[:, None, None]
        F_a_bg = -C1Jr * h[:, None, None]
        F_all = np.zeros((N, 15, 15))
        for d in range(0, 15, 3):
            F_all[:, d:d + 3, d:d + 3] = eye3
        F_all[:, 0:3, 3:6] = 0.5 * h[:, None, None] * F_va
        F_all[:, 0:3, 6:9] = eye3[None] * h[:, None, None]
        F_all[:, 0:3, 9:12] = 0.5 * h[:, None, None] * F_v_bg
        F_all[:, 0:3, 12:15] = 0.5 * h[:, None, None] * F_v_ba
        F_all[:, 3:6, 9:12] = F_a_bg
        F_all[:, 6:9, 3:6] = F_va
        F_all[:, 6:9, 9:12] = F_v_bg
        F_all[:, 6:9, 12:15] = F_v_ba
        noise_all = noise_base[None, :] * h[:, None]
        noise_all[:, 0:3] *= (0.25 * h * h)[:, None]
        P = np.zeros((15, 15))
        for k in range(N):
            Fk = F_all[k]
            P = Fk @ P @ Fk.T
            P.flat[::16] += noise_all[k]
        d_a_bg = dabg_post[-1]

    P = 0.5 * (P + P.T)
    P += np.diag(np.concatenate([
        np.full(3, 1e-8), np.full(3, 1e-10), np.full(3, 1e-8),
        np.full(6, 1e-12),
    ]))
    wvals, U = np.linalg.eigh(P)
    sqrt_info = (U * (1.0 / np.sqrt(np.maximum(wvals, 1e-30)))) @ U.T

    return Preintegrated(
        delta_q=q,
        c_int=c_int,
        c_dint=c_dint,
        acc_int=acc_int,
        acc_dint=acc_dint,
        d_alpha_dbg=d_a_bg,
        d_v_dbg=d_v_bg,
        d_p_dbg=d_p_bg,
        covariance=P,
        sqrt_info=sqrt_info,
        dt_total=dt_total,
        bg_lin=bg,
        ba_lin=ba,
    )
