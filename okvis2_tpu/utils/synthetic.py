"""Synthetic VIO scene generation for tests and benchmarks.

Plays the role of the reference's test fixtures (okvis_ceres/test/
TestEstimator.cpp:52 landmark-grid simulation, TestImuError.cpp:94-160
analytic sinusoid trajectories): build an analytic trajectory, a landmark
field, exact IMU measurements and exact (optionally noisy) keypoint
observations, and pack them into a WindowProblem.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.cameras.pinhole import PinholeCamera
from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.imu.preintegration import ImuParameters, preintegrate
from okvis2_tpu.solver.window_problem import WindowProblem


AXIS = np.array([0.3, 1.0, 0.1])
AXIS /= np.linalg.norm(AXIS)


def traj_theta(t):
    return 0.2 * jnp.sin(1.1 * t)


def traj_pos(t):
    return jnp.stack(
        [0.5 * t, 0.3 * jnp.sin(0.8 * t), 0.1 * jnp.cos(1.3 * t)]
    )


def true_state(t):
    """Ground-truth (T_WS, v_W) at time t for the canonical test trajectory."""
    t = jnp.asarray(t, dtype=jnp.float64)
    u = jnp.asarray(AXIS)
    q = so3.delta_q(u * traj_theta(t))
    return Transformation(r=traj_pos(t), q=q), jax.jacfwd(traj_pos)(t)


def imu_at(t, params: ImuParameters):
    t = jnp.asarray(t, dtype=jnp.float64)
    u = jnp.asarray(AXIS)
    w_S = u * jax.grad(traj_theta)(t)
    a_W = jax.jacfwd(jax.jacfwd(traj_pos))(t)
    C_WS = so3.quat_to_matrix(so3.delta_q(u * traj_theta(t)))
    a_S = C_WS.T @ (a_W - params.gravity_w)
    return w_S, a_S


def imu_segment(t0, t1, n, params):
    ts = np.linspace(t0, t1, n + 1)
    w, a = jax.vmap(lambda t: imu_at(t, params))(jnp.asarray(ts))
    w = np.asarray(w)
    a = np.asarray(a)
    return (
        jnp.asarray(0.5 * (w[:-1] + w[1:])),
        jnp.asarray(0.5 * (a[:-1] + a[1:])),
        jnp.asarray(np.diff(ts)),
    )


def stereo_rig(baseline=0.11, distortion_cls=None):
    cam = PinholeCamera.create_test_object(distortion_cls)
    T_SC0 = Transformation.identity()
    # cameras look along +z of the body, stereo offset along x
    T_SC1 = Transformation(
        r=jnp.array([baseline, 0.0, 0.0]), q=so3.identity_quat(dtype=jnp.float64)
    )
    return (cam, cam), (T_SC0, T_SC1)


def landmark_wall(n_side=8, z=6.0, extent=8.0, seed=0):
    """Grid of landmarks on a wall in front of the trajectory (world z)."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(-extent / 2, extent / 2, n_side)
    ys = np.linspace(-extent / 2, extent / 2, n_side)
    X, Y = np.meshgrid(xs, ys)
    pts = np.stack(
        [X.ravel() + 2.0, Y.ravel(), np.full(X.size, z) + rng.uniform(-1, 1, X.size)],
        axis=-1,
    )
    hp = np.concatenate([pts, np.ones((len(pts), 1))], axis=-1)
    return jnp.asarray(hp)


class CircleTrajectory:
    """Closed-circuit trajectory (returns to the start) for loop-closure
    tests: the body circles at constant height, yawing to keep the wall
    of landmarks in view. Exposes the same (true_state, imu_at) API as
    this module."""

    def __init__(self, period: float = 10.0, radius: float = 1.5):
        self.w = 2.0 * np.pi / period
        self.radius = radius

    def _pos(self, t):
        a = self.w * t
        return jnp.stack(
            [self.radius * jnp.sin(a), self.radius * (1.0 - jnp.cos(a)),
             0.05 * jnp.sin(2.0 * a)]
        )

    def _theta(self, t):
        # gentle yaw oscillation (keeps scene visible, adds excitation)
        return 0.15 * jnp.sin(self.w * t)

    def true_state(self, t):
        t = jnp.asarray(t, dtype=jnp.float64)
        u = jnp.asarray([0.0, 1.0, 0.0])
        q = so3.delta_q(u * self._theta(t))
        return (
            Transformation(r=self._pos(t), q=q),
            jax.jacfwd(self._pos)(t),
        )

    def imu_at(self, t, params: ImuParameters):
        t = jnp.asarray(t, dtype=jnp.float64)
        u = jnp.asarray([0.0, 1.0, 0.0])
        w_S = u * jax.grad(self._theta)(t)
        a_W = jax.jacfwd(jax.jacfwd(self._pos))(t)
        C_WS = so3.quat_to_matrix(so3.delta_q(u * self._theta(t)))
        a_S = C_WS.T @ (a_W - params.gravity_w)
        return w_S, a_S


def build_problem(
    num_states=5,
    frame_dt=0.3,
    n_landmarks_side=8,
    imu_rate=200,
    imu_params=None,
    obs_noise=0.0,
    seed=0,
):
    """Build a fully-populated WindowProblem at ground truth.

    Returns (problem, cameras, imu_params, ground_truth dict).
    """
    if imu_params is None:
        imu_params = ImuParameters.create(g=9.81)
    cams, exts = stereo_rig()
    hp_W = landmark_wall(n_landmarks_side)
    L = hp_W.shape[0]
    S = num_states
    ts = [i * frame_dt for i in range(S)]

    poses = []
    sbs = []
    for t in ts:
        T, v = true_state(t)
        poses.append(np.concatenate([np.asarray(T.r), np.asarray(T.q)]))
        sbs.append(np.concatenate([np.asarray(v), np.zeros(6)]))
    poses = jnp.asarray(np.stack(poses))
    sbs = jnp.asarray(np.stack(sbs))

    # IMU links
    n_per = int(imu_rate * frame_dt)
    pres = []
    for i in range(S - 1):
        w, a, dt = imu_segment(ts[i], ts[i + 1], n_per, imu_params)
        pres.append(
            preintegrate(imu_params, w, a, dt, jnp.zeros(3), jnp.zeros(3))
        )
    pre_batched = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *pres
    )

    # observations: project all landmarks into all frames/cameras
    rng = np.random.default_rng(seed)
    obs = []
    for si in range(S):
        T_WS = Transformation(r=poses[si, :3], q=poses[si, 3:7])
        for ci, (cam, T_SC) in enumerate(zip(cams, exts)):
            T_CW = (T_WS @ T_SC).inverse()
            hp_C = jax.vmap(T_CW.apply_homogeneous)(hp_W)
            uv, valid = cam.project_homogeneous(hp_C)
            uv = np.asarray(uv)
            valid = np.asarray(valid)
            for li in range(L):
                if valid[li]:
                    noise = rng.normal(0, obs_noise, 2) if obs_noise > 0 else 0.0
                    obs.append((si, ci, li, uv[li] + noise))
    O = len(obs)

    problem = WindowProblem.empty(
        num_states=S,
        num_landmarks=L,
        num_obs=O,
        num_cameras=len(cams),
        imu_capacity=n_per,
    )
    ext7 = jnp.stack([jnp.concatenate([e.r, e.q]) for e in exts])
    obs_state = jnp.asarray([o[0] for o in obs], jnp.int32)
    obs_cam = jnp.asarray([o[1] for o in obs], jnp.int32)
    obs_lm = jnp.asarray([o[2] for o in obs], jnp.int32)
    obs_uv = jnp.asarray(np.stack([o[3] for o in obs]))

    problem = dataclasses.replace(
        problem,
        pose=poses,
        speed_bias=sbs,
        extrinsics=ext7,
        landmarks=hp_W,
        state_mask=jnp.ones(S, bool),
        lm_mask=jnp.ones(L, bool),
        obs_state=obs_state,
        obs_cam=obs_cam,
        obs_lm=obs_lm,
        obs_uv=obs_uv,
        obs_sqrt_info=jnp.full((O,), 8.0 / 9.0),  # keypoint size 9 px
        obs_mask=jnp.ones(O, bool),
        imu_pre=pre_batched,
        imu_mask=jnp.ones(S - 1, bool),
    )
    gt = {"pose": poses, "speed_bias": sbs, "landmarks": hp_W, "times": ts}
    return problem, cams, imu_params, gt


def disturb_problem(problem, pos_sigma=0.05, rot_sigma=0.02, lm_sigma=0.1,
                    sb_sigma=0.05, seed=1, keep_first=True):
    """Perturb all states/landmarks (except optionally the first state)."""
    rng = np.random.default_rng(seed)
    S, L = problem.S, problem.L
    dp = rng.normal(0, pos_sigma, (S, 3))
    da = rng.normal(0, rot_sigma, (S, 3))
    dsb = rng.normal(0, sb_sigma, (S, 9))
    dl = rng.normal(0, lm_sigma, (L, 3))
    if keep_first:
        dp[0] = 0
        da[0] = 0
        dsb[0] = 0
    from okvis2_tpu.solver.gauss_newton import _oplus_pose, _oplus_hp

    return dataclasses.replace(
        problem,
        pose=_oplus_pose(
            problem.pose, jnp.asarray(np.concatenate([dp, da], axis=-1))
        ),
        speed_bias=problem.speed_bias + jnp.asarray(dsb),
        landmarks=_oplus_hp(problem.landmarks, jnp.asarray(dl)),
    )
