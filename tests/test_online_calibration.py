"""Online extrinsics calibration (Hilti-style, reference
CameraParameters online_calibration — ViParametersReader + extrinsics
variable blocks). The solver treats extrinsics as optimisable when
ext_frozen is False."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from okvis2_tpu.core import so3
from okvis2_tpu.solver import SolverConfig, solve_window
from okvis2_tpu.solver.gauss_newton import _oplus_pose
from okvis2_tpu.utils import synthetic


def test_extrinsics_recovered():
    problem, cams, imu_params, gt = synthetic.build_problem(
        num_states=4, n_landmarks_side=6
    )
    ext_true = np.asarray(problem.extrinsics)
    # freeze all poses at ground truth; perturb cam1 extrinsics
    d = jnp.zeros((2, 6)).at[1].set(
        jnp.asarray([0.01, -0.008, 0.012, 0.01, -0.005, 0.008])
    )
    problem = dataclasses.replace(
        problem,
        pose_frozen=jnp.ones(problem.S, bool),
        sb_frozen=jnp.ones(problem.S, bool),
        ext_frozen=jnp.asarray([True, False]),
        extrinsics=_oplus_pose(problem.extrinsics, d),
        imu_mask=jnp.zeros_like(problem.imu_mask),
    )
    solved, stats = solve_window(
        problem, cams, imu_params, SolverConfig(max_iterations=15)
    )
    ext = np.asarray(solved.extrinsics)
    # cam0 untouched (frozen)
    np.testing.assert_allclose(ext[0], ext_true[0], atol=1e-12)
    # cam1 recovered
    np.testing.assert_allclose(ext[1][:3], ext_true[1][:3], atol=1e-4)
    dq = so3.quat_multiply(
        so3.quat_conjugate(jnp.asarray(ext_true[1][3:7])),
        jnp.asarray(ext[1][3:7]),
    )
    assert float(jnp.linalg.norm(so3.quat_log(dq))) < 1e-4
