"""Sliding-window solver tests.

Mirrors the reference's estimator test strategy (okvis_ceres/test/
TestEstimator.cpp, TestReprojectionError.cpp, TestImuError.cpp optimisation
sections): simulate ground truth, disturb, optimise, assert recovery.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from okvis2_tpu.core import so3
from okvis2_tpu.solver import SolverConfig, problem_cost, solve_window
from okvis2_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scene():
    return synthetic.build_problem(num_states=4, n_landmarks_side=6)


def pose_errors(p, gt):
    dp = np.asarray(p.pose[:, :3] - gt["pose"][:, :3])
    dq = so3.quat_multiply(
        so3.quat_conjugate(gt["pose"][:, 3:7]), p.pose[:, 3:7]
    )
    da = np.asarray(so3.quat_log(dq))
    return np.linalg.norm(dp, axis=-1), np.linalg.norm(da, axis=-1)


def test_cost_zero_at_ground_truth(scene):
    problem, cams, imu_params, gt = scene
    c = float(problem_cost(problem, cams, imu_params))
    # exact measurements: only integration discretisation error remains
    assert c < 1e-3


def test_ba_recovers_disturbed_states(scene):
    problem, cams, imu_params, gt = scene
    # gauge fixing: freeze the first pose (kept at ground truth)
    problem = dataclasses.replace(
        problem,
        pose_frozen=jnp.zeros(problem.S, bool).at[0].set(True),
    )
    disturbed = synthetic.disturb_problem(problem)
    c0 = float(problem_cost(disturbed, cams, imu_params))
    solved, stats = solve_window(
        disturbed, cams, imu_params, SolverConfig(max_iterations=15)
    )
    c1 = float(stats["final_cost"])
    assert c1 < 1e-2 * c0
    dp, da = pose_errors(solved, gt)
    assert dp.max() < 5e-3
    assert da.max() < 2e-3
    lm_err = np.linalg.norm(
        np.asarray(solved.landmarks[:, :3] - gt["landmarks"][:, :3]), axis=-1
    )
    assert np.median(lm_err) < 1e-2


def test_frozen_blocks_do_not_move(scene):
    problem, cams, imu_params, gt = scene
    problem = dataclasses.replace(
        problem,
        pose_frozen=jnp.zeros(problem.S, bool).at[0].set(True),
        sb_frozen=jnp.zeros(problem.S, bool).at[0].set(True),
    )
    disturbed = synthetic.disturb_problem(problem)
    solved, _ = solve_window(disturbed, cams, imu_params, SolverConfig(max_iterations=5))
    np.testing.assert_allclose(
        np.asarray(solved.pose[0]), np.asarray(disturbed.pose[0]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(solved.speed_bias[0]),
        np.asarray(disturbed.speed_bias[0]),
        atol=1e-12,
    )
    # extrinsics are frozen by default
    np.testing.assert_allclose(
        np.asarray(solved.extrinsics), np.asarray(disturbed.extrinsics), atol=1e-12
    )


def test_masked_slots_ignored(scene):
    """Deactivating a state slot must not change the others' solution."""
    problem, cams, imu_params, gt = scene
    problem = dataclasses.replace(
        problem,
        pose_frozen=jnp.zeros(problem.S, bool).at[0].set(True),
    )
    # deactivate the last state and its factors
    S = problem.S
    reduced = dataclasses.replace(
        problem,
        state_mask=problem.state_mask.at[S - 1].set(False),
    )
    disturbed = synthetic.disturb_problem(reduced)
    solved, stats = solve_window(
        disturbed, cams, imu_params, SolverConfig(max_iterations=25)
    )
    dp, da = pose_errors(solved, gt)
    # fewer constraints than the full problem: looser recovery bound
    assert dp[: S - 1].max() < 2e-2
    # the masked slot must be untouched
    np.testing.assert_allclose(
        np.asarray(solved.pose[S - 1]),
        np.asarray(disturbed.pose[S - 1]),
        atol=1e-12,
    )


def test_pose_prior_pulls_solution():
    from okvis2_tpu.solver.window_problem import WindowProblem
    from okvis2_tpu.imu.preintegration import ImuParameters
    from okvis2_tpu.utils.synthetic import stereo_rig

    cams, _ = stereo_rig()
    imu_params = ImuParameters.create()
    p = WindowProblem.empty(2, 4, 4, 2, 8)
    target = jnp.asarray([0.3, -0.2, 0.1, 0.0, 0.0, 0.0, 1.0])
    p = dataclasses.replace(
        p,
        state_mask=jnp.ones(2, bool).at[1].set(False),
        pose_prior=p.pose_prior.at[0].set(target),
        pose_prior_sqrt=p.pose_prior_sqrt.at[0].set(jnp.eye(6) * 100.0),
        pose_prior_mask=jnp.zeros(2, bool).at[0].set(True),
    )
    solved, stats = solve_window(p, cams, imu_params, SolverConfig(max_iterations=5))
    np.testing.assert_allclose(np.asarray(solved.pose[0]), np.asarray(target), atol=1e-8)
