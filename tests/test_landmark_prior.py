"""Landmark prior factor (HomogeneousPointError role)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from okvis2_tpu.solver import SolverConfig, solve_window
from okvis2_tpu.utils import synthetic


def test_landmark_prior_pins_point():
    problem, cams, imu_params, gt = synthetic.build_problem(
        num_states=3, n_landmarks_side=5
    )
    # remove all observations of landmark 0 but give it a strong prior at
    # a shifted position: the solver must pull it there
    target = np.array(problem.landmarks[0]) + np.array([0.5, -0.3, 0.2, 0.0])
    obs_mask = np.array(problem.obs_mask)
    obs_mask[np.array(problem.obs_lm) == 0] = False
    problem = dataclasses.replace(
        problem,
        pose_frozen=jnp.ones(problem.S, bool),
        sb_frozen=jnp.ones(problem.S, bool),
        imu_mask=jnp.zeros_like(problem.imu_mask),
        obs_mask=jnp.asarray(obs_mask),
        lm_prior=problem.lm_prior.at[0].set(jnp.asarray(target)),
        lm_prior_sqrt=problem.lm_prior_sqrt.at[0].set(100.0),
        lm_prior_mask=jnp.zeros(problem.L, bool).at[0].set(True),
    )
    solved, stats = solve_window(
        problem, cams, imu_params, SolverConfig(max_iterations=8)
    )
    np.testing.assert_allclose(
        np.asarray(solved.landmarks[0][:3]), target[:3], atol=1e-6
    )
    # other landmarks (observed, at ground truth, poses frozen) unchanged
    np.testing.assert_allclose(
        np.asarray(solved.landmarks[1:, :3]),
        np.asarray(gt["landmarks"][1:, :3]),
        atol=1e-4,
    )
