"""Multi-chip sharded BA tests (8 virtual CPU devices via conftest)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2_tpu.parallel.sharded_ba import (
    make_mesh,
    shard_problem_by_landmark,
    solve_full_graph_sharded,
)
from okvis2_tpu.solver import SolverConfig, problem_cost, solve_window
from okvis2_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scene():
    problem, cams, imu_params, gt = synthetic.build_problem(
        num_states=4, n_landmarks_side=6
    )
    problem = dataclasses.replace(
        problem, pose_frozen=jnp.zeros(problem.S, bool).at[0].set(True)
    )
    return problem, cams, imu_params, gt


def test_reshard_preserves_cost(scene):
    problem, cams, imu_params, _ = scene
    c0 = float(problem_cost(problem, cams, imu_params))
    for n in (2, 8):
        sh = shard_problem_by_landmark(problem, n)
        c = float(problem_cost(sh, cams, imu_params))
        assert abs(c - c0) < 1e-9 * max(abs(c0), 1.0) + 1e-12


def test_sharded_solve_recovers_disturbed(scene):
    problem, cams, imu_params, gt = scene
    disturbed = synthetic.disturb_problem(
        problem, pos_sigma=0.02, rot_sigma=0.01, lm_sigma=0.03
    )
    n = 8
    mesh = make_mesh(n)
    sh = shard_problem_by_landmark(disturbed, n)
    c0 = float(problem_cost(sh, cams, imu_params))
    solved = solve_full_graph_sharded(
        sh, cams, imu_params, mesh,
        SolverConfig(initial_lambda=1e-6, max_iterations=20), n_iterations=20,
    )
    c1 = float(problem_cost(solved, cams, imu_params))
    assert c1 < 1e-4 * c0
    dp = np.linalg.norm(
        np.asarray(solved.pose)[:, :3] - np.asarray(gt["pose"])[:, :3], axis=-1
    )
    assert dp.max() < 5e-3


def test_graft_entry_points():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out[1]))
    g.dryrun_multichip(8)
