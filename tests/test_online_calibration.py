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


def test_estimator_online_extrinsics_wiring():
    """End-to-end wiring: EstimatorConfig.online_extrinsics unfreezes the
    extrinsics blocks with sigma_r/sigma_alpha priors and writes the
    calibrated T_SC back (reference do_extrinsics plumbing,
    Parameters.hpp:57-100). Fails if the flag stops reaching the solver."""
    import jax.numpy as jnp
    import numpy as np

    from okvis2_tpu.core import se3_np
    from okvis2_tpu.core.se3 import Transformation
    from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
    from okvis2_tpu.imu.preintegration import ImuParameters

    cams, exts_true = synthetic.stereo_rig()
    ext1_true = np.concatenate(
        [np.asarray(exts_true[1].r), np.asarray(exts_true[1].q)]
    )
    pert = ext1_true.copy()
    pert[0] += 0.012
    pert[1] -= 0.008
    exts_given = [
        exts_true[0],
        Transformation(r=jnp.asarray(pert[:3]), q=jnp.asarray(pert[3:7])),
    ]
    est = Estimator(
        cams, exts_given, ImuParameters.create(g=9.81),
        EstimatorConfig(online_extrinsics=True, ext_sigma_r=0.05,
                        ext_sigma_alpha=0.05),
    )
    rng = np.random.default_rng(0)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(30, 3))
    poses = [
        np.array([0.0, 0, 0, 0, 0, 0, 1.0]),
        np.array([0.3, 0.1, 0, 0, 0, 0, 1.0]),
        np.array([-0.2, 0.2, 0.1, 0, 0, 0, 1.0]),
    ]
    sids = []
    for k, p in enumerate(poses):
        sid = est.add_state(k * 0.1, np.zeros((0, 3)), np.zeros((0, 3)),
                            np.zeros(0))
        est.states[sid].pose = p
        est.states[sid].frozen = True
        sids.append(sid)
    T_SC7 = [np.concatenate([np.asarray(T.r), np.asarray(T.q)])
             for T in exts_true]
    for i, pt in enumerate(pts):
        lid = est.add_landmark(np.concatenate([pt, [1.0]]), initialised=True)
        for sid, p in zip(sids, poses):
            for ci, cam in enumerate(cams):
                T_WC = se3_np.compose7(p, T_SC7[ci])
                p_C = se3_np.quat_to_mat(T_WC[3:7]).T @ (pt - T_WC[:3])
                if p_C[2] < 0.1:
                    continue
                uv, valid = cam.project(jnp.asarray(p_C))
                if bool(valid):
                    est.add_observation(lid, sid, ci, i, np.asarray(uv))
    err0 = np.linalg.norm(est.T_SC[1][:3] - ext1_true[:3])
    est.optimise(iterations=15)
    err1 = np.linalg.norm(est.T_SC[1][:3] - ext1_true[:3])
    # free landmarks absorb part of the miscalibration, so full recovery
    # isn't expected from 3 views; the wiring being dead leaves err1 ==
    # err0 exactly, which is what this guards against
    assert err1 < err0 * 0.6, (err0, err1)
