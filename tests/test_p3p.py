"""Lambda-Twist P3P minimal solver + rig absolute-pose RANSAC.

Mirrors the reference's opengv solver sanity expectations (GP3P used in
runRansac3d2d, okvis_frontend/src/Frontend.cpp:2208-2278): exact
recovery from noiseless minimal samples, and outlier rejection with
correspondences split across both rig cameras."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.core import so3
from okvis2_tpu.frontend.p3p import p3p_lambda_twist, ransac_rig_pose


def _random_pose(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(0.1, 2.0)
    q = np.concatenate([axis * np.sin(ang / 2), [np.cos(ang / 2)]])
    R = np.asarray(so3.quat_to_matrix(jnp.asarray(q)))
    return q, R, rng.normal(size=3)


def test_p3p_exact_recovery():
    rng = np.random.default_rng(0)
    n_ok = 0
    for _ in range(30):
        _, R, t = _random_pose(rng)
        Y = rng.uniform([-1, -1, 2], [1, 1, 6], size=(3, 3))  # camera frame
        X = (Y - t) @ R  # world points: Y = R X + t
        y = Y / np.linalg.norm(Y, axis=1, keepdims=True)
        Rs, ts, valid = p3p_lambda_twist(jnp.asarray(X), jnp.asarray(y))
        Rs, ts, valid = np.asarray(Rs), np.asarray(ts), np.asarray(valid)
        errs = [
            np.linalg.norm(Rs[i] - R) + np.linalg.norm(ts[i] - t)
            for i in range(4) if valid[i]
        ]
        if errs and min(errs) < 1e-5:
            n_ok += 1
    assert n_ok >= 28, f"only {n_ok}/30 exact recoveries"


def test_rig_ransac_rejects_outliers_across_cameras():
    rng = np.random.default_rng(3)
    N = 256
    pts_W = rng.uniform(-5, 5, size=(N, 3))
    T_SC = np.zeros((2, 7))
    T_SC[:, 6] = 1.0
    T_SC[1, 0] = 0.11  # stereo baseline
    q, R_ws, t_ws = _random_pose(rng)
    cam_idx = rng.integers(0, 2, size=N)
    rays = np.zeros((N, 3))
    mask = np.zeros(N, bool)
    for i in range(N):
        p_S = R_ws.T @ (pts_W[i] - t_ws)
        p_C = p_S - T_SC[cam_idx[i], :3]
        if p_C[2] > 0.5:
            rays[i] = p_C / np.linalg.norm(p_C)
            mask[i] = True
    is_outlier = np.zeros(N, bool)
    for i in range(N):
        if mask[i] and rng.random() < 0.3:
            v = rng.normal(size=3)
            rays[i] = v / np.linalg.norm(v)
            is_outlier[i] = True
    res = ransac_rig_pose(
        jax.random.PRNGKey(1), jnp.asarray(pts_W), jnp.asarray(rays),
        jnp.asarray(cam_idx, jnp.int32), jnp.asarray(mask),
        jnp.asarray(T_SC),
    )
    assert bool(res["ok"])
    T = res["T_WS"]
    assert np.linalg.norm(np.asarray(T.r) - t_ws) < 0.05
    qe = np.asarray(T.q)
    assert min(np.linalg.norm(qe - q), np.linalg.norm(qe + q)) < 0.01
    inl = np.asarray(res["inliers"])
    # no planted outlier survives; most true inliers kept
    assert not np.any(inl & is_outlier)
    true_in = mask & ~is_outlier
    assert inl[true_in].mean() > 0.9
    # the joint inlier set must span BOTH cameras (rig-consistent)
    assert len(set(cam_idx[inl])) == 2
