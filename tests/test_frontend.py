"""Frontend tests: detection, description, matching, triangulation, RANSAC.

The reference has no unit tests for BRISK itself (vendored); the survey's
guidance (SURVEY.md hard part (d)) is to validate descriptor *quality* via
matching recall on warped images rather than bit-exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.frontend.detection import DetectionConfig, detect_keypoints
from okvis2_tpu.frontend.descriptor import describe_keypoints
from okvis2_tpu.frontend.matching import (
    hamming_distance_matrix,
    match_descriptors,
)
from okvis2_tpu.frontend.ransac import (
    ransac_absolute_pose,
    ransac_relative_pose,
    ransac_rotation_only,
    decompose_essential,
)
from okvis2_tpu.frontend.triangulation import triangulate_in_frames


def textured_image(h=240, w=320, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    img = rng.normal(0, 1.0, (h, w))
    # smooth a little so corners have spatial extent
    k = np.ones((3, 3)) / 9.0
    from scipy import signal  # available via scipy in the image? fall back

    try:
        img = signal.convolve2d(img, k, mode="same")
    except Exception:
        pass
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray(img, dtype)


@pytest.fixture(scope="module")
def image():
    try:
        return textured_image()
    except ImportError:
        rng = np.random.default_rng(0)
        img = rng.normal(0, 1.0, (240, 320))
        img = (img - img.min()) / (img.max() - img.min())
        return jnp.asarray(img)


def test_detection_basic(image):
    cfg = DetectionConfig(max_keypoints=256)
    out = detect_keypoints(image, cfg)
    assert out["xy"].shape == (256, 2)
    n_valid = int(out["mask"].sum())
    assert n_valid > 100
    xy = np.asarray(out["xy"])[np.asarray(out["mask"])]
    assert xy[:, 0].min() >= cfg.border and xy[:, 0].max() <= 320 - cfg.border
    assert xy[:, 1].min() >= cfg.border and xy[:, 1].max() <= 240 - cfg.border
    # spatial spread: keypoints should cover multiple grid cells
    cells = set(map(tuple, (xy // 32).astype(int)))
    assert len(cells) > 20


def test_detection_translation_repeatability(image):
    """Detected corners should shift with a pure image translation."""
    cfg = DetectionConfig(max_keypoints=256)
    out1 = detect_keypoints(image, cfg)
    shifted = jnp.roll(image, (0, 7), axis=(0, 1))
    out2 = detect_keypoints(shifted, cfg)
    xy1 = np.asarray(out1["xy"])[np.asarray(out1["mask"])]
    xy2 = np.asarray(out2["xy"])[np.asarray(out2["mask"])]
    # count keypoints in 1 that have a partner at +7px x in 2
    from scipy.spatial import cKDTree

    tree = cKDTree(xy2)
    d, _ = tree.query(xy1 + np.array([7.0, 0.0]), k=1)
    repeat = np.mean(d < 1.5)
    assert repeat > 0.6, f"repeatability {repeat}"


def test_hamming_matmul_equals_popcount(image):
    cfg = DetectionConfig(max_keypoints=64)
    out = detect_keypoints(image, cfg)
    desc = describe_keypoints(image, out["xy"], out["size"], out["mask"])
    packed = np.array(desc["packed"])  # writable copy
    signs = desc["signs"]
    d_mm = np.asarray(hamming_distance_matrix(signs, signs))
    m = np.asarray(out["mask"])
    # popcount reference on packed bits
    pc = np.zeros((64, 64))
    for i in range(64):
        x = packed[i] ^ packed  # [64,16]
        pc[i] = np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1)
    both = np.outer(m, m)
    np.testing.assert_allclose(d_mm[both], pc[both], atol=1e-6)


def test_descriptor_matching_recall(image):
    """Shift the image; >60% of valid matches must follow the shift."""
    cfg = DetectionConfig(max_keypoints=256)
    out1 = detect_keypoints(image, cfg)
    d1 = describe_keypoints(image, out1["xy"], out1["size"], out1["mask"])
    shifted = jnp.roll(image, (5, 12), axis=(0, 1))
    out2 = detect_keypoints(shifted, cfg)
    d2 = describe_keypoints(shifted, out2["xy"], out2["size"], out2["mask"])
    m = match_descriptors(
        d1["signs"], out1["mask"], d2["signs"], out2["mask"], max_distance=100
    )
    idx = np.asarray(m["idx_b"])
    valid = np.asarray(m["valid"])
    assert valid.sum() > 40
    xy1 = np.asarray(out1["xy"])
    xy2 = np.asarray(out2["xy"])
    err = np.linalg.norm(
        xy1[valid] + np.array([12.0, 5.0]) - xy2[idx[valid]], axis=-1
    )
    recall = np.mean(err < 2.0)
    assert recall > 0.6, f"matching recall {recall}"


def test_triangulation_exact():
    rng = np.random.default_rng(3)
    pts_W = jnp.asarray(rng.uniform(-2, 2, (50, 3)) + np.array([0, 0, 5.0]))
    T_WA = Transformation.identity()
    T_WB = Transformation(
        r=jnp.asarray([0.3, 0.05, 0.0]),
        q=so3.delta_q(jnp.asarray([0.02, -0.03, 0.01])),
    )
    ray_A = pts_W / jnp.linalg.norm(pts_W, axis=-1, keepdims=True)
    p_B = jax.vmap(T_WB.inverse().apply)(pts_W)
    ray_B = p_B / jnp.linalg.norm(p_B, axis=-1, keepdims=True)
    hp, valid, parallel = triangulate_in_frames(T_WA, T_WB, ray_A, ray_B)
    assert bool(jnp.all(valid))
    assert not bool(jnp.any(parallel))
    rec = np.asarray(hp[:, :3] / hp[:, 3:4])
    np.testing.assert_allclose(rec, np.asarray(pts_W), atol=1e-8)


def test_ransac_absolute_pose_with_outliers():
    rng = np.random.default_rng(7)
    N = 100
    pts_W = rng.uniform(-3, 3, (N, 3)) + np.array([0, 0, 6.0])
    q_true = so3.delta_q(jnp.asarray([0.1, -0.2, 0.15]))
    t_true = jnp.asarray([0.4, -0.3, 0.2])
    T_CW = Transformation(r=t_true, q=q_true)
    p_C = jax.vmap(T_CW.apply)(jnp.asarray(pts_W))
    rays = p_C / jnp.linalg.norm(p_C, axis=-1, keepdims=True)
    rays = np.array(rays)  # writable copy
    # 30% outliers
    n_out = 30
    out_idx = rng.choice(N, n_out, replace=False)
    bad = rng.normal(0, 1, (n_out, 3))
    rays[out_idx] = bad / np.linalg.norm(bad, axis=-1, keepdims=True)
    res = ransac_absolute_pose(
        jax.random.PRNGKey(0),
        jnp.asarray(pts_W),
        jnp.asarray(rays),
        jnp.ones(N, bool),
    )
    assert bool(res["ok"])
    inl = np.asarray(res["inliers"])
    assert inl.sum() >= 60
    assert not inl[out_idx].any() or inl[out_idx].mean() < 0.1
    T = res["T_CW"]
    np.testing.assert_allclose(np.asarray(T.r), np.asarray(t_true), atol=1e-3)
    dq = so3.quat_multiply(so3.quat_conjugate(T.q), q_true)
    assert float(jnp.linalg.norm(so3.quat_log(dq))) < 1e-3


def test_ransac_rotation_only():
    rng = np.random.default_rng(8)
    N = 60
    d1 = rng.normal(0, 1, (N, 3))
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    R_true = np.asarray(so3.quat_to_matrix(so3.delta_q(jnp.asarray([0.2, 0.1, -0.3]))))
    d2 = d1 @ R_true.T
    d2[:10] = rng.normal(0, 1, (10, 3))
    d2[:10] /= np.linalg.norm(d2[:10], axis=-1, keepdims=True)
    res = ransac_rotation_only(
        jax.random.PRNGKey(1), jnp.asarray(d1), jnp.asarray(d2), jnp.ones(N, bool)
    )
    assert int(res["num_inliers"]) >= 45
    np.testing.assert_allclose(np.asarray(res["R_BA"]), R_true, atol=1e-6)


def test_ransac_relative_pose_and_decompose():
    rng = np.random.default_rng(9)
    N = 120
    pts = rng.uniform(-2, 2, (N, 3)) + np.array([0, 0, 5.0])
    R_BA = np.asarray(
        so3.quat_to_matrix(so3.delta_q(jnp.asarray([0.05, -0.1, 0.02])))
    )
    t_BA = np.array([0.5, 0.1, -0.05])
    rays_A = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    pts_B = pts @ R_BA.T + t_BA
    rays_B = pts_B / np.linalg.norm(pts_B, axis=-1, keepdims=True)
    rays_B[:20] = rng.normal(0, 1, (20, 3))
    rays_B[:20] /= np.linalg.norm(rays_B[:20], axis=-1, keepdims=True)
    res = ransac_relative_pose(
        jax.random.PRNGKey(2),
        jnp.asarray(rays_A),
        jnp.asarray(rays_B),
        jnp.ones(N, bool),
    )
    assert int(res["num_inliers"]) >= 80
    # decompose with a known-good correspondence
    good = int(np.argmax(np.asarray(res["inliers"])))
    R, t = decompose_essential(
        res["E"], jnp.asarray(rays_A[good]), jnp.asarray(rays_B[good])
    )
    # translation recovered up to scale
    t_dir = np.asarray(t) / np.linalg.norm(np.asarray(t))
    t_true_dir = t_BA / np.linalg.norm(t_BA)
    assert abs(float(np.dot(t_dir, t_true_dir))) > 0.99
    np.testing.assert_allclose(np.asarray(R), R_BA, atol=5e-3)
