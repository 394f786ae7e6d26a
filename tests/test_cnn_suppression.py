"""CNN sky/person suppression: landmark information x 1e-4.

Reference behaviour: Frontend.cpp:969-1011 scales the information of
every observation of a sky/person landmark by 1e-4 so dynamic/degenerate
structure cannot drag the poses. The A/B test below plants "person-like"
landmarks whose observations are INCONSISTENT between two frames (the
object moved); without suppression they bias the free pose, with
suppression they do not.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from okvis2_tpu.core import se3_np
from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.utils import synthetic


def _build(suppress: bool):
    cams, exts = synthetic.stereo_rig()
    est = Estimator(cams, exts, ImuParameters.create(g=9.81),
                    EstimatorConfig())
    rng = np.random.default_rng(1)
    T_SC7 = [np.concatenate([np.asarray(T.r), np.asarray(T.q)])
             for T in exts]

    pose0 = np.array([0.0, 0, 0, 0, 0, 0, 1.0])
    pose1_gt = np.array([0.25, 0.1, 0.05, 0, 0, 0, 1.0])
    s0 = est.add_state(0.0, np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0))
    est.states[s0].pose = pose0
    est.states[s0].frozen = True
    s1 = est.add_state(0.1, np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0))
    pose1_init = pose1_gt.copy()
    pose1_init[:3] += [0.03, -0.02, 0.01]
    est.states[s1].pose = pose1_init

    def project(cam, pose7, ci, pt):
        T_WC = se3_np.compose7(pose7, T_SC7[ci])
        p_C = se3_np.quat_to_mat(T_WC[3:7]).T @ (pt - T_WC[:3])
        if p_C[2] < 0.1:
            return None
        uv, valid = cam.project(jnp.asarray(p_C))
        return np.asarray(uv) if bool(valid) else None

    # consistent static landmarks
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(25, 3))
    kp = 0
    for pt in pts:
        lid = est.add_landmark(np.concatenate([pt, [1.0]]),
                               initialised=True)
        for sid, p in ((s0, pose0), (s1, pose1_gt)):
            for ci, cam in enumerate(cams):
                uv = project(cam, p, ci, pt)
                if uv is not None:
                    est.add_observation(lid, sid, ci, kp, uv)
                    kp += 1
    # "person" landmarks: moved 0.4 m between the frames, so their two
    # observations are mutually inconsistent
    for pt in rng.uniform([-1, -1, 3], [1, 1, 5], size=(8, 3)):
        lid = est.add_landmark(np.concatenate([pt, [1.0]]),
                               initialised=True)
        if suppress:
            est.landmarks[lid].info_scale = 1e-4
        moved = pt + np.array([0.4, 0.0, 0.0])
        for sid, p, target in ((s0, pose0, pt), (s1, pose1_gt, moved)):
            for ci, cam in enumerate(cams):
                uv = project(cam, p, ci, target)
                if uv is not None:
                    est.add_observation(lid, sid, ci, kp, uv)
                    kp += 1
    est.optimise(iterations=15)
    return np.linalg.norm(est.states[s1].pose[:3] - pose1_gt[:3])


def test_suppressed_landmarks_do_not_drag_the_pose():
    err_plain = _build(suppress=False)
    err_supp = _build(suppress=True)
    # with suppression the inconsistent "person" observations carry
    # ~zero information: the pose recovers ~exactly
    assert err_supp < 2e-3, err_supp
    assert err_supp < err_plain * 0.5, (err_plain, err_supp)


def test_classifier_marks_sky_and_person(tmp_path):
    """End-to-end segmentation -> keypoint class -> suppression, with
    quickly-trained synthetic weights (see models/train_synthetic.py)."""
    import os

    from okvis2_tpu.models.fast_scnn import PERSON_CLASS, SKY_CLASS
    from okvis2_tpu.models import train_synthetic
    from okvis2_tpu.models.suppression import CnnSuppressor

    weights = os.path.join(
        os.path.dirname(train_synthetic.__file__),
        "weights", "fast_scnn_synthetic.npz",
    )
    if os.path.exists(weights):
        supp = CnnSuppressor(weights)
        params = supp.params
    else:
        pytest.skip("no committed synthetic weights")

    from okvis2_tpu.models.fast_scnn import segment_image

    rng = np.random.default_rng(5)
    ok_sky = 0
    total_sky = 0
    for _ in range(4):
        img, lab = train_synthetic.make_scene(rng)
        seg = np.asarray(segment_image(params, jnp.asarray(img)))
        sky_px = lab == SKY_CLASS
        if sky_px.sum():
            ok_sky += (seg[sky_px] == SKY_CLASS).sum()
            total_sky += sky_px.sum()
    assert total_sky > 0
    assert ok_sky / total_sky > 0.7, ok_sky / total_sky
