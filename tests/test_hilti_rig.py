"""Hilti-style 7-camera drive with online extrinsics calibration.

Reference: config/hilti_challenge_2022.yaml — 7 equidistant cameras
with `online_calibration: do_extrinsics: true`. This exercises the
paths a stereo rig never touches at full rig width: all-pairs stereo
initialisation (matchStereo over all overlapping pairs,
Frontend.cpp:1981-2150), rig-joint absolute-pose RANSAC over 7
cameras' correspondences, and variable T_SC blocks with priors during
a live drive (do_extrinsics plumbing, Parameters.hpp:57-100).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from okvis2_tpu.cameras.distortion import EquidistantDistortion
from okvis2_tpu.cameras.pinhole import PinholeCamera
from okvis2_tpu.core import se3_np, so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.frontend.detection import DetectionConfig
from okvis2_tpu.graph.estimator import EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.dataset import SyntheticDataset
from okvis2_tpu.pipeline.frontend_pipeline import FrontendConfig
from okvis2_tpu.pipeline.slam import SlamSystem


def _T(r, q):
    return Transformation(r=jnp.asarray(r, jnp.float64),
                          q=jnp.asarray(q, jnp.float64))


@pytest.fixture(scope="module")
def seven_cam_rig():
    """7 equidistant cameras: forward stereo pair, left/right yawed
    pairs, one upward camera — the Hilti topology at test scale."""
    cam = PinholeCamera.create(
        320, 240, 220.0, 220.0, 160.0, 120.0,
        EquidistantDistortion.from_params([-0.04, 0.01, -0.002, 0.0]),
    )
    idq = so3.identity_quat(dtype=jnp.float64)

    def yawq(a):
        return [0.0, np.sin(a / 2), 0.0, np.cos(a / 2)]

    def pitchq(a):
        return [np.sin(a / 2), 0.0, 0.0, np.cos(a / 2)]

    yl, yr = -0.44, 0.44  # ~25 degrees
    exts = [
        _T([0.0, 0.0, 0.0], idq),
        _T([0.11, 0.0, 0.0], idq),
        _T([-0.08, 0.0, 0.0], yawq(yl)),
        _T([-0.19, 0.0, 0.0], yawq(yl)),
        _T([0.30, 0.0, 0.0], yawq(yr)),
        _T([0.41, 0.0, 0.0], yawq(yr)),
        _T([0.15, -0.06, 0.0], pitchq(-0.5)),  # tilted up
    ]
    return tuple([cam] * 7), exts


def test_hilti_config_parses_all_cameras():
    """configs/hilti_challenge_2022_onlinecalib.yaml: all equidistant
    cameras + online extrinsics calibration reach the parameter structs
    (ViParametersReader role). The reference Hilti 2022 config carries
    5 cameras (front stereo pair, left, right, up —
    /root/reference/config/hilti_challenge_2022.yaml)."""
    from okvis2_tpu.cameras.distortion import EquidistantDistortion
    from okvis2_tpu.config.parameters import read_config_file

    p = read_config_file("configs/hilti_challenge_2022_onlinecalib.yaml")
    assert len(p.cameras) == 5
    assert all(
        isinstance(c.camera.distortion, EquidistantDistortion)
        for c in p.cameras
    )
    assert p.camera_rig.online_extrinsics


@pytest.mark.slow
def test_seven_camera_online_calibration_drive(seven_cam_rig):
    cams, exts_true = seven_cam_rig
    imu = ImuParameters.create(g=9.81)
    ds = SyntheticDataset(cams, exts_true, imu, n_stars=4000, seed=17,
                          duration=2.0, frame_rate=4.0, imu_rate=100.0)

    # hand the system PERTURBED extrinsics (~1.5 cm, ~0.6 deg on three
    # cameras); online calibration must pull them back toward truth
    rng = np.random.default_rng(3)
    exts_given = []
    for ci, T in enumerate(exts_true):
        r = np.asarray(T.r, np.float64).copy()
        q = np.asarray(T.q, np.float64).copy()
        if ci in (1, 3, 5):
            r += rng.uniform(-0.015, 0.015, 3)
            dq = np.concatenate([rng.uniform(-0.005, 0.005, 3), [1.0]])
            q = se3_np.quat_mul(q, dq / np.linalg.norm(dq))
        exts_given.append(_T(r, q))

    slam = SlamSystem(
        cams, exts_given, imu,
        EstimatorConfig(window_slots=10, landmark_slots=512,
                        obs_slots=4096, imu_seg_capacity=64,
                        online_extrinsics=True,
                        ext_sigma_r=0.05, ext_sigma_alpha=0.05),
        FrontendConfig(detection=DetectionConfig(max_keypoints=64),
                       map_match_capacity=512),
    )
    pairs = slam.frontend._overlapping_pairs()
    assert len(pairs) >= 3, pairs  # all-pairs stereo has real work

    def ext_err():
        errs = []
        for ci in (1, 3, 5):
            T7 = slam.estimator.T_SC[ci]
            r_t = np.asarray(exts_true[ci].r, np.float64)
            errs.append(np.linalg.norm(T7[:3] - r_t))
        return float(np.mean(errs))

    err0 = ext_err()
    for ev in ds.stream():
        if ev[0] == "imu":
            slam.add_imu_measurement(ev[1], ev[2], ev[3])
        else:
            slam.add_images(ev[1], ev[2])
            slam.process_frame()
    est = slam.estimator
    est.apply_pending_solve()
    assert slam.frames_processed == 8

    # landmarks were initialised through MANY cameras (all-pairs stereo
    # + 7-camera rig association actually fired)
    cams_hosting = set()
    for lm in est.landmarks.values():
        for (_s, ci, _kp) in lm.obs:
            cams_hosting.add(ci)
    assert len(cams_hosting) >= 6, cams_hosting

    # online calibration moved the perturbed extrinsics toward truth
    err1 = ext_err()
    assert err1 < err0, (err0, err1)

    # trajectory stayed sane under the miscalibrated start
    sid = est.window[-1]
    gt = ds.ground_truth(est.states[sid].t)
    assert np.linalg.norm(est.states[sid].pose[:3] - gt[:3]) < 0.2
