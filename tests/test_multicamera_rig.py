"""4-camera rig drive: all-pairs stereo init + rig-joint RANSAC.

The Hilti-style configuration (reference config/hilti_challenge_2022*,
7 equidistant cameras with online calibration) exercises code paths a
stereo rig never touches: overlap-driven stereo initialisation across
MULTIPLE camera pairs (matchStereo over all overlapping pairs,
Frontend.cpp:1981-2150) and absolute-pose RANSAC with correspondences
from more than two cameras (FrameNoncentralAbsoluteAdapter role). This
fixture builds a 4-camera rig (two stereo pairs, the second yawed 25
degrees) and drives the full frontend + estimator over a short synthetic
sequence."""

import numpy as np
import pytest

import jax.numpy as jnp

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.frontend.detection import DetectionConfig
from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.dataset import SyntheticDataset
from okvis2_tpu.pipeline.frontend_pipeline import Frontend, FrontendConfig
from okvis2_tpu.pipeline.slam import SlamSystem
from okvis2_tpu.cameras.distortion import RadialTangentialDistortion
from okvis2_tpu.cameras.pinhole import PinholeCamera


@pytest.fixture(scope="module")
def four_cam_rig():
    cam = PinholeCamera.create(
        320, 240, 250.0, 250.0, 160.0, 120.0,
        RadialTangentialDistortion.from_params([-0.05, 0.01, 0.0, 0.0]),
    )
    idq = so3.identity_quat(dtype=jnp.float64)
    yaw = 0.44  # ~25 degrees about y: still overlaps the forward pair
    q_yaw = jnp.asarray([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
    exts = [
        Transformation(r=jnp.asarray([0.0, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.11, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.2, 0.0, 0.0]), q=q_yaw),
        Transformation(r=jnp.asarray([0.31, 0.0, 0.0]), q=q_yaw),
    ]
    return (cam, cam, cam, cam), exts


def test_four_camera_drive(four_cam_rig):
    cams, exts = four_cam_rig
    imu = ImuParameters.create(g=9.81)
    ds = SyntheticDataset(cams, exts, imu, n_stars=3000, seed=13,
                          duration=1.0, frame_rate=4.0, imu_rate=100.0)
    slam = SlamSystem(
        cams, exts, imu,
        EstimatorConfig(window_slots=8, landmark_slots=384,
                        obs_slots=2048, imu_seg_capacity=64),
        FrontendConfig(detection=DetectionConfig(max_keypoints=96),
                       map_match_capacity=384),
    )
    # the rig has overlapping pairs beyond (0,1)
    pairs = slam.frontend._overlapping_pairs()
    assert (0, 1) in pairs and (2, 3) in pairs, pairs

    for ev in ds.stream():
        if ev[0] == "imu":
            slam.add_imu_measurement(ev[1], ev[2], ev[3])
        else:
            slam.add_images(ev[1], ev[2])
            slam.process_frame()
    est = slam.estimator
    slam.estimator.apply_pending_solve()
    assert slam.frames_processed == 4

    # landmarks were initialised from BOTH stereo pairs
    cams_hosting = set()
    for lm in est.landmarks.values():
        for (_s, ci, _kp) in lm.obs:
            cams_hosting.add(ci)
    assert {0, 1, 2, 3} <= cams_hosting, cams_hosting

    # the last frame matched the map through >= 3 cameras (rig-joint
    # association) and the pose estimate stayed sane
    sid = est.window[-1]
    cams_matched = {ci for (_l, ci, _k) in est.obs_of_state(sid)}
    assert len(cams_matched) >= 3, cams_matched
    gt = ds.ground_truth(est.states[sid].t)
    assert np.linalg.norm(est.states[sid].pose[:3] - gt[:3]) < 0.15
