"""Multi-session map reuse: save a session, load it fresh, relocalise.

Reference: Component save/load + Frontend::loadComponent
(okvis_ceres/src/Component.cpp, okvis_frontend/src/Frontend.cpp:180-218)
— a later session matches against the loaded landmarks. This guards the
device-resident-table path: loaded descriptors must enter the matching
table and survive landmark cleanup until re-observed."""

import numpy as np

from okvis2_tpu.frontend.detection import DetectionConfig
from okvis2_tpu.graph.estimator import EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.dataset import SyntheticDataset
from okvis2_tpu.pipeline.frontend_pipeline import FrontendConfig
from okvis2_tpu.pipeline.slam import SlamSystem
from okvis2_tpu.pipeline.synthetic_run import small_rig


def _make_slam(cams, exts, imu):
    return SlamSystem(
        cams, exts, imu,
        EstimatorConfig(window_slots=8, landmark_slots=256,
                        obs_slots=1024, imu_seg_capacity=64),
        FrontendConfig(detection=DetectionConfig(max_keypoints=128),
                       map_match_capacity=256),
    )


def test_session_map_relocalises(tmp_path):
    cams, exts = small_rig(width=320, height=240)
    imu = ImuParameters.create(g=9.81)
    ds = SyntheticDataset(cams, exts, imu, n_stars=2000, seed=11,
                          duration=1.0, frame_rate=4.0)

    # session 1: a short drive builds landmarks, save the map
    slam1 = _make_slam(cams, exts, imu)
    for ev in ds.stream():
        if ev[0] == "imu":
            slam1.add_imu_measurement(ev[1], ev[2], ev[3])
        else:
            slam1.add_images(ev[1], ev[2])
            slam1.process_frame()
    n_lm1 = len(slam1.estimator.landmarks)
    assert n_lm1 > 30
    path = str(tmp_path / "session1.map")
    slam1.save_map(path)

    # session 2: fresh system, load map, relocalise at the start pose
    slam2 = _make_slam(cams, exts, imu)
    n_loaded = slam2.load_map(path)
    assert n_loaded > 30
    # loaded landmarks are in the device table
    assert len(slam2.frontend.table.slot_of) > 30

    est = slam2.estimator
    pose0 = ds.ground_truth(0.0)
    sid = est.add_state(0.0, np.zeros((0, 3)), np.zeros((0, 3)),
                        np.zeros(0))
    est.states[sid].pose = pose0
    imgs = ds.render(pose0)
    frames, info = slam2.frontend.associate_frame(est, imgs, sid, pose0)
    assert info["num_matched"] > 10, info

    # cleanup must not purge the loaded-but-unobserved map points
    est.clean_unobserved_landmarks()
    assert len(est.landmarks) > 30


def test_depth_aided_landmark_init():
    """RGBD depth-aided initialisation (RealsenseRgbd role): keypoints
    with valid aligned depth become landmarks at ray * depth."""
    cams, exts = small_rig(width=320, height=240)
    imu = ImuParameters.create(g=9.81)
    ds = SyntheticDataset(cams, exts, imu, n_stars=2000, seed=11)
    slam = _make_slam(cams, exts, imu)
    est = slam.estimator
    pose0 = np.array([0.0, 0, 0, 0, 0, 0, 1.0])
    imgs = ds.render(pose0)
    sid = est.add_state(0.0, np.zeros((0, 3)), np.zeros((0, 3)),
                        np.zeros(0))
    est.states[sid].pose = pose0
    frames, _ = slam.frontend.associate_frame(est, imgs, sid, pose0)
    H, W = imgs[0].shape
    slam.add_depth_image(0.0, np.full((H, W), 4.0))
    n = slam._init_landmarks_from_depth(frames, sid)
    assert n > 10
    # landmarks sit at ~4 m camera depth
    depths = [
        lm.hp_W[2] / lm.hp_W[3]
        for lm in est.landmarks.values()
        if any(s == sid for (s, _, _) in lm.obs)
    ]
    assert np.all(np.asarray(depths) > 3.0)
