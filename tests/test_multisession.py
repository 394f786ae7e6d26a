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


def test_relocalisation_from_unknown_pose(tmp_path):
    """Multi-session place recognition (Frontend.cpp:180-218, 674-749):
    a loaded component gets its own queryable database, so a fresh
    session relocalises even when its pose estimate is WRONG —
    projection-gated matching alone cannot (it needs the prediction to
    be roughly right)."""
    from okvis2_tpu.graph.estimator import EstimatorConfig
    from okvis2_tpu.pipeline.full_graph import LoopClosureConfig

    cams, exts = small_rig(width=320, height=240)
    imu = ImuParameters.create(g=9.81)
    ds = SyntheticDataset(cams, exts, imu, n_stars=2000, seed=11,
                          duration=1.0, frame_rate=4.0)

    slam1 = _make_slam(cams, exts, imu)
    for ev in ds.stream():
        if ev[0] == "imu":
            slam1.add_imu_measurement(ev[1], ev[2], ev[3])
        else:
            slam1.add_images(ev[1], ev[2])
            slam1.process_frame()
    path = str(tmp_path / "session1.map")
    slam1.save_map(path)

    # session 2 with loop closures on: the component DB loads
    slam2 = SlamSystem(
        cams, exts, imu,
        EstimatorConfig(window_slots=8, landmark_slots=256,
                        obs_slots=1024, imu_seg_capacity=64),
        FrontendConfig(detection=DetectionConfig(max_keypoints=128),
                       map_match_capacity=256),
        do_loop_closures=True,
        loop_closure_config=LoopClosureConfig(min_inliers=8),
    )
    n_loaded = slam2.load_map(path)
    assert n_loaded > 30
    assert slam2.loop_backend.has_components()

    est = slam2.estimator
    true_pose = ds.ground_truth(0.2)
    # way off: 3 m translation + 60 deg yaw — projections land nowhere
    # near their gates
    from okvis2_tpu.core import se3_np
    ang = np.deg2rad(60.0)
    d_pose = np.array([3.0, -1.5, 0.5,
                       0.0, np.sin(ang / 2), 0.0, np.cos(ang / 2)])
    wrong_pose = se3_np.compose7(d_pose, true_pose)
    sid = est.add_state(0.0, np.zeros((0, 3)), np.zeros((0, 3)),
                        np.zeros(0))
    est.states[sid].pose = wrong_pose.copy()
    imgs = ds.render(true_pose)  # camera actually AT the true pose
    frames, info = slam2.frontend.associate_frame(
        est, imgs, sid, wrong_pose
    )
    # projection-gated matching fails from the wrong prediction
    assert info["num_matched"] < 5, info
    slam2.frontend.fetch_signs(frames)

    v = slam2.loop_backend.relocalise(est, sid, frames)
    assert v is not None, slam2.loop_backend.last_verify_info
    # the verified pose is the TRUE one, despite the wrong prediction
    assert np.linalg.norm(v["T_WS7"][:3] - true_pose[:3]) < 0.25, v["T_WS7"]

    slam2._apply_relocalisation(est, sid, frames, v)
    assert np.linalg.norm(est.states[sid].pose[:3] - true_pose[:3]) < 0.25
    # matched old-map landmarks became observations of this frame
    n_obs = len(est.obs_of_state(sid))
    assert n_obs >= 8, n_obs
