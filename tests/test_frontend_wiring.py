"""Frontend wiring: rotation-only veto + gravity-aligned description.

Both are reference behaviours that previously existed only as dead code:
- motion stereo must NOT triangulate when a pure rotation explains the
  keyframe<->current matches (runRansac2d2d rotation-only,
  Frontend.cpp:2311-2334);
- BRISK-2 gravity-aligned extraction direction (Frontend.cpp:231-251)
  keeps descriptors matchable under camera roll.
"""

import dataclasses

import numpy as np
import pytest

from okvis2_tpu.core import se3_np
from okvis2_tpu.frontend.detection import DetectionConfig
from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.dataset import SyntheticDataset
from okvis2_tpu.pipeline.frontend_pipeline import Frontend, FrontendConfig
from okvis2_tpu.pipeline.synthetic_run import small_rig


@pytest.fixture(scope="module")
def world():
    cams, exts = small_rig(width=320, height=240)
    imu = ImuParameters.create(g=9.81)
    ds = SyntheticDataset(cams, exts, imu, n_stars=2000, seed=7)
    return cams, exts, imu, ds


def _run_frame(fe, est, ds, pose7, t, keyframe=False):
    imgs = ds.render(np.asarray(pose7))
    sid = est.add_state(t, np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0))
    est.states[sid].pose = np.asarray(pose7, np.float64)
    frames, info = fe.associate_frame(est, imgs, sid, np.asarray(pose7))
    if keyframe:
        est.set_keyframe(sid, True)
        fe.last_keyframe_id = sid
        fe.fetch_signs(frames)
        fe.match_stereo(est, frames, sid)
        fe.remember_keyframe_frames(sid, frames)
    return sid, frames, info


def test_rotation_only_veto_blocks_motion_stereo(world):
    cams, exts, imu, ds = world
    cfg = FrontendConfig(detection=DetectionConfig(max_keypoints=128),
                         map_match_capacity=256)
    fe = Frontend(cams, exts, cfg)
    est = Estimator(cams, exts, imu, EstimatorConfig())
    p0 = np.array([0.0, 0, 0, 0, 0, 0, 1.0])
    _run_frame(fe, est, ds, p0, 0.0, keyframe=True)

    # pure rotation: yaw by ~4 degrees — parallax is illusory
    ang = np.deg2rad(4.0)
    p_rot = np.array([0, 0, 0, 0.0, np.sin(ang / 2), 0.0, np.cos(ang / 2)])
    _, _, info_rot = _run_frame(fe, est, ds, p_rot, 0.1)
    assert info_rot["rotation_only_frac"] > 0.9, info_rot
    assert info_rot["num_motion_stereo"] == 0, info_rot

    # genuine translation: parallax is real, landmarks appear
    fe2 = Frontend(cams, exts, cfg)
    est2 = Estimator(cams, exts, imu, EstimatorConfig())
    _run_frame(fe2, est2, ds, p0, 0.0, keyframe=True)
    p_tr = np.array([0.25, 0.0, 0.0, 0, 0, 0, 1.0])
    _, _, info_tr = _run_frame(fe2, est2, ds, p_tr, 0.1)
    assert info_tr["rotation_only_frac"] < 0.9, info_tr
    assert info_tr["num_motion_stereo"] > 0, info_tr


def test_gravity_aligned_description_matches_under_roll(world):
    cams, exts, imu, ds = world
    cfg = FrontendConfig(
        detection=DetectionConfig(max_keypoints=128),
        map_match_capacity=256,
        gravity_aligned_description=True,
    )
    fe = Frontend(cams, exts, cfg)
    est = Estimator(cams, exts, imu, EstimatorConfig())
    p0 = np.array([0.0, 0, 0, 0, 0, 0, 1.0])
    sid0, frames0, _ = _run_frame(fe, est, ds, p0, 0.0, keyframe=True)
    n_lm = len(est.landmarks)
    assert n_lm > 10  # stereo init worked with gravity-aligned descriptors

    # roll the camera 20 degrees about its optical axis and revisit:
    # gravity-aligned extraction keeps map matches alive
    ang = np.deg2rad(20.0)
    p_roll = np.array([0.02, 0.01, 0.0,
                       0.0, 0.0, np.sin(ang / 2), np.cos(ang / 2)])
    _, _, info = _run_frame(fe, est, ds, p_roll, 0.1)
    assert info["num_matched"] > 10, info


def test_motion_stereo_multi_keyframe_coverage(world):
    """Frontend.cpp:1742-1768: motion stereo ranks ALL window keyframes
    by overlap and matches each. A sideways revisit whose best-overlap
    keyframe is NOT the most recent one initialises more landmarks with
    K=3 than with K=1 (last-keyframe-only)."""
    cams, exts, imu, ds = world

    def run(K):
        cfg = FrontendConfig(
            detection=DetectionConfig(max_keypoints=128),
            map_match_capacity=256,
            motion_stereo_keyframes=K,
            # the veto is off here: after two stereo-initialised
            # keyframes only a handful of free pairs feed the Wahba fit,
            # making rot_frac uninformative; this test targets coverage
            rotation_only_veto=1.1,
        )
        fe = Frontend(cams, exts, cfg)
        est = Estimator(cams, exts, imu, EstimatorConfig())
        # kf A and kf B are laterally displaced, each sharing a
        # DIFFERENT part of the current mid-point view: matching only
        # the single best-overlap keyframe leaves the other half's
        # keypoints without a triangulation partner
        p_A = np.array([0.0, 0, 0, 0, 0, 0, 1.0])
        p_B = np.array([1.4, 0, 0, 0, 0, 0, 1.0])
        _run_frame(fe, est, ds, p_A, 0.0, keyframe=True)
        _run_frame(fe, est, ds, p_B, 0.5, keyframe=True)
        p_cur = np.array([0.7, 0.05, 0.0, 0, 0, 0, 1.0])
        _, _, info = _run_frame(fe, est, ds, p_cur, 1.0)
        return info

    info_k1 = run(1)
    info_k3 = run(3)
    assert info_k3["num_motion_stereo"] > info_k1["num_motion_stereo"], (
        info_k1, info_k3
    )
