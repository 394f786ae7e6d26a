"""Correction-epoch machinery for in-flight solves (pipelined loop).

In the pipelined loop a realtime solve crosses the link in the
background and applies 1-2 frames after dispatch. If a pose-rewriting
event (loop-closure drift distribution, full-graph apply,
relocalisation, session restart) lands in between, the stale solve
carries PRE-correction poses. SlamSystem records a correction epoch per
event (`_note_pose_correction`); at finish time the net correction
since the solve's dispatch epoch is either composed onto the solve
(rigid rewrite: relocalisation) or the solve is skipped (non-rigid:
drift distribution / full-graph apply). Reference analogue: the
background-thread synchronisation in ViSlamBackend/ThreadedSlam —
okvis2's optimisation thread re-bases its results onto the corrected
graph before publishing (ThreadedSlam.cpp:466-469).
"""

import time
import types

import numpy as np
import pytest

from okvis2_tpu.core import se3_np
from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.slam import SlamSystem
from okvis2_tpu.pipeline.synthetic_run import small_rig


def _dummy(log):
    return types.SimpleNamespace(_corr_log=list(log))


def _rand_T7(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return np.concatenate([rng.standard_normal(3), q])


def test_net_correction_since_composition():
    rng = np.random.default_rng(0)
    T1, T2 = _rand_T7(rng), _rand_T7(rng)

    # nothing happened since the dispatch epoch
    assert SlamSystem._net_correction_since(_dummy([]), 0) is None
    assert SlamSystem._net_correction_since(_dummy([T1]), 1) is None

    # one rigid correction -> returned as-is
    out = SlamSystem._net_correction_since(_dummy([T1]), 0)
    assert np.allclose(out, T1)

    # two rigid corrections -> left-composed in event order
    out = SlamSystem._net_correction_since(_dummy([T1, T2]), 0)
    assert np.allclose(out, se3_np.compose7(T2, T1))

    # any non-rigid rewrite poisons the span -> skip sentinel
    skip = SlamSystem._CORR_SKIP
    assert SlamSystem._net_correction_since(_dummy([None]), 0) is skip
    assert SlamSystem._net_correction_since(_dummy([T1, None, T2]), 0) \
        is skip
    # ... but only events AFTER the dispatch epoch count
    out = SlamSystem._net_correction_since(_dummy([None, T2]), 1)
    assert np.allclose(out, T2)


@pytest.fixture
def small_est():
    cams, exts = small_rig()
    cfg = EstimatorConfig(window_slots=4, landmark_slots=8,
                          obs_slots=64, imu_seg_capacity=16)
    est = Estimator(cams, exts, ImuParameters.create(g=9.81), cfg)
    return est


def _flat_solve(est, pose7_by_slot, sb_by_slot, lms, n_obs=3.0):
    """Hand-build a solve flat output at est's capacities."""
    c = est.cfg
    S, L, NC = c.window_slots, c.landmark_slots, len(est.cameras)
    pose = np.zeros((S, 7)); pose[:, 6] = 1.0
    sb = np.zeros((S, 9))
    for i, p in pose7_by_slot.items():
        pose[i] = p
    for i, v in sb_by_slot.items():
        sb[i] = v
    lm = np.zeros((L, 4))
    for i, hp in enumerate(lms):
        lm[i] = hp
    ext = np.concatenate([
        np.concatenate([np.zeros(3), [0, 0, 0, 1]]) for _ in range(NC)
    ]).reshape(NC, 7)
    stats = np.array([1.0, 0.5, 3.0, 1e-3, n_obs])
    return np.concatenate([
        pose.ravel(), sb.ravel(), lm.ravel(), ext.ravel(), stats
    ])


def test_apply_solved_flat_composes_rigid_correction(small_est):
    est = small_est
    rng = np.random.default_rng(1)
    sid = est.add_state(0.0, np.zeros((0, 3)), np.zeros((0, 3)),
                        np.zeros(0))
    lid = est.add_landmark([1.0, 2.0, 5.0, 1.0], initialised=True)

    pose_solved = _rand_T7(rng)
    vel_solved = rng.standard_normal(9)
    hp_solved = np.array([0.5, -1.0, 4.0, 1.0])
    flat = _flat_solve(est, {0: pose_solved}, {0: vel_solved},
                       [hp_solved])

    T_corr = _rand_T7(rng)
    est._solve_t0 = time.perf_counter()
    est.apply_solved_flat(flat, {sid: 0}, [lid], T_corr7=T_corr)

    rec = est.states[sid]
    want_pose = se3_np.compose7(T_corr, pose_solved)
    assert np.allclose(rec.pose, want_pose, atol=1e-12), (
        rec.pose, want_pose
    )
    R = se3_np.quat_to_mat(T_corr[3:7])
    assert np.allclose(rec.speed_bias[:3], R @ vel_solved[:3])
    # biases are body-frame: the world-frame correction must not touch
    assert np.allclose(rec.speed_bias[3:], vel_solved[3:])
    want_hp = np.concatenate([
        R @ hp_solved[:3] + T_corr[:3] * hp_solved[3], hp_solved[3:4]
    ])
    assert np.allclose(est.landmarks[lid].hp_W, want_hp, atol=1e-12)


def test_apply_solved_flat_warns_on_obs_append_overflow(small_est,
                                                        caplog):
    import logging

    from okvis2_tpu.graph import estimator as est_mod

    est = small_est
    sid = est.add_state(0.0, np.zeros((0, 3)), np.zeros((0, 3)),
                        np.zeros(0))
    flat = _flat_solve(est, {}, {}, [],
                       n_obs=float(est.cfg.obs_slots + 8))
    est._solve_t0 = time.perf_counter()
    est_mod._warn_counts.pop("obs_append", None)  # fresh rate limiter
    with caplog.at_level(logging.WARNING, logger="okvis2_tpu"):
        est.apply_solved_flat(flat, {sid: 0}, [])
    assert any("obs" in r.message for r in caplog.records), \
        caplog.records
