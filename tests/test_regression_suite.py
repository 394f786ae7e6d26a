"""Long-horizon accuracy regression suite (tracked in REGRESSION.md).

VERDICT r2 asked for the regression drive to become a *suite* that runs
as tests, not a manual script: four multi-minute drives, each with a
tracked ATE ceiling. They are deselected by default (`pytest.ini`
addopts `-m "not regression"`); run explicitly with

    pytest tests/test_regression_suite.py -m regression -q

Drive specs (rigs, durations, bounds, loop-closure expectations) live
in okvis2_tpu.pipeline.regression_drives, shared with the one-command
re-record tool tools/run_regression_suite.py (advisor r4).

Each drive uses the PIPELINED (Phase-B) frame loop — the flagship
production path — with noisy IMU and loop closures on. Reference
validation analogue: running okvis_app_synchronous on EuRoC
(okvis_apps/src/okvis_app_synchronous.cpp, README.md:179-206).
"""

import numpy as np
import pytest

from okvis2_tpu.pipeline.regression_drives import DRIVES, run_drive

pytestmark = pytest.mark.regression


def _run_and_gate(name):
    spec = DRIVES[name]
    res = run_drive(spec)
    assert res["frames"] == int(spec.duration * 10)
    assert res["ate_rmse"] < spec.ate_bound, res["ate_rmse"]
    if spec.min_loop_closures > 0:
        lc = res["slam"].loop_backend
        assert lc.num_loop_closures >= spec.min_loop_closures, \
            lc.last_verify_info
        if spec.min_verify_margin > 0:
            # fail when acceptance drifts back within 20% of the
            # threshold (the r4 near-miss regime, VERDICT r4 #5)
            assert min(lc.verify_margins) >= spec.min_verify_margin, \
                lc.verify_margins
    return res


def test_circle_1200_frames_loop_closure():
    """120 s / 1200-frame noisy circle: double the tracked horizon."""
    res = _run_and_gate("circle1200")
    # loop-closure frames must not stall the loop: the full-graph solve
    # is dispatched async and the pack is incremental (row caches), so
    # a loop-closure frame stays within 2x the median frame time
    # (reference analogue: ALL of this work runs on the background
    # thread, ViSlamBackend.cpp:1726-1757)
    ft = np.asarray(res["frame_times"])
    med = float(np.median(ft[50:]))
    lc_steady = [i for i in res["lc_frames"] if i >= 50]
    assert lc_steady, "no steady-state loop closure to measure"
    worst = max(float(ft[i]) for i in lc_steady)
    assert worst <= 2.0 * med, (
        f"loop-closure frame {worst*1e3:.1f} ms vs median "
        f"{med*1e3:.1f} ms"
    )


def test_textured_world_circle():
    """30 s noisy circle on the TEXTURED-WORLD renderer (noise-textured
    surfaces, true occlusion boundaries, exposure variation —
    pipeline/dataset.py::TexturedWorldDataset): every other drive in
    this suite, and every accuracy number before round 4, ran on
    star-field imagery; this drive tracks ATE in the descriptor regime
    real sequences live in (SURVEY.md §7 hard part (d))."""
    _run_and_gate("textured")


def test_fisheye_equidistant_circle():
    """30 s equidistant-fisheye variant (TUM-VI-style optics,
    config/tumvi_slam_512.yaml:10): the distortion model, epipolar
    gating on unit bearings and descriptor sampling must hold up under
    heavy radial distortion."""
    _run_and_gate("fisheye")


def test_four_camera_circle():
    """30 s four-camera variant (two stereo pairs, one yawed 25 deg):
    all-pairs static stereo + rig-joint RANSAC over a long horizon."""
    _run_and_gate("fourcam")
