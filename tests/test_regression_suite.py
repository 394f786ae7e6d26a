"""Long-horizon accuracy regression suite (tracked in REGRESSION.md).

VERDICT r2 asked for the regression drive to become a *suite* that runs
as tests, not a manual script: three multi-minute drives, each with a
tracked ATE ceiling. They are deselected by default (`pytest.ini`
addopts `-m "not regression"`); run explicitly with

    pytest tests/test_regression_suite.py -m regression -q

Each drive uses the PIPELINED (Phase-B) frame loop — the flagship
production path — with noisy IMU and loop closures on. Reference
validation analogue: running okvis_app_synchronous on EuRoC
(okvis_apps/src/okvis_app_synchronous.cpp, README.md:179-206).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from okvis2_tpu.cameras.distortion import EquidistantDistortion
from okvis2_tpu.cameras.pinhole import PinholeCamera
from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.pipeline.synthetic_run import run_regression_drive

pytestmark = pytest.mark.regression


def test_circle_1200_frames_loop_closure():
    """120 s / 1200-frame noisy circle: double the tracked horizon.
    Ceiling from REGRESSION.md r2 (0.029 m at 600 frames) with slack
    for the longer pre-loop drift accumulation."""
    res = run_regression_drive(duration=120.0, pipelined=True)
    assert res["frames"] == 1200
    assert res["ate_rmse"] < 0.08, res["ate_rmse"]
    lc = res["slam"].loop_backend
    assert lc.num_loop_closures >= 1, lc.last_verify_info
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
    res = run_regression_drive(
        duration=30.0, pipelined=True, dataset="textured"
    )
    assert res["frames"] == 300
    assert res["ate_rmse"] < 0.10, res["ate_rmse"]


def test_fisheye_equidistant_circle():
    """30 s equidistant-fisheye variant (TUM-VI-style optics,
    config/tumvi_slam_512.yaml:10): the distortion model, epipolar
    gating on unit bearings and descriptor sampling must hold up under
    heavy radial distortion."""
    cam = PinholeCamera.create(
        320, 240, 190.0, 190.0, 160.0, 120.0,
        EquidistantDistortion.from_params([-0.03, 0.008, -0.002, 0.0]),
    )
    idq = so3.identity_quat(dtype=jnp.float64)
    exts = [
        Transformation(r=jnp.asarray([0.0, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.11, 0.0, 0.0]), q=idq),
    ]
    res = run_regression_drive(
        duration=30.0, pipelined=True, rig=((cam, cam), exts)
    )
    assert res["frames"] == 300
    assert res["ate_rmse"] < 0.08, res["ate_rmse"]


def test_four_camera_circle():
    """30 s four-camera variant (two stereo pairs, one yawed 25 deg):
    all-pairs static stereo + rig-joint RANSAC over a long horizon."""
    cam = PinholeCamera.create(
        320, 240, 250.0, 250.0, 160.0, 120.0,
    )
    idq = so3.identity_quat(dtype=jnp.float64)
    yaw = 0.44
    q_yaw = jnp.asarray([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
    exts = [
        Transformation(r=jnp.asarray([0.0, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.11, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.2, 0.0, 0.0]), q=q_yaw),
        Transformation(r=jnp.asarray([0.31, 0.0, 0.0]), q=q_yaw),
    ]
    res = run_regression_drive(
        duration=30.0, pipelined=True,
        rig=((cam, cam, cam, cam), exts),
    )
    assert res["frames"] == 300
    assert res["ate_rmse"] < 0.08, res["ate_rmse"]
