"""Shared drive specs for the tracked regression suite.

Single source of truth for the rigs, durations, ATE bounds and
loop-closure expectations used by BOTH tests/test_regression_suite.py
(the gating tests) and tools/run_regression_suite.py (the one-command
re-record tool) — advisor r4: hand-duplicated specs silently
desynchronise. Reference validation analogue: running
okvis_app_synchronous on EuRoC and evaluating ATE
(okvis_apps/src/okvis_app_synchronous.cpp, README.md:179-206).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


@dataclasses.dataclass(frozen=True)
class DriveSpec:
    name: str
    duration: float  # seconds at 10 fps -> frames = duration * 10
    ate_bound: float  # tracked ATE RMSE ceiling [m]
    min_loop_closures: int  # expected verified closures (0: not gated)
    # verify-headroom gate (VERDICT r4 #5): every accepted closure's
    # inlier ratio must exceed min_inlier_ratio by this factor, so the
    # suite FAILS when acceptance drifts back within 20% of the
    # threshold (the r4 near-miss regime) instead of silently passing
    min_verify_margin: float = 0.0
    dataset: Optional[str] = None  # None: star-field; "textured"
    rig_builder: Optional[Callable] = None  # () -> ((cams...), [exts...])


def _rig_fisheye():
    import jax.numpy as jnp

    from okvis2_tpu.cameras.distortion import EquidistantDistortion
    from okvis2_tpu.cameras.pinhole import PinholeCamera
    from okvis2_tpu.core import so3
    from okvis2_tpu.core.se3 import Transformation

    cam = PinholeCamera.create(
        320, 240, 190.0, 190.0, 160.0, 120.0,
        EquidistantDistortion.from_params([-0.03, 0.008, -0.002, 0.0]),
    )
    idq = so3.identity_quat(dtype=jnp.float64)
    exts = [
        Transformation(r=jnp.asarray([0.0, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.11, 0.0, 0.0]), q=idq),
    ]
    return (cam, cam), exts


def _rig_fourcam():
    import numpy as np

    import jax.numpy as jnp

    from okvis2_tpu.cameras.pinhole import PinholeCamera
    from okvis2_tpu.core import so3
    from okvis2_tpu.core.se3 import Transformation

    cam = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)
    idq = so3.identity_quat(dtype=jnp.float64)
    yaw = 0.44
    q_yaw = jnp.asarray([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
    exts = [
        Transformation(r=jnp.asarray([0.0, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.11, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.2, 0.0, 0.0]), q=q_yaw),
        Transformation(r=jnp.asarray([0.31, 0.0, 0.0]), q=q_yaw),
    ]
    return (cam, cam, cam, cam), exts


DRIVES = {
    # 120 s / 1200-frame noisy circle: double the tracked horizon.
    # Ceiling from REGRESSION.md r2 (0.029 m at 600 frames) with slack
    # for the longer pre-loop drift accumulation. A verified loop
    # closure is part of the pass criterion (advisor r4: a run with 0
    # closures — the exact round-4 regression symptom — must not PASS).
    "circle1200": DriveSpec("circle1200", 120.0, 0.08,
                            min_loop_closures=1,
                            min_verify_margin=1.2),
    # 30 s noisy circle on the TEXTURED-WORLD renderer — tracks ATE in
    # the descriptor regime real sequences live in (SURVEY.md §7 (d)).
    "textured": DriveSpec("textured", 30.0, 0.10, min_loop_closures=0,
                          dataset="textured"),
    # 30 s equidistant-fisheye variant (TUM-VI-style optics).
    "fisheye": DriveSpec("fisheye", 30.0, 0.08, min_loop_closures=0,
                         rig_builder=_rig_fisheye),
    # 30 s four-camera variant (two stereo pairs, one yawed 25 deg).
    "fourcam": DriveSpec("fourcam", 30.0, 0.08, min_loop_closures=0,
                         rig_builder=_rig_fourcam),
}


def run_drive(spec: DriveSpec, verbose: bool = False):
    """Run one suite drive; returns the run_regression_drive result."""
    from okvis2_tpu.pipeline.synthetic_run import run_regression_drive

    kw = dict(duration=spec.duration, pipelined=True, verbose=verbose)
    if spec.dataset:
        kw["dataset"] = spec.dataset
    if spec.rig_builder is not None:
        kw["rig"] = spec.rig_builder()
    return run_regression_drive(**kw)
