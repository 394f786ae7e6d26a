"""Run the full VIO pipeline on the synthetic dataset.

Shared by the end-to-end regression test (tests/test_e2e_vio.py) and
bench.py: the system-level fixture the reference lacks (its validation is
manually running okvis_app_synchronous on EuRoC, README.md:179-206).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from okvis2_tpu.cameras.distortion import RadialTangentialDistortion
from okvis2_tpu.cameras.pinhole import PinholeCamera
from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.graph.estimator import EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.dataset import SyntheticDataset
from okvis2_tpu.pipeline.frontend_pipeline import FrontendConfig
from okvis2_tpu.pipeline.slam import SlamSystem
from okvis2_tpu.pipeline.trajectory import ate_rmse
from okvis2_tpu.frontend.detection import DetectionConfig

import jax.numpy as jnp


def small_rig(width=320, height=240, f=250.0, baseline=0.11, dtype=None):
    cam = PinholeCamera.create(
        width, height, f, f, width / 2.0, height / 2.0,
        RadialTangentialDistortion.from_params([-0.05, 0.01, 0.0, 0.0]),
        dtype,
    )
    T_SC0 = Transformation.identity(dtype=cam.focal.dtype)
    T_SC1 = Transformation(
        r=jnp.asarray([baseline, 0.0, 0.0], cam.focal.dtype),
        q=so3.identity_quat(dtype=cam.focal.dtype),
    )
    return (cam, cam), [T_SC0, T_SC1]


def run_synthetic_vio(
    duration: float = 4.0,
    frame_rate: float = 5.0,
    width: int = 320,
    height: int = 240,
    max_keypoints: int = 256,
    estimator_config: Optional[EstimatorConfig] = None,
    imu_noise: float = 0.0,
    verbose: bool = False,
    trajectory: str = "default",
    do_loop_closures: bool = False,
    n_stars: int = 3000,
    pipelined: bool = False,
    rig=None,
    force_min_pending: int = 0,
    dataset: str = "stars",
):
    """Returns dict with ate, trajectories, timing breakdown. `rig`
    optionally injects a (cameras, extrinsics) pair (fisheye /
    multi-camera regression variants) instead of the default stereo
    radtan rig. `force_min_pending` keeps at least that many frames
    in flight in the pipelined loop (test hook: exercises the
    multi-set device-side match append deterministically — on CPU the
    background fetches complete so fast the adaptive lag rarely
    exceeds one frame). `dataset="textured"` swaps the star-field
    renderer for the textured-world one (noise-textured surfaces, true
    occlusion, exposure variation — the realistic-imagery regime)."""
    cams, exts = rig if rig is not None else small_rig(width, height)
    imu_params = ImuParameters.create(g=9.81)
    if estimator_config is None:
        estimator_config = EstimatorConfig(
            window_slots=10,
            landmark_slots=384,
            obs_slots=2048,
            imu_seg_capacity=128,
        )
    fe_cfg = FrontendConfig(
        detection=DetectionConfig(max_keypoints=max_keypoints),
    )
    slam = SlamSystem(cams, exts, imu_params, estimator_config, fe_cfg,
                      do_loop_closures=do_loop_closures,
                      pipelined=pipelined)
    if force_min_pending:
        slam._force_min_pending = force_min_pending
    if dataset == "textured":
        from okvis2_tpu.pipeline.dataset import TexturedWorldDataset

        ds = TexturedWorldDataset(
            cams, exts, imu_params,
            duration=duration, frame_rate=frame_rate,
            imu_noise=imu_noise, trajectory=trajectory,
        )
    else:
        ds = SyntheticDataset(
            cams, exts, imu_params,
            duration=duration, frame_rate=frame_rate,
            imu_noise=imu_noise, trajectory=trajectory, n_stars=n_stars,
        )

    gt_traj = []
    t_start = time.time()
    frame_times = []
    lc_frames = []  # frame indices whose host work ran a loop closure
    n = 0
    for ev in ds.stream():
        if ev[0] == "imu":
            slam.add_imu_measurement(ev[1], ev[2], ev[3])
        else:
            _, t, images, pose_gt = ev
            gt_traj.append((t, pose_gt))
            slam.add_images(t, images)
            lc0 = (slam.loop_backend.num_loop_closures
                   if slam.loop_backend else 0)
            t0 = time.time()
            slam.process_frame()
            frame_times.append(time.time() - t0)
            if (slam.loop_backend is not None
                    and slam.loop_backend.num_loop_closures > lc0):
                lc_frames.append(n)
            n += 1
            if verbose:
                est_pose = slam.estimator.states[
                    slam.estimator.window[-1]
                ].pose
                err = np.linalg.norm(est_pose[:3] - pose_gt[:3])
                print(
                    f"frame {n}: t={t:.2f} err={err:.4f} "
                    f"kf={slam.tracking.is_keyframe} "
                    f"lms={len(slam.estimator.landmarks)} "
                    f"dt={frame_times[-1]:.2f}s",
                    flush=True,
                )

    est_traj = slam.trajectory()
    ate = ate_rmse(est_traj, gt_traj, align=True)
    # also unaligned endpoint drift
    ep_err = float(
        np.linalg.norm(est_traj[-1][1][:3] - gt_traj[-1][1][:3])
    )
    return {
        "ate_rmse": ate,
        "endpoint_error": ep_err,
        "est_traj": est_traj,
        "gt_traj": gt_traj,
        "wall_time": time.time() - t_start,
        "frame_times": frame_times,
        "lc_frames": lc_frames,
        "frames": n,
        "slam": slam,
    }


def run_regression_drive(
    duration: float = 60.0,
    frame_rate: float = 10.0,
    imu_noise: float = 1.0,
    verbose: bool = True,
    **kwargs,
):
    """The long-horizon accuracy fixture (round-2 answer to 'no run ever
    exceeded 8 frames'): a >=600-frame loopy circle drive with noisy IMU
    that exercises the full marginalisation cascade (IMU-frame
    elimination, keyframe -> pose-graph conversion, freezing, window
    drops), place recognition and loop closure. ATE RMSE is tracked
    across rounds in REGRESSION.md. Reference validation analogue:
    running okvis_app_synchronous on EuRoC (README.md:179-206)."""
    if "estimator_config" not in kwargs:
        # long-horizon capacities: the r4 suite measured 547-805 window
        # landmarks (vs the 384 default) and a 2062-row obs overflow
        # under deep lag on the 1200-frame/textured drives — truncation
        # there drops real constraints (the reference's ceres::Problem
        # is uncapped)
        kwargs["estimator_config"] = EstimatorConfig(
            window_slots=10,
            landmark_slots=512,
            obs_slots=4096,
            imu_seg_capacity=128,
        )
    return run_synthetic_vio(
        duration=duration,
        frame_rate=frame_rate,
        imu_noise=imu_noise,
        verbose=verbose,
        trajectory="circle",
        do_loop_closures=True,
        **kwargs,
    )
