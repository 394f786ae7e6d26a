"""App-level integration: EuRoC folder -> app_synchronous -> CSV + map.

End-to-end through the USER-facing surfaces (the reference's validation
path, okvis_apps/src/okvis_app_synchronous.cpp): render a synthetic
sequence, record it into EuRoC folder format with DatasetWriter, write a
rig YAML in the reference schema, then run the CLI main with --final-ba
and --save-map and check the outputs."""

import os

import numpy as np
import pytest

from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.dataset import DatasetWriter, SyntheticDataset
from okvis2_tpu.pipeline.synthetic_run import small_rig


def _write_config(path, cams, exts):
    import jax.numpy as jnp

    blocks = []
    for cam, T in zip(cams, exts):
        M = np.eye(4)
        M[:3, :3] = np.asarray(T.C)
        M[:3, 3] = np.asarray(T.r)
        vals = ", ".join(f"{v:.12g}" for v in M.reshape(-1))
        f = np.asarray(cam.focal).ravel()
        c = np.asarray(cam.center).ravel()
        d = np.asarray(cam.distortion.params()).ravel()
        blocks.append(f"""     - {{T_SC:
        [ {vals}],
        image_dimension: [{int(cam.width)}, {int(cam.height)}],
        distortion_coefficients: [{", ".join(f"{v:.12g}" for v in d)}],
        distortion_type: radialtangential,
        focal_length: [{f[0]:.12g}, {f[1]:.12g}],
        principal_point: [{c[0]:.12g}, {c[1]:.12g}],
        camera_type: gray,
        slam_use: okvis}}""")
    cam_yaml = "\n\n".join(blocks)
    with open(path, "w") as fh:
        fh.write(f"""%YAML:1.0
cameras:
{cam_yaml}

camera_parameters:
    timestamp_tolerance: 0.005
    sync_cameras: [0, 1]
    image_delay: 0.00

imu_parameters:
    use: true
    a_max: 176.0
    g_max: 7.8
    sigma_g_c: 12.0e-4
    sigma_a_c: 8.0e-3
    sigma_bg: 0.03
    sigma_ba: 0.1
    sigma_gw_c: 4.0e-6
    sigma_aw_c: 4.0e-5
    g: 9.81
    imu_rate: 100

frontend_parameters:
    detection_threshold: 40.0
    max_num_keypoints: 128
    keyframe_overlap: 0.6
    matching_threshold: 60.0
    octaves: 0

estimator_parameters:
    num_keyframes: 5
    num_loop_closure_frames: 3
    num_imu_frames: 3
    do_loop_closures: false
    realtime_max_iterations: 10
    realtime_min_iterations: 3

output_parameters:
    display_matches: false
""")


def test_app_synchronous_end_to_end(tmp_path):
    pytest.importorskip("cv2")
    cams, exts = small_rig(width=320, height=240)
    imu = ImuParameters.create(g=9.81)
    ds = SyntheticDataset(cams, exts, imu, n_stars=2000, seed=11,
                          duration=2.0, frame_rate=4.0, imu_rate=100.0)

    dataset_dir = str(tmp_path / "dataset")
    writer = DatasetWriter(dataset_dir, num_cameras=2)
    for ev in ds.stream():
        if ev[0] == "imu":
            writer.add_imu_measurement(ev[1], ev[2], ev[3])
        else:
            writer.add_images(ev[1], ev[2])
    writer.close()

    config = str(tmp_path / "rig.yaml")
    _write_config(config, cams, exts)

    out_dir = str(tmp_path / "out")
    map_path = str(tmp_path / "session.map")
    from okvis2_tpu.apps.app_synchronous import main

    main([config, dataset_dir, "--output-dir", out_dir,
          "--final-ba", "--save-map", map_path])

    csv = os.path.join(out_dir, "okvis2-final_trajectory.csv")
    assert os.path.exists(csv)
    rows = open(csv).read().strip().splitlines()
    assert len(rows) >= 7  # header + >= 6 states
    assert os.path.exists(map_path)
    assert os.path.getsize(map_path) > 1000
