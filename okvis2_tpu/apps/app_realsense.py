"""Live Realsense SLAM app (no ROS needed).

Covers okvis_app_realsense (reference: okvis_apps/src/
okvis_app_realsense.cpp:198): stream a D435i/D455 straight into the
pipeline, print tracking state, optionally record the final trajectory.

Usage:
    python -m okvis2_tpu.apps.app_realsense <config.yaml> \
        [--rgbd] [--duration SECONDS] [--output trajectory.csv]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--rgbd", action="store_true")
    p.add_argument("--duration", type=float, default=0.0)
    p.add_argument("--output", default="okvis2-realsense-trajectory.csv")
    args = p.parse_args(argv)

    from okvis2_tpu.config import read_config_file
    from okvis2_tpu.frontend.detection import DetectionConfig
    from okvis2_tpu.graph.estimator import EstimatorConfig
    from okvis2_tpu.pipeline.frontend_pipeline import FrontendConfig
    from okvis2_tpu.pipeline.sensors import (
        RealsenseRgbdSensor,
        RealsenseSensor,
    )
    from okvis2_tpu.pipeline.slam import SlamSystem
    from okvis2_tpu.pipeline.trajectory import write_euroc_csv

    params = read_config_file(args.config)
    slam = SlamSystem(
        params.camera_tuple, params.extrinsics_list, params.imu.params,
        EstimatorConfig(
            num_keyframes=params.estimator.num_keyframes,
            num_imu_frames=params.estimator.num_imu_frames,
            realtime_iterations=params.estimator.realtime_max_iterations,
            enforce_realtime=params.estimator.enforce_realtime,
            realtime_time_limit=params.estimator.realtime_time_limit,
        ),
        FrontendConfig(
            detection=DetectionConfig(
                max_keypoints=params.frontend.max_num_keypoints
            ),
            matching_threshold=int(params.frontend.matching_threshold),
        ),
        do_loop_closures=params.estimator.do_loop_closures,
    )
    sensor = RealsenseRgbdSensor() if args.rgbd else RealsenseSensor()
    sensor.set_images_callback(slam.add_images)
    sensor.set_imu_callback(slam.add_imu_measurement)
    if args.rgbd:
        sensor.set_depth_callback(slam.add_depth_image)
    sensor.start_streaming()
    t0 = time.time()
    n = 0
    try:
        while not args.duration or time.time() - t0 < args.duration:
            if slam.process_frame():
                n += 1
                if n % 30 == 0:
                    print(
                        f"[{n} frames] tracking="
                        f"{slam.tracking.tracking_quality} "
                        f"landmarks={len(slam.estimator.landmarks)}",
                        flush=True,
                    )
            else:
                time.sleep(0.002)
    except KeyboardInterrupt:
        pass
    finally:
        sensor.stop_streaming()
    final = [
        (slam.estimator.states[s].t, slam.estimator.states[s].pose)
        for s in slam.estimator.state_order
    ]
    write_euroc_csv(args.output, final)
    print(f"wrote {args.output} ({n} frames)")


if __name__ == "__main__":
    main()
