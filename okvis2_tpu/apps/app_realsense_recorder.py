"""Record a live Realsense stream into EuRoC folder format.

Covers okvis_app_realsense_recorder (reference: okvis_apps/src/
okvis_app_realsense_recorder.cpp:163): stream the sensor's IR stereo +
IMU straight into a DatasetWriter so the session can later be replayed
through app_synchronous.

Usage:
    python -m okvis2_tpu.apps.app_realsense_recorder <out_dir> \
        [--rgbd] [--duration SECONDS]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_dir")
    p.add_argument("--rgbd", action="store_true")
    p.add_argument("--duration", type=float, default=0.0,
                   help="stop after this many seconds (0 = until Ctrl-C)")
    args = p.parse_args(argv)

    from okvis2_tpu.pipeline.dataset import DatasetWriter
    from okvis2_tpu.pipeline.sensors import (
        RealsenseRgbdSensor,
        RealsenseSensor,
    )

    writer = DatasetWriter(args.out_dir, num_cameras=2)
    sensor = RealsenseRgbdSensor() if args.rgbd else RealsenseSensor()
    sensor.set_images_callback(writer.add_images)
    sensor.set_imu_callback(writer.add_imu_measurement)
    sensor.start_streaming()
    t0 = time.time()
    try:
        while not args.duration or time.time() - t0 < args.duration:
            time.sleep(0.2)
    except KeyboardInterrupt:
        pass
    finally:
        sensor.stop_streaming()
        writer.close()
    print(f"recorded {time.time()-t0:.1f}s into {args.out_dir}")


if __name__ == "__main__":
    main()
