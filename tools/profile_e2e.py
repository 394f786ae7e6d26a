"""Per-stage timing of the pipelined frame loop on the real TPU.

Runs a short EuRoC-scale synthetic drive with Timing enabled and prints
the stage report + frame-time percentiles. Run with the axon env intact
and NOTHING else on the host.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_frames=40, W=752, H=480):
    import jax.numpy as jnp

    from okvis2_tpu.cameras.distortion import RadialTangentialDistortion
    from okvis2_tpu.cameras.pinhole import PinholeCamera
    from okvis2_tpu.core import so3
    from okvis2_tpu.core.se3 import Transformation
    from okvis2_tpu.frontend.detection import DetectionConfig
    from okvis2_tpu.graph.estimator import EstimatorConfig
    from okvis2_tpu.imu.preintegration import ImuParameters
    from okvis2_tpu.pipeline.dataset import SyntheticDataset
    from okvis2_tpu.pipeline.frontend_pipeline import FrontendConfig
    from okvis2_tpu.pipeline.slam import SlamSystem
    from okvis2_tpu.utils.timing import Timing

    F = 460.0 * (W / 752.0)
    cam = PinholeCamera.create(
        W, H, F, F, W / 2.0, H / 2.0,
        RadialTangentialDistortion.from_params([-0.05, 0.01, 0.0, 0.0]),
    )
    T_SC0 = Transformation.identity(dtype=cam.focal.dtype)
    T_SC1 = Transformation(
        r=jnp.asarray([0.11, 0.0, 0.0], cam.focal.dtype),
        q=so3.identity_quat(dtype=cam.focal.dtype),
    )
    cams, exts = (cam, cam), [T_SC0, T_SC1]
    imu_params = ImuParameters.create(g=9.81)
    ds = SyntheticDataset(
        cams, exts, imu_params, n_stars=2500,
        duration=n_frames / 20.0, frame_rate=20.0, imu_rate=200.0,
    )
    t0 = time.perf_counter()
    events = list(ds.stream())
    print(f"rendered in {time.perf_counter()-t0:.1f}s", flush=True)

    est_cfg = EstimatorConfig(
        window_slots=12, landmark_slots=512, obs_slots=4096,
        imu_seg_capacity=64, enforce_realtime=True,
        realtime_time_limit=0.035,
    )
    fe_cfg = FrontendConfig(
        detection=DetectionConfig(max_keypoints=512),
        map_match_capacity=1024,
    )
    slam = SlamSystem(cams, exts, imu_params, est_cfg, fe_cfg,
                      pipelined=True)
    Timing.enabled = True
    Timing.reset() if hasattr(Timing, "reset") else None

    frame_times = []
    for ev in events:
        if ev[0] == "imu":
            slam.add_imu_measurement(ev[1], ev[2], ev[3])
        else:
            ta = time.perf_counter()
            slam.add_images(ev[1], ev[2])
            t_add = time.perf_counter() - ta
            t1 = time.perf_counter()
            slam.process_frame()
            frame_times.append(
                (time.perf_counter() - t1, t_add)
            )
    slam.finish()
    ft = np.asarray([a for a, _ in frame_times[8:]]) * 1e3
    at = np.asarray([b for _, b in frame_times[8:]]) * 1e3
    print(f"process_frame p50 {np.median(ft):.1f} ms  "
          f"mean {ft.mean():.1f}  min {ft.min():.1f}")
    print(f"add_images    p50 {np.median(at):.1f} ms  "
          f"mean {at.mean():.1f}")
    print(f"total per frame p50 {np.median(ft + at):.1f} ms -> "
          f"{1e3 / np.median(ft + at):.1f} fps")
    from okvis2_tpu.utils.timing import Timing as T

    T.print_report()


if __name__ == "__main__":
    main()
