"""Split the pipelined frame's latency into device-execution time vs
readback RTT: after process_frame dispatches, block_until_ready on the
[solve|diag] output (device completion), then time a fresh host fetch.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_frames=30, W=752, H=480):
    import jax
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

    F = 460.0
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
    events = list(ds.stream())
    print("rendered", flush=True)

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

    k = 0
    for ev in events:
        if ev[0] == "imu":
            slam.add_imu_measurement(ev[1], ev[2], ev[3])
            continue
        slam.add_images(ev[1], ev[2])
        t0 = time.perf_counter()
        slam.process_frame()
        t_pf = time.perf_counter() - t0
        k += 1
        if k > 12:
            out = slam._pending_frames[-1]["out"]
            t1 = time.perf_counter()
            jax.block_until_ready(out)
            t_exec = time.perf_counter() - t1
            t2 = time.perf_counter()
            arr = np.asarray(out)
            t_fetch = time.perf_counter() - t2
            # reset: the pending fetch thread will just find it ready
            print(f"frame {k}: process={t_pf*1e3:6.1f} ms  "
                  f"block_after={t_exec*1e3:6.1f} ms  "
                  f"fetch_after_ready={t_fetch*1e3:6.1f} ms  "
                  f"out_bytes={arr.nbytes}", flush=True)
    slam.finish()


if __name__ == "__main__":
    main()
