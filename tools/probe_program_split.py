"""Time the fused frontend program and the fused solve separately (and
the solve at different iteration counts) at bench shapes on the TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_frames=24, W=752, H=480):
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
    est = slam.estimator
    fe = slam.frontend

    k = 0
    for ev in events:
        if ev[0] == "imu":
            slam.add_imu_measurement(ev[1], ev[2], ev[3])
            continue
        t, images = ev[1], ev[2]
        k += 1
        if k < 14:
            slam.add_images(t, images)
            slam.process_frame()
            continue
        # manual instrumented frame
        slam._finish_pending()
        imu_w, imu_a, imu_dt = slam._gather_imu(slam._last_frame_t, t)
        slam._last_frame_t = t
        sid = est.add_state(t, imu_w, imu_a, imu_dt)
        pred = est.states[sid].pose
        t0 = time.perf_counter()
        prep = fe.prepare_frame(est, images, sid, pred)
        sets = [{"sid": sid, "slot_lid": fe.table.slot_lid.copy()}]
        layout, scfg, buf_all = est.prepare_fused_solve(
            sid, fe.table, sets)
        imgs = prep["imgs_u8"]
        n_img = imgs.nbytes
        off_solve = n_img + prep["aux_all"].nbytes
        total = off_solve + buf_all.nbytes
        carrier = np.empty(total, np.uint8)
        carrier[:n_img] = imgs.reshape(-1)
        carrier[n_img:off_solve] = prep["aux_all"].view(np.uint8)
        carrier[off_solve:] = buf_all.view(np.uint8)
        t_prep = time.perf_counter() - t0

        t0 = time.perf_counter()
        carrier_dev = jax.block_until_ready(jnp.asarray(carrier))
        t_up = time.perf_counter() - t0

        t0 = time.perf_counter()
        ctx = fe.dispatch_prepared(prep, carrier_dev)
        jax.block_until_ready(ctx["diag"])
        t_frontend = time.perf_counter() - t0

        t0 = time.perf_counter()
        from okvis2_tpu.solver.packed_solve import MAX_APPEND_SETS
        match_sets = [ctx["match"]] * MAX_APPEND_SETS
        out = est.dispatch_fused_solve_carrier(
            match_sets, ctx["diag"], carrier_dev, off_solve, layout,
            scfg)
        jax.block_until_ready(out)
        t_solve = time.perf_counter() - t0
        # throughput vs latency: 5 more back-to-back solve dispatches
        t0 = time.perf_counter()
        outs = [
            est.dispatch_fused_solve_carrier(
                match_sets, ctx["diag"], carrier_dev, off_solve,
                layout, scfg)
            for _ in range(5)
        ]
        jax.block_until_ready(outs)
        t_solve5 = time.perf_counter() - t0
        # trivial program completion latency with an empty pipe
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.zeros(4) + 1.0)
        t_triv = time.perf_counter() - t0
        print(f"frame {k}: prep={t_prep*1e3:6.1f} up={t_up*1e3:5.1f} "
              f"frontend={t_frontend*1e3:6.1f} "
              f"solve={t_solve*1e3:6.1f} solve5={t_solve5*1e3:6.1f} "
              f"triv={t_triv*1e3:5.1f} iters={scfg.max_iterations}",
              flush=True)

        import threading
        fut = {}

        def _fetch(o=out, f=fut):
            f["arr"] = np.asarray(o)

        th = threading.Thread(target=_fetch, daemon=True)
        th.start()
        slam._pending_frames.append({
            "t": t, "sid": sid, "ctx": ctx, "out": out,
            "fetch": (th, fut),
            "slot_of": dict(est._slot_of), "lm_ids": list(est._lm_ids),
            "images": images,
        })
        slam.frames_processed += 1
    slam.finish()


if __name__ == "__main__":
    main()
