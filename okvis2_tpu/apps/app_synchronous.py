"""Synchronous dataset SLAM app.

Covers okvis_app_synchronous (reference: okvis_apps/src/
okvis_app_synchronous.cpp:67-204): run the full pipeline over an
EuRoC-format dataset given a YAML config, write live + final trajectory
CSVs, optionally final BA and map save.

Usage:
    python -m okvis2_tpu.apps.app_synchronous <config.yaml> <dataset_dir> \
        [--output-dir .] [--max-frames N] [--rpg-format]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("dataset")
    p.add_argument("--output-dir", default=".")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--rpg-format", action="store_true")
    p.add_argument("--final-ba", action="store_true")
    p.add_argument("--save-map", default="")
    p.add_argument(
        "--sync", action="store_true",
        help="synchronous frame loop (one blocking readback per frame) "
             "instead of the default Phase-B pipelined loop",
    )
    p.add_argument(
        "--vocabulary", default="",
        help="place-recognition vocabulary: our .npz or the reference's "
             "DBoW2 .yml.gz (e.g. small_voc.yml.gz, the file "
             "okvis_app_synchronous loads next to its executable); "
             "default: the committed general vocabulary",
    )
    args = p.parse_args(argv)

    from okvis2_tpu.config import read_config_file
    from okvis2_tpu.frontend.detection import DetectionConfig
    from okvis2_tpu.graph.estimator import EstimatorConfig
    from okvis2_tpu.pipeline.dataset import EurocDatasetReader
    from okvis2_tpu.pipeline.frontend_pipeline import FrontendConfig
    from okvis2_tpu.pipeline.slam import SlamSystem
    from okvis2_tpu.pipeline.trajectory import (
        Trajectory,
        write_euroc_csv,
        write_rpg_csv,
    )

    params = read_config_file(args.config)
    cams = params.camera_tuple
    exts = params.extrinsics_list

    est_cfg = EstimatorConfig(
        num_keyframes=params.estimator.num_keyframes,
        num_imu_frames=params.estimator.num_imu_frames,
        num_loop_closure_frames=params.estimator.num_loop_closure_frames,
        realtime_iterations=params.estimator.realtime_max_iterations,
        realtime_min_iterations=params.estimator.realtime_min_iterations,
        enforce_realtime=params.estimator.enforce_realtime,
        realtime_time_limit=params.estimator.realtime_time_limit,
        online_extrinsics=params.camera_rig.online_extrinsics,
        ext_sigma_r=params.camera_rig.sigma_r,
        ext_sigma_alpha=params.camera_rig.sigma_alpha,
    )
    fe_cfg = FrontendConfig(
        detection=DetectionConfig(
            max_keypoints=params.frontend.max_num_keypoints,
            octaves=max(params.frontend.octaves, 1),
        ),
        matching_threshold=int(params.frontend.matching_threshold),
        keyframe_overlap_threshold=params.frontend.keyframe_overlap,
    )
    lc_cfg = None
    if args.vocabulary:
        from okvis2_tpu.pipeline.full_graph import LoopClosureConfig

        lc_cfg = LoopClosureConfig(vocabulary_path=args.vocabulary)
    slam = SlamSystem(
        cams, exts, params.imu.params, est_cfg, fe_cfg,
        do_loop_closures=params.estimator.do_loop_closures,
        pipelined=not args.sync,
        loop_closure_config=lc_cfg,
    )
    traj = Trajectory()
    slam.set_optimised_graph_callback(
        lambda t, sid, pose, tracking: traj.update(sid, t, pose)
    )

    reader = EurocDatasetReader(args.dataset, num_cameras=len(cams))
    n = 0
    t0 = time.time()
    for ev in reader.stream(params.camera_rig.timestamp_tolerance):
        if ev[0] == "imu":
            slam.add_imu_measurement(ev[1], ev[2], ev[3])
        else:
            slam.add_images(ev[1], ev[2])
            slam.process_frame()
            n += 1
            if n % 50 == 0:
                dt = time.time() - t0
                print(f"[{n} frames, {n/dt:.1f} fps] "
                      f"tracking={slam.tracking.tracking_quality} "
                      f"landmarks={len(slam.estimator.landmarks)}",
                      flush=True)
            if args.max_frames and n >= args.max_frames:
                break

    slam.finish()  # drain the pipelined loop's in-flight frame

    if args.final_ba:
        # offline final bundle adjustment (doFinalBa,
        # okvis_ceres/src/ViSlamBackend.cpp:1759-1892)
        info = slam.do_final_ba()
        print(f"final BA: {info}")

    # final trajectory from the estimator's full history (non-causal)
    final = [
        (slam.estimator.states[s].t, slam.estimator.states[s].pose)
        for s in slam.estimator.state_order
    ]
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "okvis2-final_trajectory.csv")
    if args.rpg_format:
        write_rpg_csv(out, final)
    else:
        write_euroc_csv(out, final)
    print(f"wrote {out} ({len(final)} states, {n} frames, "
          f"{time.time()-t0:.1f}s)")

    if args.save_map:
        # SlamSystem.save_map includes the landmark descriptors needed
        # for multi-session relocalisation (Component::save)
        slam.save_map(args.save_map)
        print(f"saved map to {args.save_map}")


if __name__ == "__main__":
    main()
