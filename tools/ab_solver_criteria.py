"""A/B the round-5 realtime LM termination criteria on the 600-frame
circle drive (diagnosing the circle1200 ATE regression 0.021 -> 0.230 at
HEAD): `head` runs the committed defaults (step_tolerance=1e-5,
min_cost_decrease=1e-6), `revert` restores the round-4 criteria
(step_tolerance off, min_cost_decrease=1e-9) for the estimator's
realtime solve only.

    python tools/ab_solver_criteria.py head|revert [duration]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    mode = argv[1] if len(argv) > 1 else "head"
    duration = float(argv[2]) if len(argv) > 2 else 60.0

    import okvis2_tpu.graph.estimator as est_mod

    if mode == "revert":
        orig = est_mod.SolverConfig

        def patched(**kw):
            kw["step_tolerance"] = 0.0
            kw["min_cost_decrease"] = 1e-9
            return orig(**kw)

        est_mod.SolverConfig = patched

    import numpy as np

    from okvis2_tpu.pipeline.synthetic_run import run_regression_drive

    res = run_regression_drive(duration=duration, verbose=True)
    slam = res["slam"]
    est = slam.estimator
    n_kf = sum(1 for r in est.states.values() if r.is_keyframe)
    lb = slam.loop_backend
    # live-vs-final decomposition: the per-frame printed err is the live
    # tracking error; ate_rmse is over the FINAL recomposed trajectory
    ft = np.asarray(res["frame_times"])
    np.savez(
        f"/tmp/ab_{mode}_traj.npz",
        est_t=np.asarray([t for t, _ in res["est_traj"]]),
        est_p=np.stack([p for _, p in res["est_traj"]]),
        gt_t=np.asarray([t for t, _ in res["gt_traj"]]),
        gt_p=np.stack([p for _, p in res["gt_traj"]]),
    )
    print(f"[ab:{mode}] ate_rmse={res['ate_rmse']:.4f} "
          f"endpoint={res['endpoint_error']:.4f} "
          f"frames={res['frames']} "
          f"loop_closures={lb.num_loop_closures if lb else 0} "
          f"keyframes={n_kf} landmarks={len(est.landmarks)} "
          f"p50={np.median(ft[50:])*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main(sys.argv)
