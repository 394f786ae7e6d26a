"""Diagnose the circle1200 final-trajectory regression (suite @78877ce:
ATE 0.230 with 9 closures vs 0.0208 with 1 closure at 486f2b9, while
the live err traces are near-identical).

Runs the circle1200 regression spec, optionally with the round-4 PR
database density (--r4-density), and dumps everything needed for
offline outlier analysis: final + ground-truth trajectories, per-state
metadata (keyframe / pose-graph / anchor id), loop-closure frames and
margins.  Prints the per-frame aligned final error and the worst
segments with their state classes.

Usage (TPU, ~30 min):
    python tools/diag_circle.py --out /tmp/diag_head.npz
    python tools/diag_circle.py --r4-density --out /tmp/diag_r4pr.npz
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/diag_circle.npz")
    ap.add_argument("--duration", type=float, default=120.0)
    ap.add_argument("--r4-density", action="store_true",
                    help="round-4 PR eligibility (overlap 0.6, ray 0.05)")
    args = ap.parse_args()

    import okvis2_tpu.pipeline.full_graph as fg
    if args.r4_density:
        _Orig = fg.LoopClosureConfig

        def _patched(**kw):
            kw.setdefault("pr_max_overlap", 0.6)
            kw.setdefault("pr_max_ray_angle", 0.05)
            return _Orig(**kw)

        fg.LoopClosureConfig = _patched

    from okvis2_tpu.pipeline.regression_drives import DRIVES, run_drive
    spec = DRIVES["circle1200"]
    if args.duration != 120.0:
        import dataclasses
        spec = dataclasses.replace(spec, duration=args.duration)
    res = run_drive(spec, verbose=True)

    slam = res["slam"]
    est = slam.estimator
    lb = slam.loop_backend

    est_traj = res["est_traj"]
    gt_traj = res["gt_traj"]
    ts = np.asarray([t for t, _ in est_traj])
    ps = np.stack([p for _, p in est_traj])
    gt_ts = np.asarray([t for t, _ in gt_traj])
    gt_ps = np.stack([p for _, p in gt_traj])

    # per-state metadata aligned with est_traj (state_order order)
    meta = []
    for s in est.state_order:
        r = est.states[s]
        meta.append((
            s,
            r.t,
            int(bool(r.is_keyframe)),
            int(bool(getattr(r, "is_pose_graph_frame", False))),
            -1 if r.anchor_id is None else int(r.anchor_id),
            int(bool(r.in_window)),
        ))
    meta = np.asarray(meta, dtype=np.float64)

    np.savez(
        args.out,
        est_t=ts, est_p=ps, gt_t=gt_ts, gt_p=gt_ps,
        meta=meta,
        lc_frames=np.asarray(res["lc_frames"]),
        margins=np.asarray(lb.verify_margins if lb else []),
        frame_times=np.asarray(res["frame_times"]),
    )

    # aligned per-frame final error
    from okvis2_tpu.pipeline.trajectory import align_umeyama
    gi = np.argmin(np.abs(gt_ts[None, :] - ts[:, None]), axis=1)
    okm = np.abs(gt_ts[gi] - ts) < 0.05
    E, G = ps[okm, :3], gt_ps[gi[okm], :3]
    _, R, t = align_umeyama(E, G)
    errs = np.linalg.norm(E @ R.T + t - G, axis=-1)
    idx = np.where(okm)[0]

    print(f"\nate={res['ate_rmse']:.4f} endpoint={res['endpoint_error']:.4f} "
          f"closures={lb.num_loop_closures if lb else 0} "
          f"margins={[round(m, 2) for m in (lb.verify_margins if lb else [])]}")
    print(f"lc_frames={res['lc_frames']}")
    # bucket errors by state class
    kf = meta[okm, 2] > 0
    pg = meta[okm, 3] > 0
    anc = meta[okm, 4] >= 0
    for name, m in [("keyframe", kf), ("posegraph", pg & ~kf),
                    ("anchored", anc & ~kf & ~pg),
                    ("absolute", ~anc & ~kf & ~pg)]:
        if m.sum():
            print(f"  {name:10s} n={int(m.sum()):4d} "
                  f"rms={np.sqrt(np.mean(errs[m]**2)):.4f} "
                  f"max={errs[m].max():.4f}")
    worst = np.argsort(errs)[::-1][:15]
    print("worst states (traj idx, t, err, kf, pg, anchor):")
    for w in worst:
        i = idx[w]
        print(f"  idx={i:4d} t={ts[i]:7.2f} err={errs[w]:.3f} "
              f"kf={int(meta[i, 2])} pg={int(meta[i, 3])} "
              f"anchor={int(meta[i, 4])}")

    from okvis2_tpu.utils.timing import Timing
    print("\ntiming report:")
    Timing.print_report()


if __name__ == "__main__":
    main()
