"""Re-run the tracked regression-drive suite at HEAD and emit the
REGRESSION.md table rows.

VERDICT r3 #9: the committed ATE table must describe HEAD — late-round
commits kept landing after the suite numbers were recorded. This tool
makes re-recording one command, resumable (each completed drive is
persisted to a state JSON keyed by the HEAD commit + dirty flag, so a
killed run skips finished drives on relaunch):

    python tools/run_regression_suite.py            # all four drives
    python tools/run_regression_suite.py textured   # one drive

Drive specs (rigs, durations, bounds, loop-closure expectations) are
shared with tests/test_regression_suite.py via
okvis2_tpu.pipeline.regression_drives — advisor r4: hand-duplicated
specs silently desynchronise.

Run it with the axon env INTACT to measure on the TPU (the tracked
numbers are TPU f32), or under `env -u PALLAS_AXON_POOL_IPS
JAX_PLATFORMS=cpu` for a slow CPU check. Reference validation analogue:
running okvis_app_synchronous on EuRoC and evaluating ATE
(okvis_apps/src/okvis_app_synchronous.cpp, README.md:179-206).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from okvis2_tpu.pipeline.regression_drives import DRIVES, run_drive  # noqa: E402

STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".regression_state.json")


def _head():
    """HEAD key incl. a dirty marker: numbers recorded from an
    uncommitted tree must not be reported as HEAD results (advisor r4)."""
    cwd = os.path.dirname(os.path.abspath(__file__))
    head = subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"], cwd=cwd,
    ).decode().strip()
    dirty = subprocess.check_output(
        ["git", "status", "--porcelain"], cwd=cwd,
    ).decode().strip()
    return head + ("-dirty" if dirty else "")


def main(argv):
    import numpy as np

    names = argv[1:] or list(DRIVES)
    head = _head()
    if head.endswith("-dirty"):
        print("[suite] WARNING: working tree is dirty — results are "
              f"recorded under '{head}', not a commit", flush=True)
    state = {}
    if os.path.exists(STATE):
        with open(STATE) as f:
            state = json.load(f)
    if state.get("head") != head:
        state = {"head": head, "drives": {}}
    for name in names:
        if name in state["drives"]:
            print(f"[suite] {name}: cached for {head}", flush=True)
            continue
        print(f"[suite] {name}: running...", flush=True)
        spec = DRIVES[name]
        t0 = time.time()
        res = run_drive(spec, verbose=True)
        ft = np.asarray(res["frame_times"])
        lb = res["slam"].loop_backend
        n_lc = int(lb.num_loop_closures) if lb else 0
        margins = list(getattr(lb, "verify_margins", [])) if lb else []
        med = float(np.median(ft[50:]))
        ok = bool(res["ate_rmse"] < spec.ate_bound)
        ok = ok and n_lc >= spec.min_loop_closures
        if spec.min_verify_margin > 0 and margins:
            ok = ok and min(margins) >= spec.min_verify_margin
        # loop-closure frames must not stall the loop (same gate as
        # test_circle_1200_frames_loop_closure): incremental pack +
        # async full-graph solve keep them within 2x the median
        lc_steady = [i for i in res.get("lc_frames", []) if i >= 50]
        lc_worst_ratio = (
            max(float(ft[i]) for i in lc_steady) / med if lc_steady
            else None
        )
        if spec.min_loop_closures > 0 and lc_steady:
            ok = ok and lc_worst_ratio <= 2.0
        row = {
            "ate_rmse": float(res["ate_rmse"]),
            "endpoint": float(res["endpoint_error"]),
            "frames": int(res["frames"]),
            "bound": spec.ate_bound,
            "loop_closures": n_lc,
            "min_loop_closures": spec.min_loop_closures,
            "verify_margins": [round(m, 3) for m in margins],
            "lc_worst_ratio": lc_worst_ratio,
            "p50_frame_ms": med * 1e3,
            "wall_s": time.time() - t0,
            "date": time.strftime("%Y-%m-%d"),
            "ok": ok,
        }
        state["drives"][name] = row
        with open(STATE, "w") as f:
            json.dump(state, f, indent=1)
        print(f"[suite] {name}: {row}", flush=True)
    # per-row recorded date (advisor r4: print-time stamping misdates
    # cached rows); header shows the earliest recorded date
    rows = state["drives"]
    dates = sorted(r.get("date", "?") for r in rows.values())
    print(f"\n## suite @ {head} ({dates[0] if dates else '?'})")
    print("| drive | frames | ATE RMSE [m] | bound | loop closures | "
          "p50 [ms] | date | ok |")
    print("|---|---|---|---|---|---|---|---|")
    for name, r in rows.items():
        lc = f"{r['loop_closures']}"
        if r.get("min_loop_closures", 0) > 0:
            lc += f" (>={r['min_loop_closures']})"
        print(f"| {name} | {r['frames']} | {r['ate_rmse']:.4f} | "
              f"{r['bound']} | {lc} | "
              f"{r['p50_frame_ms']:.1f} | {r.get('date', '?')} | "
              f"{'PASS' if r['ok'] else 'FAIL'} |")
    return 0 if rows and all(r["ok"] for r in rows.values()) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
