"""Re-run the tracked regression-drive suite at HEAD and emit the
REGRESSION.md table rows.

VERDICT r3 #9: the committed ATE table must describe HEAD — late-round
commits kept landing after the suite numbers were recorded. This tool
makes re-recording one command, resumable (each completed drive is
persisted to a state JSON keyed by the HEAD commit, so a killed run
skips finished drives on relaunch):

    python tools/run_regression_suite.py            # all four drives
    python tools/run_regression_suite.py textured   # one drive

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

STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".regression_state.json")


def _head():
    return subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=os.path.dirname(os.path.abspath(__file__)),
    ).decode().strip()


def _drive_circle1200():
    from okvis2_tpu.pipeline.synthetic_run import run_regression_drive

    return run_regression_drive(duration=120.0, pipelined=True,
                                verbose=True), 0.08


def _drive_textured():
    from okvis2_tpu.pipeline.synthetic_run import run_regression_drive

    return run_regression_drive(duration=30.0, pipelined=True,
                                dataset="textured", verbose=True), 0.10


def _drive_fisheye():
    import jax.numpy as jnp
    import numpy as np

    from okvis2_tpu.cameras.distortion import EquidistantDistortion
    from okvis2_tpu.cameras.pinhole import PinholeCamera
    from okvis2_tpu.core import so3
    from okvis2_tpu.core.se3 import Transformation
    from okvis2_tpu.pipeline.synthetic_run import run_regression_drive

    cam = PinholeCamera.create(
        320, 240, 190.0, 190.0, 160.0, 120.0,
        EquidistantDistortion.from_params([-0.03, 0.008, -0.002, 0.0]),
    )
    idq = so3.identity_quat(dtype=jnp.float64)
    exts = [
        Transformation(r=jnp.asarray([0.0, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.11, 0.0, 0.0]), q=idq),
    ]
    del np
    return run_regression_drive(duration=30.0, pipelined=True,
                                rig=((cam, cam), exts),
                                verbose=True), 0.08


def _drive_fourcam():
    import jax.numpy as jnp
    import numpy as np

    from okvis2_tpu.cameras.pinhole import PinholeCamera
    from okvis2_tpu.core import so3
    from okvis2_tpu.core.se3 import Transformation
    from okvis2_tpu.pipeline.synthetic_run import run_regression_drive

    cam = PinholeCamera.create(320, 240, 250.0, 250.0, 160.0, 120.0)
    idq = so3.identity_quat(dtype=jnp.float64)
    yaw = 0.44
    q_yaw = jnp.asarray([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
    exts = [
        Transformation(r=jnp.asarray([0.0, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.11, 0.0, 0.0]), q=idq),
        Transformation(r=jnp.asarray([0.2, 0.0, 0.0]), q=q_yaw),
        Transformation(r=jnp.asarray([0.31, 0.0, 0.0]), q=q_yaw),
    ]
    return run_regression_drive(duration=30.0, pipelined=True,
                                rig=((cam, cam, cam, cam), exts),
                                verbose=True), 0.08


DRIVES = {
    "circle1200": _drive_circle1200,
    "textured": _drive_textured,
    "fisheye": _drive_fisheye,
    "fourcam": _drive_fourcam,
}


def main(argv):
    import numpy as np

    names = argv[1:] or list(DRIVES)
    head = _head()
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
        t0 = time.time()
        res, bound = DRIVES[name]()
        ft = np.asarray(res["frame_times"])
        lb = res["slam"].loop_backend
        row = {
            "ate_rmse": float(res["ate_rmse"]),
            "endpoint": float(res["endpoint_error"]),
            "frames": int(res["frames"]),
            "bound": bound,
            "loop_closures": int(lb.num_loop_closures) if lb else 0,
            "p50_frame_ms": float(np.median(ft[50:]) * 1e3),
            "wall_s": time.time() - t0,
            "ok": bool(res["ate_rmse"] < bound),
        }
        state["drives"][name] = row
        with open(STATE, "w") as f:
            json.dump(state, f, indent=1)
        print(f"[suite] {name}: {row}", flush=True)
    print(f"\n## suite @ {head} ({time.strftime('%Y-%m-%d')})")
    print("| drive | frames | ATE RMSE [m] | bound | loop closures | "
          "p50 [ms] | ok |")
    print("|---|---|---|---|---|---|---|")
    for name, r in state["drives"].items():
        print(f"| {name} | {r['frames']} | {r['ate_rmse']:.4f} | "
              f"{r['bound']} | {r['loop_closures']} | "
              f"{r['p50_frame_ms']:.1f} | {'PASS' if r['ok'] else 'FAIL'} |")
    return 0 if all(r["ok"] for r in state["drives"].values()) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
