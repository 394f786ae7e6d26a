"""Quick device-loop replay: fps (full / frontend / solve) + LM
iteration counts per frame, on captured bench-scale frames.

Faster turnaround than the full bench for iterating on the fused
programs' device cost (VERDICT r4 #1). Uses the same replay machinery
as bench.py's device child.

Usage:
    python tools/profile_replay.py          # TPU (axon env intact)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = "/tmp/okvis2_bench_frames_v2.npz"


def main():
    import numpy as np

    import bench

    data = np.load(FRAMES)
    capture = []
    res, slam = bench.run_e2e(data, tag="e", capture=capture)
    print(f"[replay] e2e {res['e2e_fps']:.1f} fps, "
          f"{len(capture)} records", flush=True)
    sel = capture[16:48]

    fps = bench.replay_device_loop(slam, sel)
    fps_fe = bench.replay_device_loop(slam, sel, mode="frontend")
    fps_sv = bench.replay_device_loop(slam, sel, mode="solve")
    print(f"[replay] device_loop {fps:.1f} fps | frontend "
          f"{1e3 / fps_fe:.2f} ms | solve {1e3 / fps_sv:.2f} ms")

    # iteration counts: re-dispatch each frame's solve once and decode
    # the stats scalars from the flat output
    import jax
    import jax.numpy as jnp

    from okvis2_tpu.solver.packed_solve import (
        MAX_APPEND_SETS,
        solve_packed_fused_carrier,
    )

    fe, est = slam.frontend, slam.estimator
    iters, mx = [], []
    for r in sel:
        cd = jnp.asarray(r["carrier"])
        ctx = fe.dispatch_prepared(r["prep"], cd)
        sets = tuple(
            (ctx["match"]["idx"], ctx["match"]["keep"],
             ctx["match"]["xy"], ctx["match"]["size"])
            for _ in range(MAX_APPEND_SETS)
        )
        out = solve_packed_fused_carrier(
            cd, sets, ctx["diag"], est.cameras, est.imu_params,
            r["off_solve"], r["layout"], r["scfg"],
        )
        flat = np.asarray(out)
        cfg = est.cfg
        o = (cfg.window_slots * 16 + cfg.landmark_slots * 4
             + len(est.cameras) * 7)
        iters.append(int(flat[o + 2]))
        mx.append(int(r["scfg"].max_iterations))
    print(f"[replay] LM iterations per frame: {iters}")
    print(f"[replay] max_iterations per frame: {mx}")


if __name__ == "__main__":
    main()
