"""Device-op-level trace of the fused frontend and fused solve programs.

Replays captured bench-scale frames (from /tmp/okvis2_bench_frames_v2.npz,
rendered by bench.py) through the real dispatch chain under
jax.profiler.trace, then aggregates the trace's device-op durations per
program so the per-op cost of each fused program is attributable
(VERDICT r4 #1: the remaining device_loop gap must be attributable).

Usage (TPU env intact, nothing else running):
    python tools/profile_trace.py [frontend|solve|both]
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/okvis2_trace"
FRAMES = "/tmp/okvis2_bench_frames_v2.npz"


def _load_trace_events():
    paths = sorted(glob.glob(
        os.path.join(TRACE_DIR, "plugins/profile/*/*.trace.json.gz")
    ))
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def _device_op_table(events, t0_us=None, t1_us=None):
    """Aggregate complete events on TPU op lanes by name."""
    by_name = collections.Counter()
    count = collections.Counter()
    # find pids whose process name mentions TPU / device
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower()}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        ts = e.get("ts", 0)
        if t0_us is not None and not (t0_us <= ts <= t1_us):
            continue
        name = e.get("name", "?")
        by_name[name] += e.get("dur", 0)
        count[name] += 1
    return by_name, count


def main(which="both"):
    import numpy as np

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    print("[trace] devices:", jax.devices(), flush=True)
    data = np.load(FRAMES)
    capture = []
    res, slam = bench.run_e2e(data, tag="e", capture=capture)
    print(f"[trace] capture: {len(capture)} records, "
          f"{res['e2e_fps']:.1f} fps", flush=True)

    import jax.numpy as jnp

    from okvis2_tpu.solver.packed_solve import (
        MAX_APPEND_SETS,
        solve_packed_fused_carrier,
    )

    fe, est = slam.frontend, slam.estimator
    sel = capture[20:26]
    carr = [jnp.asarray(r["carrier"]) for r in sel]
    jax.block_until_ready(carr)

    # pin frontend outputs once (untimed)
    fixed = []
    for r, cd in zip(sel, carr):
        ctx = fe.dispatch_prepared(r["prep"], cd)
        sets = tuple(
            (ctx["match"]["idx"], ctx["match"]["keep"],
             ctx["match"]["xy"], ctx["match"]["size"])
            for _ in range(MAX_APPEND_SETS)
        )
        fixed.append((ctx, sets))
    jax.block_until_ready([c["diag"] for c, _ in fixed])

    def run_frontend():
        outs = [fe.dispatch_prepared(r["prep"], cd)["diag"]
                for r, cd in zip(sel, carr)]
        jax.block_until_ready(outs)

    def run_solve():
        outs = [
            solve_packed_fused_carrier(
                cd, sets, ctx["diag"], est.cameras, est.imu_params,
                r["off_solve"], r["layout"], r["scfg"],
            )
            for (r, cd), (ctx, sets) in zip(zip(sel, carr), fixed)
        ]
        jax.block_until_ready(outs)

    run_frontend()
    run_solve()  # warm both

    n_frames = len(sel)
    todo = {"frontend": run_frontend, "solve": run_solve}
    if which != "both":
        todo = {which: todo[which]}
    for label, fn in todo.items():
        os.system(f"rm -rf {TRACE_DIR}")
        with jax.profiler.trace(TRACE_DIR):
            fn()
        events = _load_trace_events()
        by_name, count = _device_op_table(events)
        # jit_* entries are whole-executable envelopes whose children
        # are ALSO counted individually — report them separately and
        # group the children by op family (strip the .N id)
        env = {n: d for n, d in by_name.items() if n.startswith("jit")}
        print(f"\n[trace:{label}] over {n_frames} dispatches")
        for name, dur in sorted(env.items(), key=lambda x: -x[1]):
            print(f"  program {name[:58]:58s} {dur/1e3/n_frames:7.3f} "
                  f"ms/frame x{count[name]/n_frames:.1f}")
        fam = collections.Counter()
        for name, dur in by_name.items():
            if name.startswith("jit"):
                continue
            fam[name.split(".")[0]] += dur
        total = sum(fam.values())
        print(f"  children total {total/1e3/n_frames:.2f} ms/frame; "
              "by family:")
        for name, dur in fam.most_common(20):
            print(f"    {name[:56]:56s} {dur/1e3/n_frames:9.3f}")
        print(f"{'op':60s} {'ms/frame':>9s} {'n/frame':>8s}")
        for name, dur in by_name.most_common(40):
            print(f"{name[:60]:60s} {dur/1e3/n_frames:9.3f} "
                  f"{count[name]/n_frames:8.1f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
