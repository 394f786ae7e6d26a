"""Profile the fused realtime solve on the TPU (VERDICT r4 item #1).

Measures, with every carrier PRE-STAGED on device (same protocol as
bench.py's replay_device_loop):
  - full-chain fps (frontend dispatch + fused solve)
  - frontend-only fps
  - solve-only fps (re-dispatch the fused solve on fixed frontend outputs)
  - per-frame solve stats (LM iterations actually run, n_obs rows)
  - problem occupancy decoded from the carriers (obs rows, landmarks,
    states actually used vs the padded capacities)
  - solve-only fps swept over max_iterations -> ms/iteration slope

Usage (TPU env intact):  python tools/profile_solve.py [n_frames]
"""

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[profile] {m}", file=sys.stderr, flush=True)


def main():
    import numpy as np

    import bench
    import dataclasses
    import jax
    import jax.numpy as jnp

    from okvis2_tpu.solver.packed_solve import (
        MAX_APPEND_SETS,
        decode_solved,
        solve_packed_fused_carrier,
    )

    data = np.load(bench.FRAMES_FILE)
    log(f"devices: {jax.devices()}")

    capture = []
    t0 = time.perf_counter()
    res, slam = bench.run_e2e(data, capture=capture)
    log(f"e2e capture: {res} in {time.perf_counter()-t0:.0f}s, "
        f"{len(capture)} records")

    sel = capture[16:48] if len(capture) > 48 else capture[8:]
    fe, est = slam.frontend, slam.estimator
    carr = [jnp.asarray(r["carrier"]) for r in sel]
    jax.block_until_ready(carr)

    # ---- frontend pass (untimed) to get fixed ctx's for solve-only ----
    ctxs = []
    pend = collections.deque(maxlen=MAX_APPEND_SETS - 1)
    sets_per_frame = []
    for r, cd in zip(sel, carr):
        ctx = fe.dispatch_prepared(r["prep"], cd)
        match_sets = list(pend) + [ctx["match"]]
        while len(match_sets) < MAX_APPEND_SETS:
            match_sets.append(ctx["match"])
        sets_per_frame.append(tuple(
            (m["idx"], m["keep"], m["xy"], m["size"]) for m in match_sets))
        ctxs.append(ctx)
        pend.append(ctx["match"])
    jax.block_until_ready([c["diag"] for c in ctxs])

    def solve_pass(scfg_override=None):
        outs = []
        for r, cd, ms, ctx in zip(sel, carr, sets_per_frame, ctxs):
            scfg = r["scfg"] if scfg_override is None else scfg_override
            outs.append(solve_packed_fused_carrier(
                cd, ms, ctx["diag"], est.cameras, est.imu_params,
                r["off_solve"], r["layout"], scfg))
        return outs

    # ---- per-frame stats ---------------------------------------------
    outs = solve_pass()
    jax.block_until_ready(outs)
    S = est.cfg.window_slots
    L = est.cfg.landmark_slots
    NC = len(est.cameras)
    iters, nobs = [], []
    for o in outs:
        _, _, _, _, st = decode_solved(np.asarray(o), S, L, NC)
        iters.append(st["iterations"])
        nobs.append(st["n_obs"])
    log(f"scfg[0]={sel[0]['scfg']}")
    log(f"iterations per frame: {iters}")
    log(f"n_obs per frame: {nobs}")

    # occupancy from the carriers (host decode)
    layout = sel[0]["layout"]
    occ = []
    for r in sel:
        nb = np.dtype(layout.float_dtype).itemsize
        off = r["off_solve"]
        n = layout.n_float + layout.n_int
        flat = r["carrier"][off:off + nb * n].view(layout.float_dtype)
        # find obs_mask / lm_mask / state_mask spec offsets by shape
        prob = {}
        import jax.tree_util as jtu
        from okvis2_tpu.solver.window_problem import WindowProblem
        names = WindowProblem._FIELDS
        flat_f = flat[:layout.n_float]
        flat_i = flat[layout.n_float:]
        # specs are in tree-flatten order == field order for array leaves
        # (imu_pre expands to several leaves) — walk them with names
        leaf_names = []
        for fname in names:
            if fname == "imu_pre":
                leaf_names.extend([f"imu_pre.{i}" for i in range(13)])
            else:
                leaf_names.append(fname)
        vals = {}
        for (kind, offp, nn, shape, dtype), lname in zip(layout.specs,
                                                         leaf_names):
            src = flat_f if kind == "f" else flat_i
            vals[lname] = src[offp:offp + nn].reshape(shape)
        occ.append({
            "obs": int(np.round(vals["obs_mask"]).sum()),
            "lm": int(np.round(vals["lm_mask"]).sum()),
            "states": int(np.round(vals["state_mask"]).sum()),
        })
    log(f"occupancy (capacities S={S} L={L} O={est.cfg.obs_slots}): "
        f"{json.dumps(occ[:8])} ... median obs="
        f"{int(np.median([o['obs'] for o in occ]))} lm="
        f"{int(np.median([o['lm'] for o in occ]))} states="
        f"{int(np.median([o['states'] for o in occ]))}")

    # ---- timings ------------------------------------------------------
    def timed(fn, n_pass=3):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        outs = []
        for _ in range(n_pass):
            outs.extend(fn())
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / (n_pass * len(sel))

    dt_solve = timed(solve_pass)
    log(f"solve-only: {dt_solve*1e3:.2f} ms/frame "
        f"({1.0/dt_solve:.1f} fps)")

    fps_full = bench.replay_device_loop(slam, sel)
    fps_fe = bench.replay_device_loop(slam, sel, frontend_only=True)
    log(f"full chain: {1e3/fps_full:.2f} ms ({fps_full:.1f} fps); "
        f"frontend-only: {1e3/fps_fe:.2f} ms ({fps_fe:.1f} fps)")

    # ---- iteration sweep ---------------------------------------------
    base = sel[0]["scfg"]
    for mi in (1, 2, 3, 5, 10):
        cfg = dataclasses.replace(base, max_iterations=mi)
        dt = timed(lambda c=cfg: solve_pass(c))
        log(f"max_iterations={mi}: {dt*1e3:.2f} ms/frame")


if __name__ == "__main__":
    main()
