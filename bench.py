"""Benchmark: end-to-end SLAM system + device-resident loop on one chip.

Capture-proof structure (round-3 shipped zero valid artifacts because a
single axon-backend hiccup killed the whole measurement):

- the PARENT process never imports jax: it orchestrates child processes
  and assembles the final JSON line;
- frame rendering runs in a CPU child (the renderer's per-frame
  device_gets cost ~6 s/frame over the TPU tunnel, ~0 locally);
- all device measurements run in ONE child against the real chip, with
  every completed phase persisted to a state file — a child crash
  (e.g. transient axon UNAVAILABLE at init) is retried and the retry
  resumes from the last completed phase instead of starting over.

Metrics:
- `value` (headline): MEDIAN of 3 end-to-end runs of the FULL pipelined
  system (detect+describe+match+ransac+stereo-init+window-BA+
  marginalisation) at EuRoC scale (752x480 stereo, 512 kp, 200 Hz IMU).
  Median, not best-of-N: tunnel load varies the same binary ~2x between
  runs and best-of systematically overstates typical throughput.
- `device_loop_fps`: the same per-frame program chain (fused frontend
  dispatch + fused solve with device-side match append) re-played with
  every frame's carrier PRE-STAGED on device and zero host transfers —
  the per-chip number with the host<->device link taken out of the
  picture (BASELINE.md's >=10x-sensor-rate target is a per-chip claim).
- `device_loop_1024_fps`: the same at TUM-VI-1024 scale (1024x1024
  stereo, BASELINE.json config #3).
- `link_ceiling_fps`: the fastest ANY frame loop can go over this
  host<->device link (upload + trivial dispatch + lagged fetch).
- `prep_ms_p50`: host-side per-frame prep cost (frontend aux + window
  pack), tracked per round (the reference's persistent ceres::Problem
  never repacks, ViGraph.cpp:47-62).

Baseline: EuRoC sensor rate is 20 Hz stereo; the rebuild target is
>=10x sensor rate per chip (BASELINE.md) => vs_baseline = e2e_fps / 200.

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

# OKVIS2_BENCH_SMOKE=1 shrinks everything for a fast machinery check
# (CI / CPU): tiny frames, few of them — numbers are meaningless there.
_SMOKE = bool(os.environ.get("OKVIS2_BENCH_SMOKE"))
_SFX = "_smoke" if _SMOKE else ""
# v2: the 1024 set grew to the same length as the EuRoC set so both
# replays sample the SAME steady-state maturity window (VERDICT r4 #3:
# records[16:48] vs capture[8:] made the stress config read FASTER)
FRAMES_FILE = f"/tmp/okvis2_bench_frames_v2{_SFX}.npz"
STATE_FILE = f"/tmp/okvis2_bench_state{_SFX}.json"
N_FRAMES = 18 if _SMOKE else 60
N_FRAMES_1024 = 18 if _SMOKE else 60
E_DIMS = (192, 128, 120.0) if _SMOKE else (752, 480, 460.0)
T_DIMS = (256, 256, 130.0) if _SMOKE else (1024, 1024, 470.0)
E_KP = 128 if _SMOKE else 512
FRAME_RATE = 20.0


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# ----------------------------------------------------------------------
# shared rig / dataset config (child processes only — imports jax)
# ----------------------------------------------------------------------
def _build_rig(W=752, H=480, F=460.0):
    import jax.numpy as jnp

    from okvis2_tpu.cameras.distortion import RadialTangentialDistortion
    from okvis2_tpu.cameras.pinhole import PinholeCamera
    from okvis2_tpu.core import so3
    from okvis2_tpu.core.se3 import Transformation
    from okvis2_tpu.imu.preintegration import ImuParameters

    cam = PinholeCamera.create(
        W, H, F, F, W / 2.0, H / 2.0,
        RadialTangentialDistortion.from_params([-0.05, 0.01, 0.0, 0.0]),
    )
    T_SC0 = Transformation.identity(dtype=cam.focal.dtype)
    T_SC1 = Transformation(
        r=jnp.asarray([0.11, 0.0, 0.0], cam.focal.dtype),
        q=so3.identity_quat(dtype=cam.focal.dtype),
    )
    return (cam, cam), [T_SC0, T_SC1], ImuParameters.create(g=9.81)


def _render_set(tag, W, H, F, n_frames, out):
    import numpy as np

    from okvis2_tpu.pipeline.dataset import SyntheticDataset

    cams, exts, imu_params = _build_rig(W, H, F)
    ds = SyntheticDataset(
        cams, exts, imu_params, n_stars=2500,
        duration=n_frames / FRAME_RATE, frame_rate=FRAME_RATE,
        imu_rate=200.0,
    )
    t0 = time.perf_counter()
    f_t, f_img, i_t, i_a, i_g = [], [], [], [], []
    for ev in ds.stream():
        if ev[0] == "imu":
            i_t.append(ev[1]); i_a.append(ev[2]); i_g.append(ev[3])
        else:
            f_t.append(ev[1])
            f_img.append(np.stack([
                (np.clip(im, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
                for im in ev[2]
            ]))
    _log(f"rendered {len(f_t)} {W}x{H} frames in "
         f"{time.perf_counter()-t0:.1f}s")
    out[f"{tag}_ft"] = np.asarray(f_t)
    out[f"{tag}_img"] = np.stack(f_img)
    out[f"{tag}_it"] = np.asarray(i_t)
    out[f"{tag}_ia"] = np.stack(i_a)
    out[f"{tag}_ig"] = np.stack(i_g)


def render_main(frames_file):
    import numpy as np

    out = {}
    _render_set("e", *E_DIMS, N_FRAMES, out)
    _render_set("t", *T_DIMS, N_FRAMES_1024, out)
    np.savez(frames_file, **out)
    _log(f"wrote {frames_file} "
         f"({os.path.getsize(frames_file)/1e6:.0f} MB)")


# ----------------------------------------------------------------------
# device child: e2e runs + device-resident replay + ceiling + hotpath
# ----------------------------------------------------------------------
def _make_slam(W, H, F, max_kp=E_KP):
    from okvis2_tpu.frontend.detection import DetectionConfig
    from okvis2_tpu.graph.estimator import EstimatorConfig
    from okvis2_tpu.pipeline.frontend_pipeline import FrontendConfig
    from okvis2_tpu.pipeline.slam import SlamSystem

    cams, exts, imu_params = _build_rig(W, H, F)
    est_cfg = EstimatorConfig(
        window_slots=12, landmark_slots=512, obs_slots=4096,
        imu_seg_capacity=64,
        # the reference enforces a realtime budget sized to its target
        # rate (0.035 s for 20 Hz EuRoC on CPU; CeresIterationCallback,
        # config/euroc.yaml:80-83). Same policy, our target: the
        # 200 fps/chip north star means a 5 ms frame budget, so the
        # steady-state solve runs the min-iteration program — exactly
        # what the deployed on-chip config would do
        enforce_realtime=True,
        realtime_time_limit=1.0 / 200.0,
    )
    fe_cfg = FrontendConfig(
        detection=DetectionConfig(max_keypoints=max_kp),
        map_match_capacity=1024,
    )
    return SlamSystem(cams, exts, imu_params, est_cfg, fe_cfg,
                      pipelined=True)


def run_e2e(data, tag="e", capture=None, dims=E_DIMS):
    """One full pipelined run over the pre-rendered frames; optionally
    captures per-frame replay records into `capture`. Returns
    (stats, slam) — the live system is needed for the device-loop
    replay (its frontend/estimator hold the device-resident state the
    captured dispatches chain through)."""
    import numpy as np

    slam = _make_slam(*dims)
    if capture is not None:
        slam._bench_record = capture
    f_t, f_img = data[f"{tag}_ft"], data[f"{tag}_img"]
    i_t, i_a, i_g = data[f"{tag}_it"], data[f"{tag}_ia"], data[f"{tag}_ig"]
    ii = 0
    frame_times = []
    for fi in range(len(f_t)):
        while ii < len(i_t) and i_t[ii] <= f_t[fi] + 1e-9:
            slam.add_imu_measurement(i_t[ii], i_a[ii], i_g[ii])
            ii += 1
        slam.add_images(float(f_t[fi]), list(f_img[fi]))
        t0 = time.perf_counter()
        slam.process_frame()
        frame_times.append(time.perf_counter() - t0)
        if len(frame_times) % 20 == 1:
            _log(f"frame {len(frame_times)}: {frame_times[-1]*1e3:.0f} ms")
    slam.finish()
    warmup = min(12, len(frame_times) // 3)
    steady = np.asarray(frame_times[warmup:])
    return {
        "e2e_fps": float(1.0 / steady.mean()),
        "e2e_ms_p50": float(np.median(steady) * 1e3),
        "e2e_frames": len(frame_times),
    }, slam


def replay_device_loop(slam, records, n_pass=3, mode="full",
                       frontend_only=False):
    """Re-dispatch the captured frames' program chain with every carrier
    PRE-STAGED on device: zero host transfers in the timed region, one
    block_until_ready at the end. This is the per-chip throughput with
    the tunnel taken out of the picture.

    mode: "full" (fused frontend + fused solve with device-side match
    append), "frontend" (fused frontend program alone), or "solve"
    (fused solve alone, re-dispatched on FIXED frontend outputs from an
    untimed prior pass — isolates the realtime LM's device cost)."""
    import collections

    import jax
    import jax.numpy as jnp

    from okvis2_tpu.solver.packed_solve import (
        MAX_APPEND_SETS,
        solve_packed_fused_carrier,
    )

    if frontend_only:
        mode = "frontend"
    fe, est = slam.frontend, slam.estimator
    carr = [jnp.asarray(r["carrier"]) for r in records]
    jax.block_until_ready(carr)

    fixed_ctx = None
    if mode == "solve":
        # one untimed frontend pass pins each frame's match sets + diag
        fixed_ctx = []
        pend = collections.deque(maxlen=MAX_APPEND_SETS - 1)
        for r, cd in zip(records, carr):
            ctx = fe.dispatch_prepared(r["prep"], cd)
            match_sets = list(pend) + [ctx["match"]]
            while len(match_sets) < MAX_APPEND_SETS:
                match_sets.append(ctx["match"])
            fixed_ctx.append((
                tuple((m["idx"], m["keep"], m["xy"], m["size"])
                      for m in match_sets),
                ctx["diag"],
            ))
            pend.append(ctx["match"])
        jax.block_until_ready([c[1] for c in fixed_ctx])

    def one_pass():
        outs = []
        pend = collections.deque(maxlen=MAX_APPEND_SETS - 1)
        for i, (r, cd) in enumerate(zip(records, carr)):
            if mode == "solve":
                sets, diag = fixed_ctx[i]
            else:
                ctx = fe.dispatch_prepared(r["prep"], cd)
                if mode == "frontend":
                    outs.append(ctx["diag"])
                    continue
                match_sets = list(pend) + [ctx["match"]]
                while len(match_sets) < MAX_APPEND_SETS:
                    match_sets.append(ctx["match"])
                sets = tuple((m["idx"], m["keep"], m["xy"], m["size"])
                             for m in match_sets)
                diag = ctx["diag"]
                pend.append(ctx["match"])
            out = solve_packed_fused_carrier(
                cd, sets, diag, est.cameras, est.imu_params,
                r["off_solve"], r["layout"], r["scfg"],
            )
            outs.append(out)
        return outs

    jax.block_until_ready(one_pass())  # warm
    t0 = time.perf_counter()
    outs = []
    for _ in range(n_pass):
        outs.extend(one_pass())
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return n_pass * len(records) / dt


def bench_link_ceiling(n=50):
    """The fastest ANY frame loop can go over this host<->device link:
    one stereo-frame upload + a trivial dispatch + a lagged
    background-thread fetch, back-to-back. On the axon dev tunnel every
    RPC serialises, so this — not compute — is the e2e ceiling; on
    local-PCIe hardware the same loop runs two orders of magnitude
    faster."""
    import threading

    import numpy as np

    import jax
    import jax.numpy as jnp

    imgs = np.zeros((2, E_DIMS[1], E_DIMS[0]), np.uint8)

    @jax.jit
    def step(a):
        x = a.astype(jnp.float32).sum()
        return jnp.stack([x, x + 1.0])

    np.asarray(step(jnp.asarray(imgs)))  # warm
    pending = None
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        if pending is not None:
            pending[0].join()
        out = step(jnp.asarray(imgs))
        fut = {}
        th = threading.Thread(
            target=lambda o=out, f=fut: f.update(arr=np.asarray(o)),
            daemon=True,
        )
        th.start()
        pending = (th, fut)
        times.append(time.perf_counter() - t0)
    pending[0].join()
    ft = np.asarray(times[10:])
    return float(1.0 / ft.mean())


def bench_hotpath():
    """Round-1's fused detect+describe+match+3-iter-BA kernel (kept for
    cross-round continuity)."""
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    from okvis2_tpu.frontend.descriptor import describe_keypoints
    from okvis2_tpu.frontend.detection import (
        DetectionConfig,
        detect_keypoints_batch,
    )
    from okvis2_tpu.frontend.matching import match_descriptors
    from okvis2_tpu.solver.gauss_newton import solve_window
    from okvis2_tpu.solver.window_problem import SolverConfig
    from okvis2_tpu.utils import synthetic

    dtype = jnp.float32
    W, H = E_DIMS[0], E_DIMS[1]
    det_cfg = DetectionConfig(max_keypoints=E_KP)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, H, W)), dtype)

    def frontend_step(ims):
        det = detect_keypoints_batch(ims, det_cfg)
        desc = jax.vmap(describe_keypoints)(
            ims, det["xy"], det["size"], det["mask"]
        )
        m = match_descriptors(
            desc["signs"][0], det["mask"][0],
            desc["signs"][1], det["mask"][1],
        )
        return det["xy"], desc["signs"], m["idx_b"]

    frontend_step = jax.jit(frontend_step)

    problem, cams, imu_params, _ = synthetic.build_problem(
        num_states=5, n_landmarks_side=8
    )
    problem = dataclasses.replace(
        problem,
        pose_frozen=jnp.zeros(problem.S, bool).at[0].set(True),
    )
    problem = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, problem
    )
    cams = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float64 else a,
        cams,
    )
    imu_params = jax.tree_util.tree_map(lambda a: a.astype(dtype), imu_params)
    solver_cfg = SolverConfig(max_iterations=3)

    xy, signs, idx = frontend_step(imgs)
    solved, stats = solve_window(problem, cams, imu_params, solver_cfg)
    jax.block_until_ready((xy, signs, idx, solved.pose))

    n_frames = 50
    t0 = time.perf_counter()
    for _ in range(n_frames):
        xy, signs, idx = frontend_step(imgs)
        solved, stats = solve_window(problem, cams, imu_params, solver_cfg)
    jax.block_until_ready((xy, signs, idx, solved.pose))
    return n_frames / (time.perf_counter() - t0)


def _save_state(state_file, state):
    tmp = state_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, state_file)


def device_main(state_file, frames_file):
    import numpy as np

    state = {}
    if os.path.exists(state_file):
        with open(state_file) as f:
            state = json.load(f)
        _log(f"resuming with phases done: {sorted(state)}")
    data = np.load(frames_file)

    records, cap_slam = None, None

    if "e2e" not in state:
        from okvis2_tpu.utils.timing import Timing

        runs = []
        for i in range(3):
            capture = [] if i == 2 else None
            res, slam = run_e2e(data, capture=capture)
            runs.append(res)
            _log(f"e2e run {i}: {res['e2e_fps']:.2f} fps "
                 f"(p50 {res['e2e_ms_p50']:.1f} ms)")
            if capture is not None:
                records, cap_slam = capture, slam
        prep = Timing.get("1 prep (frontend aux + pack)")
        pack = Timing.get("3.1 pack_np + fill")
        state["e2e"] = {
            "runs": runs,
            "prep_ms_p50": round(prep.p50 * 1e3, 2) if prep else None,
            "pack_ms_p50": round(pack.p50 * 1e3, 2) if pack else None,
        }
        _save_state(state_file, state)

    if "device_loop" not in state:
        if records is None:
            capture = []
            _res, cap_slam = run_e2e(data, capture=capture)
            records = capture
        # steady-state subset: past warmup, away from startup keyframes
        sel = records[16:48] if len(records) > 48 else records[8:]
        fps = replay_device_loop(cap_slam, sel)
        fps_fe = replay_device_loop(cap_slam, sel, mode="frontend")
        fps_sv = replay_device_loop(cap_slam, sel, mode="solve")
        state["device_loop"] = {
            "fps": round(fps, 2), "n": len(sel),
            # stage breakdown (VERDICT r4 #1/#3): fused frontend program
            # alone, and the fused solve alone on fixed frontend outputs
            "frontend_only_fps": round(fps_fe, 2),
            "solve_only_fps": round(fps_sv, 2),
            "frontend_ms": round(1e3 / fps_fe, 2),
            "solve_ms": round(1e3 / fps_sv, 2),
        }
        _log(f"device_loop: {fps:.1f} fps (frontend-only {fps_fe:.1f}, "
             f"solve-only {fps_sv:.1f}) over {len(sel)} frames")
        _save_state(state_file, state)

    if "link_ceiling" not in state:
        state["link_ceiling"] = round(bench_link_ceiling(), 2)
        _save_state(state_file, state)

    if "hotpath" not in state:
        state["hotpath"] = round(bench_hotpath(), 2)
        _save_state(state_file, state)

    if "device_loop_1024" not in state:
        try:
            capture = []
            _res, slam1024 = run_e2e(data, tag="t", capture=capture,
                                     dims=T_DIMS)
            # SAME steady-state maturity window as the EuRoC replay
            # (VERDICT r4 #2: capture[8:] of a young 24-frame run made
            # the stress config read faster than nominal)
            sel = capture[16:48] if len(capture) > 48 else capture[8:]
            fps = replay_device_loop(slam1024, sel)
            # stage breakdown: the 1024 scene is sparser (fewer map
            # matches -> fewer obs rows and LM iterations), so its solve
            # can be CHEAPER than the EuRoC-scale one even though its
            # frontend is slower — report both so the comparison is
            # attributable rather than mysterious
            fps_fe = replay_device_loop(slam1024, sel, mode="frontend")
            fps_sv = replay_device_loop(slam1024, sel, mode="solve")
            state["device_loop_1024"] = {
                "fps": round(fps, 2), "n": len(sel),
                "frontend_ms": round(1e3 / fps_fe, 2),
                "solve_ms": round(1e3 / fps_sv, 2),
            }
            _log(f"device_loop_1024: {fps:.1f} fps (frontend "
                 f"{1e3/fps_fe:.1f} ms, solve {1e3/fps_sv:.1f} ms)")
        except Exception as e:  # optional stress phase: never fatal
            state["device_loop_1024"] = {"error": str(e)[:200]}
        _save_state(state_file, state)


# ----------------------------------------------------------------------
# parent: orchestrate children, assemble the JSON line
# ----------------------------------------------------------------------
def _run_child(args, env=None, tries=3, phase="", timeout=1500,
               deadline=None):
    """Run a child with retries. Each attempt gets its own timeout —
    a hung axon tunnel handshake otherwise blocks forever (this is what
    ate the round-3 capture) — and a wall-clock deadline bounds the
    total. Children persist completed phases, so a killed attempt
    resumes instead of restarting."""
    for i in range(tries):
        if deadline is not None and time.time() > deadline:
            _log(f"{phase}: deadline reached, stopping retries")
            return False
        t = timeout
        if deadline is not None:
            t = max(60, min(t, deadline - time.time()))
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + args,
                env=env, timeout=t,
            )
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc == 0:
            return True
        _log(f"{phase} child attempt {i+1} failed (rc {rc})")
    return False


def main():
    for f in (STATE_FILE,):
        if os.path.exists(f):
            os.remove(f)

    # 1. render on CPU (the tunnel makes on-device rendering ~6 s/frame)
    if not os.path.exists(FRAMES_FILE):
        cpu_env = {
            k: v for k, v in os.environ.items()
            if k != "PALLAS_AXON_POOL_IPS"
        }
        cpu_env["JAX_PLATFORMS"] = "cpu"
        if not _run_child(["--render", FRAMES_FILE], env=cpu_env,
                          tries=2, phase="render"):
            _log("render failed — aborting")
            print(json.dumps({
                "metric": "stereo_vi_e2e_fps", "value": 0.0,
                "unit": "frames/sec", "vs_baseline": 0.0,
                "error": "render child failed",
            }))
            return

    # 2. all device phases in one resumable child (inherits the TPU env)
    ok = _run_child(["--device", STATE_FILE, FRAMES_FILE], tries=3,
                    phase="device", timeout=1500,
                    deadline=time.time() + 2700)

    state = {}
    if os.path.exists(STATE_FILE):
        with open(STATE_FILE) as f:
            state = json.load(f)

    out = {
        "metric": "stereo_vi_e2e_fps",
        "value": 0.0,
        "unit": "frames/sec (752x480 stereo, FULL pipeline: "
                "detect+describe+match+ransac+stereo-init+window-BA+"
                "marginalisation; median of 3 runs)",
        "vs_baseline": 0.0,
    }
    e2e = state.get("e2e")
    if e2e:
        fpss = sorted(r["e2e_fps"] for r in e2e["runs"])
        med = fpss[len(fpss) // 2]
        out["value"] = round(med, 2)
        out["vs_baseline"] = round(med / 200.0, 3)
        out["e2e_fps_runs"] = [round(f, 2) for f in fpss]
        out["e2e_ms_p50"] = round(
            sorted(r["e2e_ms_p50"] for r in e2e["runs"])[1], 1
        )
        out["prep_ms_p50"] = e2e.get("prep_ms_p50")
        out["pack_ms_p50"] = e2e.get("pack_ms_p50")
    if "device_loop" in state and "fps" in state["device_loop"]:
        out["device_loop_fps"] = state["device_loop"]["fps"]
        out["device_loop_vs_target"] = round(
            state["device_loop"]["fps"] / 200.0, 3
        )
        out["device_frontend_fps"] = state["device_loop"].get(
            "frontend_only_fps"
        )
        out["device_solve_fps"] = state["device_loop"].get("solve_only_fps")
        out["frontend_ms"] = state["device_loop"].get("frontend_ms")
        out["solve_ms"] = state["device_loop"].get("solve_ms")
    if "device_loop_1024" in state:
        d = state["device_loop_1024"]
        out["device_loop_1024_fps"] = d.get("fps", None)
        out["frontend_1024_ms"] = d.get("frontend_ms")
        out["solve_1024_ms"] = d.get("solve_ms")
    if "link_ceiling" in state:
        out["link_ceiling_fps"] = state["link_ceiling"]
        if e2e:
            out["e2e_vs_link_ceiling"] = round(
                out["value"] / state["link_ceiling"], 3
            )
    if "hotpath" in state:
        out["hotpath_kernel_fps"] = state["hotpath"]
    if not ok and not e2e:
        out["error"] = "device child failed after retries"
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--render":
        render_main(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "--device":
        device_main(sys.argv[2], sys.argv[3])
    else:
        main()
