"""SLAM system orchestration (the ThreadedSlam role).

Re-designs okvis::ThreadedSlam (reference: okvis_multisensor_processing/
src/ThreadedSlam.cpp:267-568 processFrame, :570-804
optimisePublishMarginalise) for the single-device async model: instead of
a pthread pipeline with queues between detector / matcher / optimiser
threads, the hot path is a sequence of jitted device programs with
host-side bookkeeping in between; XLA's async dispatch overlaps device
compute with the host's packing work, which is what the reference's
optimisation thread achieved (P3 in SURVEY.md §2.3).

Input side keeps the reference's contract: add_images/add_imu_measurement
feed time-ordered queues; process_frame pops the next synced frame set,
gathers IMU up to it, predicts, detects, associates, optimises,
marginalises, and fires the optimised-graph callback
(ViInterface::setOptimisedGraphCallback equivalent).
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Callable, Deque, List, Optional, Tuple

import numpy as np

from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.frontend_pipeline import Frontend, FrontendConfig

import jax.numpy as jnp


@dataclasses.dataclass
class TrackingState:
    """Mirror of okvis::TrackingState (ViInterface.hpp:143-180)."""

    id: int = -1
    is_keyframe: bool = False
    tracking_quality: str = "Good"  # Good | Marginal | Lost
    current_keyframe_id: int = -1


class SlamSystem:
    """End-to-end VIO/SLAM pipeline on one device."""

    def __init__(
        self,
        cameras,
        extrinsics: List[Transformation],
        imu_params: ImuParameters,
        estimator_config: EstimatorConfig = EstimatorConfig(),
        frontend_config: FrontendConfig = FrontendConfig(),
        do_loop_closures: bool = False,
        loop_closure_config=None,
        cnn_params=None,
        pipelined: bool = False,
    ):
        # Phase-B pipelined frame loop: ZERO blocking readbacks AND a
        # single upload RPC per steady-state frame. The frame's entire
        # host->device state (uint8 images | frontend aux | packed
        # solve problem) crosses the tunnel as ONE carrier buffer; the
        # fused frontend program's match rows are appended to the
        # packed window problem ON DEVICE and solved in the same
        # dispatch chain; each frame's combined [solve | diag] output
        # crosses back in a background thread and is consumed as soon
        # as it arrives (adaptive lag, bounded by MAX_APPEND_SETS-1
        # in-flight frames). Host bookkeeping (observation insertion,
        # keyframe work, loop closure, marginalisation) runs 1-2
        # frames behind the device.
        self.pipelined = pipelined
        # in-flight frames: dispatched, [solve|diag] copy crossing in a
        # background thread, host bookkeeping not yet run (oldest first)
        self._pending_frames: Deque[dict] = collections.deque()
        self.estimator = Estimator(
            cameras, extrinsics, imu_params, estimator_config
        )
        self.frontend = Frontend(cameras, extrinsics, frontend_config)
        self.imu_params = imu_params
        self.loop_backend = None
        if do_loop_closures:
            from okvis2_tpu.pipeline.full_graph import (
                LoopClosureBackend,
                LoopClosureConfig,
            )

            self.loop_backend = LoopClosureBackend(
                cameras, extrinsics,
                loop_closure_config or LoopClosureConfig(),
            )
            if pipelined:
                # compile the smallest full-graph program in the
                # background now so the first loop closure doesn't pay
                # a foreground (remote) compile stall
                self.loop_backend.prewarm_shapes_async(
                    self.estimator, 32, 64, 256, 64
                )
        self.cnn = None
        if cnn_params is not None:
            from okvis2_tpu.models.suppression import CnnSuppressor

            self.cnn = CnnSuppressor(cnn_params)
        self._imu_queue: Deque[Tuple[float, np.ndarray, np.ndarray]] = (
            collections.deque()
        )
        self._image_queue: Deque[Tuple[float, List[np.ndarray]]] = (
            collections.deque()
        )
        self._carrier_np: Optional[np.ndarray] = None
        # pose-correction epochs: every event that rewrites host poses
        # OUTSIDE the solve flow (loop-closure drift distribution,
        # full-graph apply, relocalisation, reinit) appends an entry;
        # in-flight frames dispatched before the event carry solves
        # packed from PRE-correction poses and must not undo it
        self._corr_epoch = 0
        self._corr_log: List[Optional[np.ndarray]] = []
        self._last_frame_t: Optional[float] = None
        self._callbacks: List[Callable] = []
        self.tracking = TrackingState()
        self.frames_processed = 0

    # ------------------------------------------------------------------
    # ViInterface-equivalent inputs
    # ------------------------------------------------------------------
    def add_imu_measurement(self, t: float, accel, gyro) -> bool:
        self._imu_queue.append(
            (float(t), np.asarray(accel, np.float64), np.asarray(gyro, np.float64))
        )
        csv = getattr(self, "_imu_csv", None)
        if csv is not None:
            g = np.asarray(gyro)
            a = np.asarray(accel)
            csv.write(
                f"{int(round(t*1e9))},{g[0]:.9f},{g[1]:.9f},{g[2]:.9f},"
                f"{a[0]:.9f},{a[1]:.9f},{a[2]:.9f}\n"
            )
        return True

    def add_images(self, t: float, images: List[np.ndarray]) -> bool:
        self._image_queue.append((float(t), images))
        return True

    def add_depth_image(self, t: float, depth: np.ndarray,
                        cam_idx: int = 0) -> bool:
        """Aligned depth frame [H,W] in meters (RealsenseRgbd path,
        reference RealsenseRgbd.cpp): enables depth-aided landmark
        initialisation at the next keyframe."""
        self._latest_depth = (float(t), cam_idx, np.asarray(depth))
        return True

    def _init_landmarks_from_depth(self, frames, sid: int) -> int:
        """Initialise landmarks for keypoints without one, using the
        aligned depth map (the reference's depth-aided frontend for
        RGBD rigs): p_C = ray * depth / ray_z."""
        latest = getattr(self, "_latest_depth", None)
        if latest is None:
            return 0
        t_d, ci, depth = latest
        est = self.estimator
        rec = est.states[sid]
        if abs(t_d - rec.t) > 0.1:
            return 0  # stale depth
        from okvis2_tpu.core import se3_np

        fr = frames[ci]
        used = {
            kp for (_l, c, kp) in est.obs_of_state(sid) if c == ci
        }
        H, W = depth.shape
        free = [
            kp for kp in np.nonzero(fr["mask"])[0]
            if int(kp) not in used
        ]
        if not free:
            return 0
        uv = fr["xy"][free]
        d = depth[
            np.clip(uv[:, 1].astype(int), 0, H - 1),
            np.clip(uv[:, 0].astype(int), 0, W - 1),
        ]
        ok = (d > 0.1) & (d < 15.0) & np.isfinite(d)
        if not ok.any():
            return 0
        import jax.numpy as jnp

        rays = np.asarray(
            self.frontend.cameras[ci].back_project(jnp.asarray(uv[ok]))
        )
        T_WC7 = se3_np.compose7(rec.pose, self.frontend.T_SC_np[ci])
        R_WC = se3_np.quat_to_mat(T_WC7[3:7])
        n = 0
        for ray, dz, kp in zip(rays, d[ok], np.asarray(free)[ok]):
            p_C = ray * (dz / max(ray[2], 1e-6))
            p_W = R_WC @ p_C + T_WC7[:3]
            lid = est.add_landmark(
                np.concatenate([p_W, [1.0]]), initialised=True
            )
            est.add_observation(
                lid, sid, ci, int(kp), fr["xy"][int(kp)],
                fr["size"][int(kp)],
            )
            self.frontend.table.stage_descriptor(lid, ci, int(kp))
            n += 1
        self.frontend.table.flush(frames[0]["stacked"]["signs"])
        return n

    def set_optimised_graph_callback(self, cb: Callable):
        self._callbacks.append(cb)

    # optional debug CSV taps (ViInterface::setImuCsvFile /
    # setTracksCsvFile, okvis_common/include/okvis/ViInterface.hpp:298-314)
    def set_imu_csv_file(self, path: str):
        self._imu_csv = open(path, "w")
        self._imu_csv.write("#timestamp,w_x,w_y,w_z,a_x,a_y,a_z\n")

    def set_tracks_csv_file(self, path: str):
        self._tracks_csv = open(path, "w")
        self._tracks_csv.write(
            "#timestamp,state_id,is_keyframe,num_matched,"
            "num_motion_stereo,ransac_inliers,num_landmarks\n"
        )

    # ------------------------------------------------------------------
    def _gather_imu(self, t0: Optional[float], t1: float):
        """Build the trapezoid IMU segment spanning exactly [t0, t1]:
        boundary measurements are linearly interpolated at the state
        timestamps like the reference (ImuError.cpp:318-334), so the
        preintegrated span matches the camera timestamps instead of being
        shifted by up to one IMU period (ThreadedSlam.cpp:276-341 role)."""
        # keep one sample beyond each boundary for interpolation
        meas = [
            m for m in self._imu_queue
            if (t0 is None or m[0] > t0 - 0.05) and m[0] <= t1 + 0.05
        ]
        # drop consumed entries well before t1 (keep overlap for the next
        # segment's left-boundary interpolation)
        while self._imu_queue and self._imu_queue[0][0] < t1 - 0.5:
            self._imu_queue.popleft()
        if len(meas) < 2:
            return np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0,))
        ts = np.asarray([m[0] for m in meas])
        acc = np.stack([m[1] for m in meas])
        gyr = np.stack([m[2] for m in meas])
        if t0 is None:
            # first frame: raw averages up to t1 (only used for the
            # gravity-alignment initial pose)
            sel = ts <= t1 + 0.005
            ts, acc, gyr = ts[sel], acc[sel], gyr[sel]
            if len(ts) < 2:
                return np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0,))
            w_avg = 0.5 * (gyr[:-1] + gyr[1:])
            a_avg = 0.5 * (acc[:-1] + acc[1:])
            dt = np.diff(ts)
            keep = dt > 0
            return w_avg[keep], a_avg[keep], dt[keep]
        # sample times: t0, interior measurements, t1 (np.interp clamps to
        # the edge values outside the measured range)
        interior = ts[(ts > t0) & (ts < t1)]
        tq = np.concatenate([[t0], interior, [t1]])
        g_at = np.stack([np.interp(tq, ts, gyr[:, i]) for i in range(3)], -1)
        a_at = np.stack([np.interp(tq, ts, acc[:, i]) for i in range(3)], -1)
        w_avg = 0.5 * (g_at[:-1] + g_at[1:])
        a_avg = 0.5 * (a_at[:-1] + a_at[1:])
        dt = np.diff(tq)
        keep = dt > 0
        return w_avg[keep], a_avg[keep], dt[keep]

    # ------------------------------------------------------------------
    def process_frame(self) -> bool:
        """Process the next queued frame set. Returns False if none."""
        if self.pipelined:
            return self._process_frame_pipelined()
        return self._process_frame_sync()

    def _process_frame_pipelined(self) -> bool:
        """Phase-B frame loop (see __init__), adaptive-lag carrier
        edition. Per frame:

        1. Finish every in-flight frame whose [solve|diag] copy has
           ARRIVED (non-blocking poll, oldest first); only when more
           than MAX_APPEND_SETS-2 frames are still crossing does the
           loop block on the oldest. On the axon dev tunnel a
           host-observed sync costs ~40-45 ms of pure latency but
           concurrent syncs overlap almost perfectly (tools/
           probe_concurrent_sync.py), so the fetches ride background
           threads and the loop's throughput is host-work-bound, not
           sync-latency-bound.
        2. Predict, then assemble the frame's ENTIRE host->device
           state — uint8 images | frontend aux | packed solve problem —
           into ONE carrier buffer: a single upload RPC.
        3. Dispatch the fused frontend and fused solve against the
           carrier. The solve appends the match rows of EVERY in-flight
           frame (their observations are not in the host pack yet) plus
           the current one, straight from the device-resident frontend
           outputs.
        """
        if not self._image_queue:
            return False
        from okvis2_tpu.solver.packed_solve import MAX_APPEND_SETS
        from okvis2_tpu.utils.timing import SwitchableTimer

        t, images = self._image_queue.popleft()
        est = self.estimator
        with SwitchableTimer("0 consume finished frames"):
            self._consume_pending(max_left=MAX_APPEND_SETS - 2)
        with SwitchableTimer("0.5 imu + predict"):
            imu_w, imu_a, imu_dt = self._gather_imu(
                self._last_frame_t, t
            )
            self._last_frame_t = t
            # the prediction is as fresh as the newest CONSUMED frame's
            # solve; still-crossing frames contribute IMU propagation
            sid = est.add_state(t, imu_w, imu_a, imu_dt)
            T_WS_pred7 = est.states[sid].pose

        with SwitchableTimer("1 prep (frontend aux + pack)"):
            prep = self.frontend.prepare_frame(
                est, images, sid, T_WS_pred7
            )
            sets = [
                {"sid": p["sid"], "slot_lid": p["ctx"]["slot_lid"]}
                for p in self._pending_frames
            ] + [{"sid": sid, "slot_lid": prep["slot_lid"]}]
            layout, scfg, buf_all = est.prepare_fused_solve(
                sid, self.frontend.table, sets
            )
            imgs = prep["imgs_u8"]
            n_img = imgs.nbytes
            off_solve = n_img + prep["aux_all"].nbytes
            total = off_solve + buf_all.nbytes
            carrier = getattr(self, "_carrier_np", None)
            if carrier is None or carrier.size != total:
                carrier = np.empty(total, np.uint8)
                self._carrier_np = carrier
            carrier[:n_img] = imgs.reshape(-1)
            carrier[n_img:off_solve] = prep["aux_all"].view(np.uint8)
            carrier[off_solve:] = buf_all.view(np.uint8)
        with SwitchableTimer("2 carrier upload + dispatches"):
            carrier_dev = jnp.asarray(carrier)
            ctx = self.frontend.dispatch_prepared(prep, carrier_dev)
            match_sets = [
                p["ctx"]["match"] for p in self._pending_frames
            ] + [ctx["match"]]
            while len(match_sets) < MAX_APPEND_SETS:
                # padding sets are disabled by their all--1 slot maps
                match_sets.append(ctx["match"])
            out = est.dispatch_fused_solve_carrier(
                match_sets, ctx["diag"], carrier_dev, off_solve,
                layout, scfg,
            )
        # fetch the combined output in a BACKGROUND thread: numpy's
        # device->host conversion releases the GIL, the ~40-45 ms sync
        # latency is paid off the critical path, and concurrent fetches
        # of several in-flight frames overlap on the tunnel
        import threading

        fut = {}

        def _fetch(o=out, f=fut):
            try:
                f["arr"] = np.asarray(o)
            except Exception as e:  # surfaced at join time
                f["err"] = e

        th = threading.Thread(target=_fetch, daemon=True)
        th.start()
        rec = getattr(self, "_bench_record", None)
        if rec is not None:
            # device-loop bench capture: everything needed to re-dispatch
            # this frame's program chain with the carrier pre-staged on
            # device (bench.py replay_device_loop)
            rec.append({
                "prep": prep, "carrier": carrier.copy(),
                "off_solve": off_solve, "layout": layout, "scfg": scfg,
            })
        self._pending_frames.append({
            "t": t, "sid": sid, "ctx": ctx, "out": out,
            "solve_t0": est._solve_t0,
            "fetch": (th, fut),
            "slot_of": dict(est._slot_of), "lm_ids": list(est._lm_ids),
            "images": images, "epoch": self._corr_epoch,
        })
        self.frames_processed += 1
        return True

    def _consume_pending(self, max_left: int):
        """Finish in-flight frames, oldest first: every frame whose
        fetch has completed is consumed without blocking; when more
        than `max_left` frames would remain in flight, block on the
        oldest (bounds the bookkeeping lag and the device-append set
        count). max_left=0 drains the pipeline."""
        q = self._pending_frames
        # test hook: keep >= _force_min_pending frames in flight so the
        # multi-set device append is exercised even where fetches
        # complete instantly (CPU backend)
        min_pending = getattr(self, "_force_min_pending", 0)
        while q:
            if max_left > 0 and len(q) <= min_pending:
                break
            p = q[0]
            th = p["fetch"][0]
            if th.is_alive() and len(q) <= max_left:
                break
            q.popleft()
            self._finish_one(p)

    def _note_pose_correction(self, T_corr7):
        """Record a host-pose rewrite outside the solve flow. Pass the
        world-frame left correction 7-vector when the rewrite is RIGID
        (relocalisation: the whole session moved by one transform), or
        None when it is not (loop-closure drift distribution grades the
        correction along the chain; a full-graph solve moves states
        individually). _finish_one composes rigid corrections onto
        stale in-flight solves and skips non-rigidly-invalidated ones."""
        self._corr_log.append(
            None if T_corr7 is None
            else np.asarray(T_corr7, np.float64).copy()
        )
        self._corr_epoch += 1

    _CORR_SKIP = object()

    def _net_correction_since(self, epoch):
        """Net pose correction applied since `epoch`: None (nothing),
        a 7-vector (compose onto the solve), or _CORR_SKIP (a
        non-rigid rewrite happened — the stale solve must not apply)."""
        entries = self._corr_log[epoch:]
        if not entries:
            return None
        if any(e is None for e in entries):
            return SlamSystem._CORR_SKIP
        from okvis2_tpu.core import se3_np

        net = entries[0]
        for e in entries[1:]:  # later corrections left-compose
            net = se3_np.compose7(e, net)
        return net

    def _keyframe_tail(self, sid, frames, images):
        """Host keyframe work that needs the fetched descriptors:
        depth-aided init, frontier expansion, CNN suppression, place
        recognition and multi-session relocalisation. Returns the
        detected loop keyframe id (or None). Runs inline on the
        synchronous path, one frame deferred on the pipelined path."""
        est = self.estimator
        from okvis2_tpu.utils.timing import SwitchableTimer

        loop_old_id = None
        # depth-aided landmark initialisation (RGBD rigs)
        if getattr(self, "_latest_depth", None) is not None:
            self._init_landmarks_from_depth(frames, sid)
        # frontier re-activation: if this keyframe re-observes a
        # pose-graph frame's stored landmarks, bring that frame back
        # (expandKeyframe, ViSlamBackend.cpp:357-406)
        est.expand_keyframe(sid)
        # CNN sky/person landmark suppression (Frontend.cpp:969-1011)
        if self.cnn is not None:
            with SwitchableTimer("2.07 cnn suppression"):
                self.cnn.suppress(est, frames, sid, images)
        # place recognition / loop closure (Frontend.cpp:674-899)
        if self.loop_backend is not None:
            with SwitchableTimer("2.06 place recognition"):
                loop_old_id = self.loop_backend.detect_loop(
                    est, sid, frames, self.frontend
                )
                self.loop_backend.add_keyframe(est, sid, frames)
            # keep the full-graph program compiled AHEAD of the first
            # loop closure: predict the pow2 pack shape from cheap host
            # counts and background-compile it (pipelined only — on the
            # CPU test path background compiles contend for the cores)
            if self.pipelined:
                self.loop_backend.prewarm_predicted(est)
            # multi-session relocalisation against loaded components
            # (their own databases; works from an unknown pose)
            if self.loop_backend.has_components():
                v = self.loop_backend.relocalise(est, sid, frames)
                if v is not None:
                    self._apply_relocalisation(est, sid, frames, v)
        return loop_old_id

    def _finish_deferred_keyframe(self):
        """Pipelined: consume the previous keyframe's deferred extras
        (their background fetches have been crossing since the
        keyframe's finish) and run the keyframe tail, including any
        loop closure."""
        pk = getattr(self, "_pending_kf", None)
        if pk is None:
            return
        self._pending_kf = None
        est = self.estimator
        sid = pk["sid"]
        if sid not in est.states:
            return  # the keyframe's state left the graph meanwhile
        from okvis2_tpu.utils.timing import SwitchableTimer

        frames = pk["frames"]
        with SwitchableTimer("2.05 keyframe extras finish"):
            self.frontend.finish_keyframe_extras(est, pk)
            loop_old_id = self._keyframe_tail(sid, frames, pk["images"])
        if loop_old_id is not None:
            closed = self.loop_backend.close_loop(
                est, loop_old_id, sid, frames, self.frontend,
                async_solve=True,
            )
            if closed:
                # drift distribution graded poses along the chain: any
                # in-flight solve packed before it is now stale
                self._note_pose_correction(None)

    def _finish_one(self, p):
        """Consume one in-flight frame's combined [solve | diag] output
        and run its host bookkeeping: observation insertion, solve
        application, keyframe work, loop closure, marginalisation,
        callbacks — the lagged half of the pipelined loop."""
        est = self.estimator
        from okvis2_tpu.utils.timing import SwitchableTimer

        # a full-graph solve dispatched at the last loop closure lands
        # here, one frame later (its copy crossed in the background)
        if self.loop_backend is not None:
            fg = self.loop_backend.apply_pending_full_graph(est)
            if fg is not None:
                # the full-graph apply moved states individually (plus a
                # rigid re-anchor of newer ones): older in-flight
                # realtime solves must not overwrite it
                self._note_pose_correction(None)
        # the previous keyframe's deferred extras precede this frame's
        # bookkeeping (its staged descriptor sources must stay aligned)
        self._finish_deferred_keyframe()
        with SwitchableTimer("0.1 lagged [solve|diag] fetch"):
            th, fut = p["fetch"]
            th.join()
            if "err" in fut:
                raise fut["err"]
            out = fut["arr"]  # fetched in the background
        n_solve = est.solve_out_size()
        solve_np, diag_np = out[:n_solve], out[n_solve:]
        sid = p["sid"]
        with SwitchableTimer("0.2 finish bookkeeping"):
            frames, m = self.frontend.finish_frame(est, p["ctx"], diag_np)
            corr = self._net_correction_since(
                p.get("epoch", self._corr_epoch)
            )
            if corr is SlamSystem._CORR_SKIP:
                # a non-rigid pose rewrite (loop closure / full-graph
                # apply) postdates this frame's dispatch: applying its
                # solve would revert the corrected poses. Skip it — the
                # next frame's solve was packed from corrected state.
                pass
            else:
                est.apply_solved_flat(
                    solve_np, p["slot_of"], p["lm_ids"], T_corr7=corr,
                    solve_t0=p["solve_t0"],
                )
        if est.cfg.online_extrinsics:
            self.frontend.T_SC_np = [r.copy() for r in est.T_SC]
        with SwitchableTimer("0.3 epilogue"):
            self._frame_epilogue(
                p["t"], sid, frames, m, p["images"], dispatch_solve=False
            )

    def _finish_pending(self):
        """Drain every in-flight frame (blocking, oldest first)."""
        self._consume_pending(max_left=0)

    def finish(self):
        """Drain the pipelined loop (call after the last frame)."""
        self._finish_pending()
        # a keyframe in the final frame leaves its extras deferred
        self._finish_deferred_keyframe()
        if self.loop_backend is not None:
            # a full-graph solve dispatched by the very last frame's
            # loop closure still needs integrating
            self.loop_backend.apply_pending_full_graph(self.estimator)

    def _process_frame_sync(self) -> bool:
        if not self._image_queue:
            return False
        t, images = self._image_queue.popleft()
        est = self.estimator

        from okvis2_tpu.utils.timing import SwitchableTimer

        imu_w, imu_a, imu_dt = self._gather_imu(self._last_frame_t, t)
        self._last_frame_t = t
        sid = est.add_state(t, imu_w, imu_a, imu_dt)
        rec = est.states[sid]
        T_WS_pred7 = rec.pose  # numpy [7], IMU-propagated prediction
        # (one-solve-stale: the previous frame's solve integrates while
        # the fused frontend program runs — see hook below; the match
        # gates tolerate the few-mm staleness and the pack re-predicts)

        # the PREVIOUS frame's solve output rides this frame's single
        # readback (the tunnel serialises RPCs, so a separate fetch
        # would cost its own ~60 ms roundtrip); its integration is the
        # reference's join-optimisation-thread-before-matching overlap
        # (ThreadedSlam.cpp:466-469)
        pending = est.take_pending_solve()
        extra = (
            pending[0] if pending is not None
            else np.zeros(est.solve_out_size(), np.float32)
        )

        # 1+2. detect+describe+match-to-map+rig-RANSAC+motion-stereo as
        # ONE device dispatch with ONE readback
        with SwitchableTimer("1 frontend (fused)"):
            frames, m = self.frontend.associate_frame(
                est, images, sid, T_WS_pred7, extra_flat=extra,
            )
        if pending is not None:
            with SwitchableTimer("0 apply previous solve"):
                est.apply_solved_flat(m["extra"], pending[1], pending[2])
                est.repredict_from_previous(sid)
            if est.cfg.online_extrinsics:
                # calibrated extrinsics feed back into the frontend's
                # projection/epipolar geometry
                self.frontend.T_SC_np = [r.copy() for r in est.T_SC]
        self._frame_epilogue(t, sid, frames, m, images,
                             dispatch_solve=True)
        self.frames_processed += 1
        return True

    def _frame_epilogue(self, t, sid, frames, m, images,
                        dispatch_solve: bool):
        """Keyframe work, loop closure, (optionally) the realtime solve
        dispatch, marginalisation, tracking state and callbacks — shared
        by the synchronous and pipelined frame loops."""
        est = self.estimator
        from okvis2_tpu.utils.timing import SwitchableTimer

        # 3. keyframe decision (before stereo init, like the reference)
        is_kf = self.frontend.need_new_keyframe(est, frames, sid)
        est.set_keyframe(sid, is_kf)
        loop_old_id = None
        if is_kf:
            self.frontend.last_keyframe_id = sid
            if self.pipelined:
                # keyframe extras need two host syncs (descriptor fetch
                # + static-stereo results, ~45 ms of latency each over
                # the tunnel): dispatch the device work now, let the
                # fetches cross in a background thread, and run the
                # whole keyframe tail (stereo insertion, expand, CNN,
                # place recognition, loop closure) at the NEXT finish
                with SwitchableTimer("2.05 keyframe extras dispatch"):
                    pk = self.frontend.dispatch_keyframe_extras(
                        est, frames, sid
                    )
                    pk["images"] = images
                    self._pending_kf = pk
            else:
                # synchronous path: blocking extras + the tail inline
                with SwitchableTimer("2.05 keyframe extras"):
                    self.frontend.fetch_signs(frames)
                    self.frontend.match_stereo(est, frames, sid)
                    self.frontend.remember_keyframe_frames(sid, frames)
                loop_old_id = self._keyframe_tail(sid, frames, images)

        # 5b. loop closure first (it rewrites poses + landmarks and
        # solves the full graph inline; the realtime dispatch below then
        # starts from the corrected state)
        if loop_old_id is not None:
            # pipelined: dispatch the full-graph solve and integrate it
            # at the NEXT frame (the reference backgrounds this work,
            # ViSlamBackend.cpp:1726-1757); the drift distribution has
            # already corrected the live states synchronously
            self.loop_backend.close_loop(
                est, loop_old_id, sid, frames, self.frontend,
                async_solve=self.pipelined,
            )

        # 5. dispatch the realtime window solve; its results integrate
        # at the START of the next frame (no blocking here). The
        # pipelined loop skips this: its solve already ran fused with
        # the frame's own dispatch chain.
        if dispatch_solve:
            with SwitchableTimer("3 optimise dispatch"):
                est.optimise_async()

        # 6. marginalisation strategy (host bookkeeping; uses the state
        # as of the last applied solve, like the reference's
        # applyStrategy running in the optimisation thread)
        with SwitchableTimer("5 marginalise"):
            est.apply_marginalisation_strategy()
            est.clean_unobserved_landmarks()

        # 7. tracking state + callbacks; lost-tracking recovery
        # (thresholds as ThreadedSlam.cpp:628-634; restart path as
        # Frontend.cpp:1048-1055 / ViSlamBackend clear+reinit)
        q = self.frontend.tracking_quality(est, frames, sid)
        quality = "Good" if q > 0.05 else ("Marginal" if q > 0.01 else "Lost")
        if quality == "Lost" and self.frames_processed > 5:
            self._lost_count = getattr(self, "_lost_count", 0) + 1
            if self._lost_count >= 5:
                self._reinitialise()
        else:
            self._lost_count = 0
        self.tracking = TrackingState(
            id=sid,
            is_keyframe=is_kf,
            tracking_quality=quality,
            current_keyframe_id=self.frontend.last_keyframe_id or -1,
        )
        for cb in self._callbacks:
            cb(t, sid, est.states[sid].pose.copy(), self.tracking)
        tracks_csv = getattr(self, "_tracks_csv", None)
        if tracks_csv is not None:
            tracks_csv.write(
                f"{int(round(t*1e9))},{sid},{int(is_kf)},"
                f"{m.get('num_matched', 0)},"
                f"{m.get('num_motion_stereo', 0)},"
                f"{m.get('ransac_inliers', 0)},{len(est.landmarks)}\n"
            )

    # ------------------------------------------------------------------
    def _apply_relocalisation(self, est, sid, frames, v):
        """Multi-session relocalisation: when the verified map-frame
        pose disagrees with the session estimate, rigidly move the
        ENTIRE session (states, world velocities, session landmarks —
        not the loaded map) onto the map frame, then adopt the matched
        old-map landmarks as observations of this frame (the reference
        re-anchors via T_AiS and the loop-closure machinery,
        ViSlamBackend.hpp:686-687, Frontend.cpp:674-749)."""
        from okvis2_tpu.core import se3_np

        T_meas = np.asarray(v["T_WS7"])
        T_est = est.states[sid].pose
        d_pos = float(np.linalg.norm(T_meas[:3] - T_est[:3]))
        dq = se3_np.quat_mul(
            se3_np.quat_conj(T_est[3:7]), T_meas[3:7]
        )
        d_rot = float(np.linalg.norm(se3_np.log_so3(dq)))
        if d_pos > 0.05 or d_rot > 0.05:
            T_corr = se3_np.compose7(T_meas, se3_np.inverse7(T_est))
            R = se3_np.quat_to_mat(T_corr[3:7])
            loaded = getattr(self, "_loaded_lids", set())
            for rec in est.states.values():
                rec.pose = se3_np.compose7(T_corr, rec.pose)
                rec.speed_bias = rec.speed_bias.copy()
                rec.speed_bias[:3] = R @ rec.speed_bias[:3]
            for lid, lm in est.landmarks.items():
                if lid in loaded:
                    continue
                hp = lm.hp_W
                p = R @ hp[:3] + T_corr[:3] * hp[3]
                lm.hp_W = np.concatenate([p, hp[3:4]])
            # the session moved rigidly: compose the same correction
            # onto in-flight solves packed before this point (they have
            # no full-graph backstop, unlike loop closures)
            self._note_pose_correction(T_corr)
        self.loop_backend._merge_loop_landmarks(
            est, sid, v["pairs"], frames, self.frontend
        )
        self._relocalisations = getattr(self, "_relocalisations", 0) + 1

    # ------------------------------------------------------------------
    def _reinitialise(self):
        """Tracking lost for several frames: keep trajectory history but
        restart the landmark map and window from the current state."""
        est = self.estimator
        keep = est.window[-1:]
        for sid in est.window[:-1]:
            est.states[sid].in_window = False
        est.window = list(keep)
        est.landmarks.clear()
        est._by_state.clear()
        est._obs_rev = getattr(est, "_obs_rev", 0) + 1
        est.pose_graph_edges.clear()
        self.frontend.lm_descriptors.clear()
        self.frontend.last_keyframe_id = None
        self._lost_count = 0
        # landmark map restarted: stale in-flight solves must not apply
        self._note_pose_correction(None)

    # ------------------------------------------------------------------
    def trajectory(self):
        # full drain, INCLUDING a full-graph solve dispatched by the
        # final keyframe's loop closure — trajectory() is how the
        # parity/regression drives read ATE, so it must not silently
        # discard the last loop-closure optimisation
        self.finish()
        return self.estimator.trajectory()

    # ------------------------------------------------------------------
    # map save/load (ThreadedSlam::saveMap + Frontend::loadComponent)
    # ------------------------------------------------------------------
    def save_map(self, path: str):
        """Serialise the session graph incl. landmark descriptors
        (Component::save, okvis_ceres/src/Component.cpp:405-526)."""
        from okvis2_tpu.pipeline.component_io import save_component

        descs = {}
        for lid, signs in self.frontend.lm_descriptors.items():
            bits = (np.asarray(signs) > 0).astype(np.uint32).reshape(-1, 32)
            packed = (bits << np.arange(32, dtype=np.uint32)).sum(
                axis=-1, dtype=np.uint32
            )
            descs[lid] = packed
        save_component(path, self.estimator, descs)

    def load_map(self, path: str):
        """Load a previous session as localisation context: landmarks
        with descriptors become matchable map points and keyframes enter
        the place-recognition database-eligible store
        (Frontend::loadComponent, Frontend.cpp:180-218)."""
        from okvis2_tpu.pipeline.component_io import load_component

        data = load_component(path)
        id_map = {}
        for lid, hp in data["landmarks"].items():
            new_id = self.estimator.add_landmark(hp, initialised=True)
            id_map[lid] = new_id
        loaded = {}
        kf_docs = {}
        for obs in data["observations"]:
            if obs["lid"] not in id_map:
                continue
            new_id = id_map[obs["lid"]]
            kf_docs.setdefault(obs["sid"], []).append(new_id)
            if "descriptor" in obs:
                packed = obs["descriptor"]
                bits = (
                    (packed[:, None] >> np.arange(32, dtype=np.uint32)) & 1
                ).reshape(-1)
                signs = np.where(bits > 0, 1.0, -1.0).astype(np.float32)
                self.frontend.lm_descriptors[new_id] = signs
                loaded[new_id] = signs
        # the loaded landmarks must enter the device-resident matching
        # table or match-to-map will never see them (flush staged
        # updates first: load_host_descriptors snapshots the table)
        self.frontend._flush_staged()
        self.frontend.table.load_host_descriptors(loaded)
        # landmarks of this load are anchored to the loaded map frame:
        # a relocalisation correction moves the SESSION, not them
        self._loaded_lids = getattr(self, "_loaded_lids", set())
        self._loaded_lids |= set(id_map.values())
        # per-component place-recognition database: relocalisation from
        # an unknown pose (Frontend.cpp:180-218, 674-749)
        if self.loop_backend is not None and loaded:
            self.loop_backend.add_component(kf_docs, loaded)
        return len(id_map)

    # ------------------------------------------------------------------
    def do_final_ba(self, iterations: int = 30, mesh=None):
        """Offline final bundle adjustment (doFinalBa)."""
        from okvis2_tpu.pipeline.final_ba import do_final_ba

        return do_final_ba(self.estimator, iterations, mesh)
