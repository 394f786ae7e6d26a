"""Sliding-window VI estimator: host bookkeeping + jitted device solves.

This is the re-design of the reference's estimation backend stack —
ViGraph (okvis_ceres/include/okvis/ViGraph.hpp:83-618), ViGraphEstimator
(graph surgery: IMU-frame elimination, keyframe->pose-graph conversion,
freezing — okvis_ceres/src/ViGraphEstimator.cpp) and the realtime half of
ViSlamBackend (okvis_ceres/src/ViSlamBackend.cpp:71-886) — around the
XLA constraint of fixed shapes:

- ALL dynamic bookkeeping (which states/landmarks/observations exist,
  keyframe flags, covisibility, marginalisation decisions) lives on the
  host in plain Python/numpy — mirroring the reference's data structures.
- every `optimise()` call *packs* the current window into the fixed-shape
  `WindowProblem` and runs the single compiled LM program; results are
  unpacked back. Packing is O(window) numpy work; the compiled program is
  reused for the life of the process.
- IMU segments keep their raw measurement buffers so "eliminateStateByImuMerge"
  (ViGraphEstimator.cpp:57-157) is just buffer concatenation + lazy
  re-preintegration (cached per link at a linearisation bias, redone when
  the bias estimate drifts — same policy as ImuError, threshold 0.1).
- keyframe -> pose-graph conversion computes a relocatable 6x6 relative
  factor by landmark Schur marginalisation on device
  (factors/two_pose.py ~ TwoPoseGraphError.cpp:146-387) and keeps the
  original observations host-side for reversibility
  (convertToObservations, ViGraphEstimator.cpp:758-835).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.factors.two_pose import compute_two_pose_factor
from okvis2_tpu.graph.mst import max_spanning_tree
from okvis2_tpu.imu.preintegration import (
    ImuParameters,
    init_pose_from_accel,
    preintegrate,
)
from okvis2_tpu.solver.gauss_newton import solve_window
from okvis2_tpu.solver.window_problem import SolverConfig, WindowProblem


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    # window composition (reference config/euroc.yaml:75-77)
    num_keyframes: int = 5
    num_imu_frames: int = 3
    num_loop_closure_frames: int = 3
    num_pose_graph_frames: int = 6  # unfrozen pose-graph frames kept in window
    # capacities (static shapes)
    window_slots: int = 16
    landmark_slots: int = 512
    obs_slots: int = 4096
    imu_seg_capacity: int = 256
    rel_slots: int = 32
    two_pose_obs_capacity: int = 256
    two_pose_lm_capacity: int = 96
    # solver: iteration budget (the jitted-solver analogue of the
    # reference's CeresIterationCallback wall-clock budget,
    # okvis_ceres/src/CeresIterationCallback.cpp:73 — with a compiled
    # fixed-shape solver the budget is enforced by switching between a
    # min- and max-iteration program based on the last solve's wall time)
    realtime_iterations: int = 10
    realtime_min_iterations: int = 3
    enforce_realtime: bool = False
    realtime_time_limit: float = 0.035
    # vision-only mode: no IMU links; consecutive states get weak
    # relative-pose regularisers instead (PseudoImuError role,
    # okvis_ceres/src/ImuError.cpp:1156-1325)
    use_imu: bool = True
    # landmark management (ViGraph::updateLandmarks, ViGraph.cpp:775-855)
    min_parallax_quality: float = 1e-3
    # bias deviation triggering IMU re-preintegration (ImuError.cpp:~865)
    bias_redo_threshold: float = 0.1
    # online extrinsics calibration (reference OnlineCalibrationParameters
    # do_extrinsics + sigma_r/sigma_alpha priors, Parameters.hpp:57-100;
    # exercised by the Hilti configs): extrinsics become variable blocks
    # anchored by a pose prior at the CAD/config values
    online_extrinsics: bool = False
    ext_sigma_r: float = 0.01
    ext_sigma_alpha: float = 0.05


class StateRecord:
    __slots__ = (
        "id", "t", "pose", "speed_bias", "is_keyframe", "in_window",
        "frozen", "is_pose_graph_frame", "imu_w", "imu_a", "imu_dt",
        "imu_from", "anchor_id", "T_anchor7",
    )

    def __init__(self, sid, t, pose, speed_bias):
        self.id = sid
        self.t = float(t)
        self.pose = np.asarray(pose, np.float64)  # [7]
        self.speed_bias = np.asarray(speed_bias, np.float64)  # [9]
        self.is_keyframe = False
        self.in_window = True
        self.frozen = False
        self.is_pose_graph_frame = False
        # non-keyframe states leave the optimised graph with their pose
        # RECORDED RELATIVE to a keyframe anchor (okvis::Trajectory's
        # keyframe-relative non-causal update, okvis_ceres/src/
        # Trajectory.cpp: non-keyframe states follow their keyframe), so
        # later loop closures / full-graph solves that move keyframes
        # move the whole history consistently
        self.anchor_id: Optional[int] = None
        self.T_anchor7: Optional[np.ndarray] = None
        # raw IMU buffers spanning from state `imu_from` to this one.
        # imu_from is the chain invariant that lets every packer verify
        # link adjacency before building an IMU factor (the reference's
        # ImuError::append merges exactly adjacent segments,
        # ViGraphEstimator.cpp:57-157 — a factor over a wrong time span
        # double-counts gravity/velocity integrals).
        self.imu_w = np.zeros((0, 3))
        self.imu_a = np.zeros((0, 3))
        self.imu_dt = np.zeros((0,))
        self.imu_from: Optional[int] = None


class _ObsDict(dict):
    """Observation dict that bumps its landmark's revision on every
    mutation — including DIRECT writes (loop-closure reactivation,
    expandKeyframe, component load all assign lm.obs[key] = ... without
    going through Estimator.add_observation). The revision keys the
    per-landmark packed-row cache in pack_np, so a stale cache can
    never survive a mutation. The optional `hook(lid, key, added)`
    keeps the estimator's state->observations index incrementally
    up to date — obs_of_state is queried several times per frame and a
    full landmark scan there costs ~5-10 ms at realistic map sizes."""

    __slots__ = ("owner", "hook")

    def __init__(self, owner):
        super().__init__()
        self.owner = owner
        self.hook = None

    def __setitem__(self, k, v):
        self.owner.obs_rev += 1
        super().__setitem__(k, v)
        if self.hook is not None:
            self.hook(self.owner.id, k, True, v)

    def __delitem__(self, k):
        self.owner.obs_rev += 1
        super().__delitem__(k)
        if self.hook is not None:
            self.hook(self.owner.id, k, False)

    def pop(self, k, *a):
        self.owner.obs_rev += 1
        had = k in self
        r = super().pop(k, *a)
        if had and self.hook is not None:
            self.hook(self.owner.id, k, False)
        return r

    def update(self, *a, **kw):
        self.owner.obs_rev += 1
        for src in a:
            items = src.items() if hasattr(src, "items") else src
            for k, v in items:
                super().__setitem__(k, v)
                if self.hook is not None:
                    self.hook(self.owner.id, k, True, v)
        for k, v in kw.items():
            super().__setitem__(k, v)
            if self.hook is not None:
                self.hook(self.owner.id, k, True, v)

    def clear(self):
        self.owner.obs_rev += 1
        if self.hook is not None:
            for k in self:
                self.hook(self.owner.id, k, False)
        super().clear()


class _ObsArena:
    """Global observation-row store, kept exact by the _ObsDict mutation
    hook. Columns: lid/sid/cam (int32), u/v/w=8/size (float64), alive.
    pack_np's obs section becomes pure vectorised numpy over these
    arrays — the former per-landmark Python loop (~500 window landmarks
    x concatenate) was the single largest host cost per frame (2.6 ms
    p50 at bench scale). The reference's persistent ceres::Problem
    (ViGraph.cpp:47-62) is the analogue: residual blocks are stored
    once and never repacked."""

    __slots__ = ("lid", "sid", "cam", "uvw", "alive", "n", "n_dead",
                 "row_of")

    def __init__(self, cap: int = 8192):
        self.lid = np.zeros(cap, np.int32)
        self.sid = np.zeros(cap, np.int32)
        self.cam = np.zeros(cap, np.int32)
        self.uvw = np.zeros((cap, 3), np.float64)
        self.alive = np.zeros(cap, bool)
        self.n = 0
        self.n_dead = 0
        self.row_of: Dict[Tuple[int, int, int, int], int] = {}

    def set(self, lid: int, key, val):
        k = (lid, key[0], key[1], key[2])
        r = self.row_of.get(k)
        if r is None:
            if self.n == self.alive.size:
                self._grow()
            r = self.n
            self.n += 1
            self.row_of[k] = r
            self.lid[r] = lid
            self.sid[r] = key[0]
            self.cam[r] = key[1]
        self.uvw[r, 0] = val[0]
        self.uvw[r, 1] = val[1]
        self.uvw[r, 2] = 8.0 / val[2]
        self.alive[r] = True

    def drop(self, lid: int, key):
        r = self.row_of.pop((lid, key[0], key[1], key[2]), None)
        if r is not None and self.alive[r]:
            self.alive[r] = False
            self.n_dead += 1
            if self.n_dead > 4096 and self.n_dead * 2 > self.n:
                self._compact()

    def _grow(self):
        cap = self.alive.size * 2
        for name in ("lid", "sid", "cam", "alive"):
            a = getattr(self, name)
            b = np.zeros(cap, a.dtype)
            b[: self.n] = a[: self.n]
            setattr(self, name, b)
        b = np.zeros((cap, 3), np.float64)
        b[: self.n] = self.uvw[: self.n]
        self.uvw = b

    def _compact(self):
        keep = np.nonzero(self.alive[: self.n])[0]
        remap = np.full(self.n, -1, np.int64)
        remap[keep] = np.arange(len(keep))
        for name in ("lid", "sid", "cam", "alive", "uvw"):
            a = getattr(self, name)
            a[: len(keep)] = a[keep]
        self.row_of = {k: int(remap[r]) for k, r in self.row_of.items()}
        self.n = len(keep)
        self.n_dead = 0


class LandmarkRecord:
    __slots__ = ("id", "hp_W", "quality", "initialised", "obs",
                 "info_scale", "obs_rev", "_row_cache")

    def __init__(self, lid, hp_W):
        self.id = lid
        self.hp_W = np.asarray(hp_W, np.float64)  # [4]
        self.quality = 0.0
        self.initialised = False
        self.obs_rev = 0
        self._row_cache = None  # (obs_rev, rows [n,5]: sid,cam,u,v,8/sz)
        # obs: (state_id, cam_idx, kp_idx) -> (u, v, size)
        self.obs: Dict[Tuple[int, int, int], Tuple[float, float, float]] = (
            _ObsDict(self)
        )
        # CNN suppression: information scale on ALL observations of this
        # landmark (sky/person -> 1e-4, Frontend.cpp:986-1011)
        self.info_scale = 1.0

    def packed_rows(self) -> np.ndarray:
        """Cached [n,5] float rows (sid, cam, u, v, 8/size) — rebuilt
        only when this landmark's observations changed. The realtime
        pack touches ~500 landmarks/frame of which only the freshly
        matched few change, so this removes the dominant Python loop
        from the frame-loop host time (the reference's persistent
        ceres::Problem never repacks, ViGraph.cpp:47-62)."""
        cache = self._row_cache
        if cache is not None and cache[0] == self.obs_rev:
            return cache[1]
        if self.obs:
            rows = np.array(
                [
                    (s, ci, u, v, 8.0 / size)
                    for (s, ci, _kp), (u, v, size) in self.obs.items()
                ],
                np.float64,
            )
        else:
            rows = np.zeros((0, 5), np.float64)
        self._row_cache = (self.obs_rev, rows)
        return rows


class PoseGraphEdge:
    """A marginalisation or loop-closure relative-pose factor, reversible."""

    __slots__ = ("id_i", "id_j", "T_ij", "sqrt_info", "stored_obs", "kind")

    def __init__(self, id_i, id_j, T_ij, sqrt_info, stored_obs, kind):
        self.id_i = id_i
        self.id_j = id_j
        self.T_ij = np.asarray(T_ij, np.float64)  # [7]
        self.sqrt_info = np.asarray(sqrt_info, np.float64)  # [6,6]
        # stored_obs: list of (lm_id, state_id, cam, kp, u, v, size) for
        # reversibility (convert back to observations on loop closure)
        self.stored_obs = stored_obs
        self.kind = kind  # "marg" | "loop"


class Estimator:
    """Realtime sliding-window estimator (the `Estimator`/ViSlamBackend
    realtime-graph role). Loop closure / full graph live in
    pipeline/full_graph.py and reuse this class's records."""

    def __init__(
        self,
        cameras: tuple,
        extrinsics: List[Transformation],
        imu_params: ImuParameters,
        config: EstimatorConfig = EstimatorConfig(),
    ):
        self.cameras = tuple(cameras)
        self.T_SC = [np.concatenate([np.asarray(T.r), np.asarray(T.q)])
                     for T in extrinsics]
        # config/CAD extrinsics: the anchor for online-calibration priors
        self.T_SC_prior = [row.copy() for row in self.T_SC]
        self.imu_params = imu_params
        self.cfg = config
        self.states: Dict[int, StateRecord] = {}
        self.state_order: List[int] = []  # insertion/time order, all history
        self.window: List[int] = []  # ids currently in the window
        self.landmarks: Dict[int, LandmarkRecord] = {}
        # incrementally-maintained state -> {(lid, cam, kp)} index
        # (kept exact by the _ObsDict mutation hook)
        self._by_state: Dict[int, set] = {}
        # cumulative observation insertions (monotone; never decremented
        # by keyframe→pose-graph conversion or landmark deletion) — the
        # invariant pipelined-parity tests check: a lost device append
        # set shows up here regardless of later graph surgery
        self.n_obs_inserted = 0
        # per-state revision + cached lid array (pack_np hot path:
        # only states whose observations changed re-materialise)
        self._by_state_rev: Dict[int, int] = {}
        self._obs_arena = _ObsArena()
        # lid -> info_scale for CNN-suppressed landmarks only (kept in
        # sync with LandmarkRecord.info_scale by set_info_scale); the
        # per-frame device w_scale fill iterates THIS instead of the
        # whole descriptor table
        self._lm_suppressed: Dict[int, float] = {}
        self._lid_cache: Dict[int, Tuple[int, np.ndarray]] = {}
        self.pose_graph_edges: List[PoseGraphEdge] = []
        self._next_state_id = 0
        self._next_lm_id = 0
        self._pre_cache: Dict[int, Tuple[np.ndarray, object, int, int]] = {}
        self._imu_buf = None  # persistent imu_pre link buffer (pack_np)
        self._problem_template: Optional[WindowProblem] = None
        # realtime LM termination: rel. cost decreases below 1e-6 are
        # far under anything that moves a pose at ATE scale, and the
        # default 1e-9 is unreachable in f32 (profiled: warm-started
        # frames burned the full 10-iteration budget at ~0.5 ms each on
        # TPU because the stall counter never fired)
        self._solver_cfg = SolverConfig(
            max_iterations=config.realtime_iterations,
            min_cost_decrease=1e-6,
            # warm-started windows converge to sub-10µm steps in ~3
            # iterations; without this the realtime solve burned the
            # full budget at ~0.5 ms/iteration on TPU (profiled r5)
            step_tolerance=1e-5,
        )
        self.initialised = False

    # ------------------------------------------------------------------
    # state management (ViGraph::addStatesInitialise / addStatesPropagate)
    # ------------------------------------------------------------------
    def add_state(
        self,
        t: float,
        imu_w: np.ndarray,
        imu_a: np.ndarray,
        imu_dt: np.ndarray,
    ) -> int:
        """Add a new state at time t, propagated through the given IMU
        segment from the previous state. First call initialises from
        gravity (ViGraph.cpp:79-191)."""
        sid = self._next_state_id
        self._next_state_id += 1

        if not self.window:
            # gravity-aligned initialisation + priors
            a_mean = imu_a.mean(axis=0) if len(imu_a) else np.array([0, 0, 9.81])
            T0 = init_pose_from_accel(jnp.asarray(a_mean))
            pose = np.concatenate([np.asarray(T0.r), np.asarray(T0.q)])
            rec = StateRecord(sid, t, pose, np.zeros(9))
            self.states[sid] = rec
            self.state_order.append(sid)
            self.window.append(sid)
            self.initialised = True
            return sid

        prev = self.states[self.window[-1]]
        # propagate for the initial guess — pure numpy on the host: a
        # device call + readback costs ~100 ms over the TPU tunnel
        if len(imu_dt):
            from okvis2_tpu.imu.preintegration import propagate_state_np

            pose, sb = propagate_state_np(
                float(self.imu_params.g), prev.pose, prev.speed_bias,
                np.asarray(imu_w), np.asarray(imu_a), np.asarray(imu_dt),
            )
        else:
            pose = prev.pose.copy()
            sb = prev.speed_bias.copy()
        rec = StateRecord(sid, t, pose, sb)
        rec.imu_w = np.asarray(imu_w, np.float64)
        rec.imu_a = np.asarray(imu_a, np.float64)
        rec.imu_dt = np.asarray(imu_dt, np.float64)
        rec.imu_from = prev.id
        self.states[sid] = rec
        self.state_order.append(sid)
        self.window.append(sid)
        return sid

    def set_keyframe(self, sid: int, is_kf: bool = True):
        self.states[sid].is_keyframe = is_kf

    def repredict_from_previous(self, sid: int):
        """Re-propagate sid's pose/speed-bias prediction from its chain
        predecessor's CURRENT estimate (used after a lagged solve lands
        mid-frame: the dispatch used a one-solve-stale prediction; the
        pack should use the refreshed one)."""
        rec = self.states[sid]
        if rec.imu_from is None or rec.imu_from not in self.states:
            return
        prev = self.states[rec.imu_from]
        if len(rec.imu_dt):
            from okvis2_tpu.imu.preintegration import propagate_state_np

            rec.pose, rec.speed_bias = propagate_state_np(
                float(self.imu_params.g), prev.pose, prev.speed_bias,
                rec.imu_w, rec.imu_a, rec.imu_dt,
            )

    # ------------------------------------------------------------------
    # landmarks & observations (ViGraph header-inline add/remove)
    # ------------------------------------------------------------------
    def add_landmark(self, hp_W, initialised=False) -> int:
        lid = self._next_lm_id
        self._next_lm_id += 1
        rec = LandmarkRecord(lid, hp_W)
        rec.initialised = bool(initialised)
        rec.obs.hook = self._obs_hook
        self.landmarks[lid] = rec
        return lid

    def _obs_hook(self, lid: int, key, added: bool, val=None):
        """_ObsDict mutation hook: keep the state->observations index AND
        the global obs-row arena exact through every mutation path
        (direct dict writes included)."""
        sid, ci, kp = key
        s = self._by_state.get(sid)
        if added:
            if s is None:
                s = self._by_state[sid] = set()
            if (lid, ci, kp) not in s:
                s.add((lid, ci, kp))
                self.n_obs_inserted += 1
            self._obs_arena.set(lid, key, val)
        else:
            if s is not None:
                s.discard((lid, ci, kp))
            self._obs_arena.drop(lid, key)
        self._by_state_rev[sid] = self._by_state_rev.get(sid, 0) + 1

    def _forget_landmark_obs(self, lm: "LandmarkRecord"):
        """Discard a to-be-deleted landmark's index entries (whole-record
        deletions bypass the dict hook)."""
        for (sid, ci, kp) in lm.obs:
            s = self._by_state.get(sid)
            if s is not None:
                s.discard((lm.id, ci, kp))
                self._by_state_rev[sid] = \
                    self._by_state_rev.get(sid, 0) + 1
            self._obs_arena.drop(lm.id, (sid, ci, kp))

    def set_info_scale(self, lm_id: int, scale: float):
        """Set a landmark's observation information scale (CNN
        suppression, Frontend.cpp:986-1011) — writes both the record
        and the suppressed-lid index the device w_scale fill reads."""
        lm = self.landmarks.get(lm_id)
        if lm is None:
            return
        lm.info_scale = float(scale)
        if scale != 1.0:
            self._lm_suppressed[lm_id] = float(scale)
        else:
            self._lm_suppressed.pop(lm_id, None)

    def add_observation(self, lm_id, state_id, cam_idx, kp_idx, uv, size=9.0):
        self.landmarks[lm_id].obs[(state_id, cam_idx, kp_idx)] = (
            float(uv[0]), float(uv[1]), float(size)
        )
        self._obs_rev = getattr(self, "_obs_rev", 0) + 1

    def remove_observation(self, lm_id, state_id, cam_idx, kp_idx):
        self.landmarks[lm_id].obs.pop((state_id, cam_idx, kp_idx), None)
        self._obs_rev = getattr(self, "_obs_rev", 0) + 1

    def obs_of_state(self, sid: int):
        """All (lm_id, cam_idx, kp_idx) observed from state sid — served
        from the incrementally-maintained index (the frame loop queries
        this several times per frame: keyframe heuristic, tracking
        quality, CNN suppression, expandKeyframe)."""
        return self._by_state.get(sid, ())

    def merge_landmarks(self, keep_id: int, drop_id: int):
        drop = self.landmarks.pop(drop_id, None)
        if drop is None:
            return
        self._forget_landmark_obs(drop)
        self.landmarks[keep_id].obs.update(drop.obs)
        self._obs_rev = getattr(self, "_obs_rev", 0) + 1

    def clean_unobserved_landmarks(self, min_obs: int = 2):
        """ViGraph::cleanUnobservedLandmarks (ViGraph.cpp:908+)."""
        window = set(self.window)
        # landmarks referenced by stored (marginalised) observations must
        # survive for reversibility — collect once
        protected = set()
        for e in self.pose_graph_edges:
            for o in e.stored_obs:
                protected.add(o[0])
        dead = []
        for lid, lm in self.landmarks.items():
            if lid in protected:
                continue
            if not lm.obs and lm.initialised:
                # multi-session map point loaded without observations
                # (Frontend::loadComponent): stays matchable until the
                # session re-observes it
                continue
            n_win = sum(1 for (s, _, _) in lm.obs if s in window)
            if n_win == 0 or (len(lm.obs) < min_obs and not lm.initialised):
                dead.append(lid)
        for lid in dead:
            self._forget_landmark_obs(self.landmarks[lid])
            del self.landmarks[lid]
        if dead:
            self._obs_rev = getattr(self, "_obs_rev", 0) + 1

    # ------------------------------------------------------------------
    # covisibility (ViGraph::covisibilities, ViGraph.cpp:505-563)
    # ------------------------------------------------------------------
    def covisibility(self, id_a: int, id_b: int) -> int:
        n = 0
        for lm in self.landmarks.values():
            sa = any(k[0] == id_a for k in lm.obs)
            if sa and any(k[0] == id_b for k in lm.obs):
                n += 1
        return n

    def covisible_landmark_counts(self) -> Dict[int, Dict[int, int]]:
        counts: Dict[int, Dict[int, int]] = {}
        for lm in self.landmarks.values():
            sids = {k[0] for k in lm.obs}
            for a in sids:
                for b in sids:
                    if a < b:
                        counts.setdefault(a, {}).setdefault(b, 0)
                        counts[a][b] += 1
        return counts

    # ------------------------------------------------------------------
    # IMU link handling with preintegration cache
    # ------------------------------------------------------------------
    def _get_preintegrated(self, sid: int):
        """Preintegrate the raw buffer ending at state sid (cached)."""
        rec = self.states[sid]
        bg = rec.speed_bias[3:6]
        ba = rec.speed_bias[6:9]
        cached = self._pre_cache.get(sid)
        if cached is not None:
            bias_lin, pre, n_meas, _rev = cached
            if (
                n_meas == len(rec.imu_dt)
                and np.linalg.norm(bias_lin - np.concatenate([bg, ba]))
                < self.cfg.bias_redo_threshold
            ):
                return pre
        cap = self.cfg.imu_seg_capacity
        n = len(rec.imu_dt)
        if n > cap:
            # downsample by averaging adjacent pairs until it fits
            w, a, dt = rec.imu_w, rec.imu_a, rec.imu_dt
            while len(dt) > cap:
                m = (len(dt) // 2) * 2
                w2 = 0.5 * (w[:m:2] + w[1:m:2])
                a2 = 0.5 * (a[:m:2] + a[1:m:2])
                dt2 = dt[:m:2] + dt[1:m:2]
                if m < len(dt):
                    w2 = np.concatenate([w2, w[m:]])
                    a2 = np.concatenate([a2, a[m:]])
                    dt2 = np.concatenate([dt2, dt[m:]])
                w, a, dt = w2, a2, dt2
            wb, ab, dtb = w, a, dt
            n = len(dtb)
        else:
            wb, ab, dtb = rec.imu_w, rec.imu_a, rec.imu_dt
        # host numpy preintegration: a device dispatch + per-leaf readback
        # costs ~100 ms over the TPU tunnel for a ~10-sample segment
        from okvis2_tpu.imu.preintegration import preintegrate_np
        from okvis2_tpu.utils.timing import SwitchableTimer

        with SwitchableTimer("3.131 preintegrate_np (cache miss)"):
            pre = preintegrate_np(self.imu_params, wb, ab, dtb, bg, ba)
        # monotone revision: keys the per-row imu_pre buffer in pack_np
        # (id() could be recycled by the allocator after a gc)
        self._pre_rev = getattr(self, "_pre_rev", 0) + 1
        self._pre_cache[sid] = (
            np.concatenate([bg, ba]), pre, len(rec.imu_dt), self._pre_rev
        )
        return pre

    # ------------------------------------------------------------------
    # packing: host records -> WindowProblem
    # ------------------------------------------------------------------
    def _window_landmarks(self) -> List[int]:
        """Landmarks observed from the window, best-first, up to
        capacity. Initialised landmarks with a single window observation
        are admitted at the bottom of the ranking: in the pipelined
        (Phase-B) loop the current frame's matches are appended on
        device AFTER this pack, so such a landmark may be about to gain
        its second constraint — excluding it would silently drop that
        match. Unmatched single-obs landmarks cost nothing (their Schur
        block is damped)."""
        # count via the incrementally-maintained state index with
        # per-state revision-cached lid arrays: only states whose
        # observations changed since the last pack re-materialise
        # (typically the newest 1-2), and the counting/ranking is
        # vectorised numpy — this loop ran 65k dict operations per
        # frame when it iterated every window observation in Python
        arrs = []
        for sid in self.window:
            s = self._by_state.get(sid)
            if not s:
                continue
            rev = self._by_state_rev.get(sid, 0)
            c = self._lid_cache.get(sid)
            if c is None or c[0] != rev:
                a = np.fromiter(
                    (t[0] for t in s), np.int64, len(s)
                )
                self._lid_cache[sid] = c = (rev, a)
            arrs.append(c[1])
        if not arrs:
            self._lm_nwin = {}
            return []
        lids_u, n_u = np.unique(np.concatenate(arrs),
                                return_counts=True)
        # best-first, same ordering as the former python sort:
        # count desc, then lid desc
        order = np.lexsort((-lids_u, -n_u))
        scored = []
        for lid, n_win in zip(lids_u[order].tolist(),
                              n_u[order].tolist()):
            lm = self.landmarks.get(lid)
            if lm is not None and lm.initialised:
                scored.append((n_win, lid))
        sel = scored[: self.cfg.landmark_slots]
        if len(scored) > len(sel):
            _warn_capacity(
                "landmark_slots",
                f"window sees {len(scored)} landmarks, packing best "
                f"{len(sel)} (landmark_slots={self.cfg.landmark_slots}) "
                "— raise EstimatorConfig.landmark_slots to keep them all",
            )
        self._lm_nwin = {lid: n for n, lid in sel}
        return [lid for _, lid in sel]

    def _np_template(self) -> WindowProblem:
        """A WindowProblem with NUMPY leaves at this estimator's
        capacities (cached): building the scaffold on host avoids ~30
        device allocations + fetches per frame that WindowProblem.empty
        would cost over the TPU tunnel."""
        cached = getattr(self, "_np_template_cache", None)
        if cached is None:
            cfg = self.cfg
            prob = WindowProblem.empty(
                cfg.window_slots, cfg.landmark_slots, cfg.obs_slots,
                len(self.cameras), cfg.imu_seg_capacity,
                num_rel=cfg.rel_slots,
            )
            cached = jax.tree_util.tree_map(np.asarray, prob)
            self._np_template_cache = cached
        # contract: pack_np treats the template as READ-ONLY scaffold —
        # every leaf it mutates is copied first (np.array/np.zeros) and
        # swapped in via dataclasses.replace, so no full-tree copy here
        # (it was a measurable per-frame host cost)
        return cached

    def pack(self) -> WindowProblem:
        """Device-array problem (compat path for tests/tools); the hot
        path uses pack_np + the flat-packed single-dispatch solve."""
        return jax.tree_util.tree_map(jnp.asarray, self.pack_np())

    def pack_np(self) -> WindowProblem:
        from okvis2_tpu.utils.timing import SwitchableTimer

        cfg = self.cfg
        S, L, O = cfg.window_slots, cfg.landmark_slots, cfg.obs_slots
        NC = len(self.cameras)
        prob = self._np_template()
        win = self.window[-S:]
        slot_of = {sid: i for i, sid in enumerate(win)}
        n_win = len(win)

        _t_states = SwitchableTimer("3.11 pack: states+landmarks")
        _t_states.__enter__()
        pose = np.array(prob.pose)
        sb = np.array(prob.speed_bias)
        smask = np.zeros(S, bool)
        pfroz = np.zeros(S, bool)
        sbfroz = np.zeros(S, bool)
        for sid, i in slot_of.items():
            rec = self.states[sid]
            pose[i] = rec.pose
            sb[i] = rec.speed_bias
            smask[i] = True
            pfroz[i] = rec.frozen
            sbfroz[i] = rec.frozen or not cfg.use_imu

        # landmarks
        lm_ids = self._window_landmarks()
        lm_slot = {lid: i for i, lid in enumerate(lm_ids)}
        lms = np.array(prob.landmarks)
        lmask = np.zeros(L, bool)
        # weak isotropic anchors for under-constrained landmarks
        # (HomogeneousPointError role): a single-observation landmark —
        # packed so a Phase-B device-appended match can constrain it —
        # must not slide along its one ray when no match arrives
        lp = np.array(prob.lm_prior)
        lp_sq = np.zeros(L)
        lp_m = np.zeros(L, bool)
        sc_slot = np.ones(L)
        for lid, i in lm_slot.items():
            lm = self.landmarks[lid]
            lms[i] = lm.hp_W
            lmask[i] = True
            sc_slot[i] = lm.info_scale
            if self._lm_nwin.get(lid, 2) < 2:
                lp[i] = lm.hp_W
                lp_sq[i] = 0.5  # sigma ~2 m: holds, doesn't bias
                lp_m[i] = True
        # CNN suppression: information x info_scale => sqrt-info
        # x sqrt(info_scale) (Frontend.cpp:986-1011)
        np.sqrt(sc_slot, out=sc_slot)

        _t_states.__exit__(None, None, None)
        # observations
        _t_obs = SwitchableTimer("3.12 pack: obs rows")
        _t_obs.__enter__()
        o_state = np.zeros(O, np.int32)
        o_cam = np.zeros(O, np.int32)
        o_lm = np.zeros(O, np.int32)
        o_uv = np.zeros((O, 2))
        o_w = np.ones(O)
        o_mask = np.zeros(O, bool)
        # arena row packing: the _ObsDict hook keeps a global row store
        # exact through every mutation, so selecting this window's rows
        # is pure vectorised numpy — no per-landmark Python loop (the
        # reference's persistent ceres::Problem never repacks)
        sid_to_slot = np.full(self._next_state_id + 1, -1, np.int32)
        for sid2, i in slot_of.items():
            sid_to_slot[sid2] = i
        lid_to_slot = np.full(self._next_lm_id + 1, -1, np.int32)
        if lm_ids:
            lid_to_slot[np.asarray(lm_ids, np.int64)] = np.arange(
                len(lm_ids), dtype=np.int32
            )
        self._lid_to_slot = lid_to_slot  # reused by the aux slot maps
        ar = self._obs_arena
        n = ar.n
        st = sid_to_slot[ar.sid[:n]]
        ls = lid_to_slot[ar.lid[:n]]
        idxs = np.nonzero(ar.alive[:n] & (st >= 0) & (ls >= 0))[0]
        if len(idxs) > O:
            _warn_capacity(
                "obs_slots",
                f"obs cap bound: dropped {len(idxs) - O} "
                f"observations (obs_slots={O}) — raise "
                "EstimatorConfig.obs_slots (the reference has "
                "no cap)",
            )
            idxs = idxs[:O]
        k = len(idxs)
        if k:
            uvw = ar.uvw[idxs]
            lm_rows = ls[idxs]
            o_state[:k] = st[idxs]
            o_cam[:k] = ar.cam[idxs]
            o_lm[:k] = lm_rows
            o_uv[:k] = uvw[:, :2]
            o_w[:k] = uvw[:, 2] * sc_slot[lm_rows]
            o_mask[:k] = True
        # Phase-B device-side append starts after the host-packed rows
        self._n_obs_packed = k
        _t_obs.__exit__(None, None, None)

        # IMU links between consecutive window slots
        _t_imu = SwitchableTimer("3.13 pack: imu links")
        _t_imu.__enter__()
        # persistent per-slot link buffer: only rows whose (from, to,
        # preintegration revision) key changed are rewritten — a steady
        # non-shift frame touches 1 link x ~13 leaves instead of
        # stacking every link's every leaf (was 2.3 ms p50 at bench
        # scale). NOTE: the returned problem's imu_pre leaves are VIEWS
        # of this buffer, valid until the next pack_np (the hot path
        # copies them into the flat carrier immediately; pack() wraps
        # them in device arrays).
        imu_mask = np.zeros(S - 1, bool)
        if self._imu_buf is None:
            leaves, treedef = jax.tree_util.tree_flatten(prob.imu_pre)
            self._imu_buf = (
                [np.array(lf) for lf in leaves], treedef,
                [None] * (S - 1),
            )
        buf, treedef, row_keys = self._imu_buf
        if cfg.use_imu:
            for i in range(n_win - 1):
                nxt = self.states[win[i + 1]]
                # chain check: the buffer must span exactly win[i]->win[i+1]
                # (a mid-window drop can break adjacency; such a link would
                # integrate the wrong time span, so mask it off)
                if len(nxt.imu_dt) and nxt.imu_from == win[i]:
                    imu_mask[i] = True
                    pre = self._get_preintegrated(win[i + 1])
                    key = (win[i], win[i + 1],
                           self._pre_cache[win[i + 1]][3])
                    if row_keys[i] != key:
                        for b, lf in zip(
                            buf, jax.tree_util.tree_leaves(pre)
                        ):
                            b[i] = lf
                        row_keys[i] = key
        imu_pre = jax.tree_util.tree_unflatten(treedef, buf)

        _t_imu.__exit__(None, None, None)
        # priors: gravity-aligned init prior on the oldest ever state if it
        # is still in the window (ViGraph.cpp:120-170)
        _t_rest = SwitchableTimer("3.14 pack: priors+rel+replace")
        _t_rest.__enter__()
        pp_T = np.array(prob.pose_prior)
        pp_sq = np.zeros((S, 6, 6))
        pp_m = np.zeros(S, bool)
        sb_p = np.zeros((S, 9))
        sb_sq = np.zeros((S, 9))
        sb_m = np.zeros(S, bool)
        first_id = self.state_order[0]
        if first_id in slot_of:
            i = slot_of[first_id]
            rec = self.states[first_id]
            pp_T[i] = rec.pose
            # strong position/yaw fixation, weaker roll/pitch (observable)
            pp_sq[i] = np.diag([1e4, 1e4, 1e4, 1e2, 1e2, 1e4])
            pp_m[i] = True
            sb_p[i] = rec.speed_bias
            sb_sq[i] = np.concatenate([
                np.full(3, 10.0),      # speed prior ~0.1 m/s
                np.full(3, 1.0 / 0.03),  # gyro bias prior sigma_bg
                np.full(3, 1.0 / 0.1),   # accel bias prior sigma_ba
            ])
            sb_m[i] = True

        # relative-pose edges with both endpoints in window
        R = cfg.rel_slots
        r_i = np.zeros(R, np.int32)
        r_j = np.zeros(R, np.int32)
        r_T = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (R, 1))
        r_sq = np.zeros((R, 6, 6))
        r_m = np.zeros(R, bool)
        k = 0
        if not cfg.use_imu:
            # PseudoImuError-style weak chaining of consecutive states so
            # the vision-only problem stays connected and damped (pure
            # numpy: eager device ops here would cost a tunnel roundtrip
            # per state pair per frame)
            for i in range(n_win - 1):
                if k >= R:
                    break
                pa = self.states[win[i]].pose
                pb = self.states[win[i + 1]].pose
                qa = pa[3:7]
                dq = _quat_mul_np(_quat_conj_np(qa), pb[3:7])
                Ca = _quat_to_mat_np(qa)
                dr = Ca.T @ (pb[:3] - pa[:3])
                r_i[k] = i
                r_j[k] = i + 1
                r_T[k] = np.concatenate([dr, dq])
                r_sq[k] = np.diag([1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
                r_m[k] = True
                k += 1
        for e in self.pose_graph_edges:
            if e.id_i in slot_of and e.id_j in slot_of and k < R:
                r_i[k] = slot_of[e.id_i]
                r_j[k] = slot_of[e.id_j]
                r_T[k] = e.T_ij
                r_sq[k] = e.sqrt_info
                r_m[k] = True
                k += 1

        # online extrinsics: unfreeze T_SC blocks, anchored by priors at
        # the config values with sigma_r/sigma_alpha whitening
        ext_froz = np.ones(NC, bool)
        ep_T = np.stack(self.T_SC_prior)
        ep_sq = np.zeros((NC, 6, 6))
        ep_m = np.zeros(NC, bool)
        if cfg.online_extrinsics:
            ext_froz[:] = False
            ep_sq[:] = np.diag(
                [1.0 / cfg.ext_sigma_r] * 3
                + [1.0 / cfg.ext_sigma_alpha] * 3
            )
            ep_m[:] = True

        prob = dataclasses.replace(
            prob,
            pose=pose,
            speed_bias=sb,
            extrinsics=np.stack(self.T_SC),
            ext_frozen=ext_froz,
            ext_prior=ep_T,
            ext_prior_sqrt=ep_sq,
            ext_prior_mask=ep_m,
            landmarks=lms,
            state_mask=smask,
            pose_frozen=pfroz,
            sb_frozen=sbfroz,
            lm_mask=lmask,
            obs_state=o_state,
            obs_cam=o_cam,
            obs_lm=o_lm,
            obs_uv=o_uv,
            obs_sqrt_info=o_w,
            obs_mask=o_mask,
            imu_pre=imu_pre,
            imu_mask=imu_mask,
            pose_prior=pp_T,
            pose_prior_sqrt=pp_sq,
            pose_prior_mask=pp_m,
            sb_prior=sb_p,
            sb_prior_sqrt=sb_sq,
            sb_prior_mask=sb_m,
            rel_i=r_i,
            rel_j=r_j,
            rel_T=r_T,
            rel_sqrt=r_sq,
            rel_mask=r_m,
            lm_prior=lp,
            lm_prior_sqrt=lp_sq,
            lm_prior_mask=lp_m,
        )
        self._lm_ids = lm_ids
        self._slot_of = slot_of
        _t_rest.__exit__(None, None, None)
        return prob

    def unpack(self, prob: WindowProblem):
        pose = np.array(prob.pose)
        sb = np.array(prob.speed_bias)
        for sid, i in self._slot_of.items():
            rec = self.states[sid]
            if not rec.frozen:
                rec.pose = pose[i]
                rec.speed_bias = sb[i]
        lms = np.asarray(prob.landmarks)
        for i, lid in enumerate(self._lm_ids):
            self.landmarks[lid].hp_W = lms[i]

    # ------------------------------------------------------------------
    def optimise_async(self, iterations: Optional[int] = None) -> None:
        """Dispatch optimiseRealtimeGraph (ViSlamBackend.cpp:712-886)
        WITHOUT blocking: host packs the whole problem into two flat
        buffers, the solve runs as ONE device dispatch, and the outputs
        start copying back asynchronously. `apply_pending_solve()` (next
        frame) integrates the results — the same one-frame overlap the
        reference gets from its optimisation thread (P3,
        ThreadedSlam.cpp:466-469, 551-552)."""
        import time as _time

        from okvis2_tpu.solver.packed_solve import PackedLayout, solve_packed

        cfg = self._solver_cfg
        if iterations is None and self.cfg.enforce_realtime:
            # realtime budget (CeresIterationCallback role): with the
            # pipelined solve, _last_solve_wall spans dispatch->apply,
            # i.e. roughly one frame period — so the budget acts on the
            # END-TO-END frame time, dropping to the min-iteration
            # program whenever the loop overruns the limit
            if getattr(self, "_last_solve_wall", 0.0) > self.cfg.realtime_time_limit:
                iterations = self.cfg.realtime_min_iterations
        if iterations is not None and iterations != cfg.max_iterations:
            cfg = dataclasses.replace(cfg, max_iterations=iterations)

        layout = self._get_packed_layout()
        buf_f, buf_i, buf_all = self._packed_bufs

        prob_np = self.pack_np()
        layout.fill(buf_f, buf_i, prob_np)
        self._solve_t0 = _time.perf_counter()
        out = solve_packed(
            buf_all, self.cameras, self.imu_params, layout, cfg
        )
        # start the device->host copy now so that by the time
        # apply_pending_solve blocks, the single flat output has already
        # crossed the tunnel (a cold readback costs ~60 ms)
        try:
            out.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        self._pending_solve = (out, dict(self._slot_of), list(self._lm_ids))

    def _get_packed_layout(self, aux_cap: int = 0):
        """The flat-buffer layout (cached). aux_cap reserves trailing
        aux regions for the Phase-B side-channel (w_scale floats;
        MAX_APPEND_SETS per-frame slot maps + window slots +
        n_obs_base ints) so they ride the same upload as the
        problem."""
        from okvis2_tpu.solver.packed_solve import (
            MAX_APPEND_SETS,
            PackedLayout,
        )

        layout = getattr(self, "_packed_layout", None)
        want = (
            aux_cap,
            MAX_APPEND_SETS * aux_cap + MAX_APPEND_SETS + 1
            if aux_cap else 0,
        )
        if layout is None or (
            aux_cap and layout.key[-2:] != want
        ):
            c = self.cfg
            layout = PackedLayout(
                c.window_slots, c.landmark_slots, c.obs_slots,
                len(self.cameras), c.rel_slots, c.imu_seg_capacity,
                aux_f=want[0], aux_i=want[1],
            )
            self._packed_layout = layout
            self._packed_bufs = layout.make_buffers()
        return layout

    def prepare_fused_solve(self, sid: int, table, sets,
                            iterations: Optional[int] = None):
        """Host half of the Phase-B realtime solve: decide the
        iteration budget, pack the window from the host's (lagged)
        bookkeeping state into the flat carrier buffers, and write the
        Phase-B side-channel aux regions. `sets` lists the in-flight
        frames whose match rows the device must append — every frame
        whose [solve|diag] output the host has NOT consumed yet, oldest
        first, ending with the current frame — as dicts
        {"sid": state id, "slot_of": landmark-table slot assignment as
        of that frame's dispatch}. Per-set slot maps + window slots and
        the shared weight scales ride the carrier's trailing aux
        regions (MAX_APPEND_SETS sets; unused sets disabled with an
        all--1 map). Returns (layout, cfg, buf_all); buf_all's bytes
        are embedded into the pipelined frame's single upload."""
        from okvis2_tpu.solver.packed_solve import MAX_APPEND_SETS

        cfg = self._solver_cfg
        if iterations is None and self.cfg.enforce_realtime:
            if getattr(self, "_last_solve_wall", 0.0) \
                    > self.cfg.realtime_time_limit:
                iterations = self.cfg.realtime_min_iterations
        if iterations is not None and iterations != cfg.max_iterations:
            cfg = dataclasses.replace(cfg, max_iterations=iterations)

        from okvis2_tpu.utils.timing import SwitchableTimer

        K = MAX_APPEND_SETS
        assert len(sets) <= K, (len(sets), K)
        cap = table.capacity
        layout = self._get_packed_layout(aux_cap=cap)
        buf_f, buf_i, buf_all = self._packed_bufs
        with SwitchableTimer("3.1 pack_np + fill"):
            prob_np = self.pack_np()
            with SwitchableTimer("3.15 pack: layout.fill"):
                layout.fill(buf_f, buf_i, prob_np)

            _t_aux = SwitchableTimer("3.16 pack: aux maps")
            _t_aux.__enter__()
            # landmark-table slot -> this pack's solver landmark slot,
            # one map per in-flight frame, written into the trailing
            # aux regions of the flat carrier (no extra upload RPCs)
            oi = layout.aux_i_off
            maps = buf_i[oi:oi + K * cap].reshape(K, cap)
            maps[:] = -1
            cur_slots = buf_i[oi + K * cap:oi + K * cap + K]
            cur_slots[:] = 0
            w_scale = buf_f[layout.aux_f_off:layout.aux_f_off + cap]
            w_scale[:] = 1.0
            # CNN-suppressed landmarks (the only info_scale writers) are
            # tracked in _lm_suppressed; everything else stays 1.0
            for lid, s in self._lm_suppressed.items():
                slot = table.slot_of.get(lid)
                if slot is not None:
                    w_scale[slot] = np.sqrt(s)
            # table slot -> this pack's solver landmark slot, one map
            # per in-flight set, via the pack's lid->slot array (only
            # live window landmarks are >= 0 there) — vectorised over
            # each set's slot->lid snapshot array
            lid_to_slot = self._lid_to_slot
            for k, st in enumerate(sets):
                if st["sid"] not in self._slot_of:
                    # the frame's state left the window before its
                    # bookkeeping ran — its matches can't constrain
                    # anything anymore
                    continue
                sl = st["slot_lid"]
                ok = (sl >= 0) & (sl < len(lid_to_slot))
                maps[k] = np.where(
                    ok, lid_to_slot[np.where(ok, sl, 0)], -1
                )
                cur_slots[k] = self._slot_of[st["sid"]]
            buf_i[oi + K * cap + K] = self._n_obs_packed
            _t_aux.__exit__(None, None, None)
        return layout, cfg, buf_all

    def dispatch_fused_solve_carrier(self, match_sets, diag,
                                     carrier_dev, off_bytes: int,
                                     layout, cfg):
        """Phase-B realtime solve reading the packed problem from the
        frame's SINGLE carrier upload (pipelined loop). `match_sets`
        are the in-flight frames' device-resident match tensors in the
        SAME order as prepare_fused_solve's `sets` (padded to
        MAX_APPEND_SETS with any tensors — their slot maps are -1).
        Reference analogue: the detect/optimise overlap of
        ThreadedSlam.cpp:466-469, 551-552, with the matcher->solver
        hand-off never leaving the device."""
        import time as _time

        from okvis2_tpu.solver.packed_solve import (
            MAX_APPEND_SETS,
            solve_packed_fused_carrier,
        )
        from okvis2_tpu.utils.timing import SwitchableTimer

        assert len(match_sets) == MAX_APPEND_SETS
        self._solve_t0 = _time.perf_counter()
        with SwitchableTimer("3.2 solve dispatch"):
            out = solve_packed_fused_carrier(
                carrier_dev,
                tuple(
                    (m["idx"], m["keep"], m["xy"], m["size"])
                    for m in match_sets
                ),
                diag,
                self.cameras, self.imu_params, off_bytes, layout, cfg,
            )
        try:
            out.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        return out

    def solve_out_size(self) -> int:
        """Length of solve_packed's flat output for this configuration."""
        c = self.cfg
        return (c.window_slots * 16 + c.landmark_slots * 4
                + len(self.cameras) * 7 + 5)

    def take_pending_solve(self):
        """Hand the pending solve's DEVICE output to the caller (to be
        piggybacked through another program's readback); returns
        (out_device, slot_of, lm_ids) or None."""
        pending = getattr(self, "_pending_solve", None)
        self._pending_solve = None
        return pending

    def apply_solved_flat(self, out, slot_of, lm_ids,
                          T_corr7=None, solve_t0=None) -> dict:
        """Integrate a solve output (numpy or device flat array) into the
        host records. `T_corr7` optionally composes a world-frame rigid
        correction onto every solved pose/velocity/landmark first: the
        pipelined loop passes the net relocalisation correction applied
        AFTER this solve was dispatched, so the (stale) solve doesn't
        undo the session move (see SlamSystem._note_pose_correction)."""
        import time as _time

        from okvis2_tpu.solver.packed_solve import decode_solved

        pose, sb, lms, ext, stats = decode_solved(
            out, self.cfg.window_slots, self.cfg.landmark_slots,
            len(self.cameras),
        )
        # dispatch->apply wall of THIS solve: with several frames in
        # flight the instance-level _solve_t0 already belongs to a
        # NEWER dispatch, under-measuring the span and letting the
        # realtime budget unbind at random — the pipelined loop passes
        # the dispatch time it recorded with the pending frame
        self._last_solve_wall = _time.perf_counter() - (
            solve_t0 if solve_t0 is not None else self._solve_t0
        )
        if T_corr7 is not None:
            pose = np.asarray(pose, np.float64).copy()
            sb = np.asarray(sb, np.float64).copy()
            lms = np.asarray(lms, np.float64).copy()
            R = _quat_to_mat_np(T_corr7[3:7])
            pose[:, :3] = pose[:, :3] @ R.T + T_corr7[:3]
            pose[:, 3:7] = np.stack([
                _quat_mul_np(T_corr7[3:7], q) for q in pose[:, 3:7]
            ])
            sb[:, :3] = sb[:, :3] @ R.T  # world velocity rotates
            lms[:, :3] = lms[:, :3] @ R.T \
                + T_corr7[None, :3] * lms[:, 3:4]
        for sid, i in slot_of.items():
            rec = self.states.get(sid)
            if rec is not None and not rec.frozen:
                rec.pose = np.asarray(pose[i], np.float64)
                rec.speed_bias = np.asarray(sb[i], np.float64)
        for i, lid in enumerate(lm_ids):
            lm = self.landmarks.get(lid)
            if lm is not None:
                lm.hp_W = np.asarray(lms[i], np.float64)
        if self.cfg.online_extrinsics:
            self.T_SC = [np.asarray(ext[i], np.float64)
                         for i in range(len(self.T_SC))]
        if stats.get("n_obs", 0) > self.cfg.obs_slots:
            _warn_capacity(
                "obs_append",
                f"device-appended match rows overflowed obs capacity "
                f"({stats['n_obs']:.0f} > {self.cfg.obs_slots}): excess "
                f"matches did not constrain this solve — raise obs_slots",
            )
        self.update_landmark_quality()
        return stats

    def apply_pending_solve(self) -> Optional[dict]:
        """Integrate the results of the previous `optimise_async`.
        Returns the solve stats, or None if no solve is pending."""
        pending = self.take_pending_solve()
        if pending is None:
            return None
        (out, slot_of, lm_ids) = pending
        return self.apply_solved_flat(out, slot_of, lm_ids)

    def optimise(self, iterations: Optional[int] = None) -> dict:
        """Synchronous solve (dispatch + apply): the offline/test path."""
        self.optimise_async(iterations)
        return self.apply_pending_solve()

    # ------------------------------------------------------------------
    def update_landmark_quality(self):
        """Parallax-based landmark quality (ViGraph::updateLandmarks,
        ViGraph.cpp:775-855: quality = sqrt of smallest eigenvalue of the
        summed direction outer products; initialise when > threshold)."""
        window = set(self.window)
        # quality only gates initialisation; once initialised the landmark
        # stays (matches the reference's one-way switch) — so only
        # uninitialised landmarks are scored, with ONE batched eigvalsh
        cand = [lm for lm in self.landmarks.values() if not lm.initialised]
        if not cand:
            return
        ks, ps, cs = [], [], []
        for k, lm in enumerate(cand):
            w = lm.hp_W[3] if abs(lm.hp_W[3]) > 1e-12 else 1e-12
            p = lm.hp_W[:3] / w
            for (sid, _ci, _kp) in lm.obs:
                if sid in window:
                    ks.append(k)
                    ps.append(p)
                    cs.append(self.states[sid].pose[:3])
        if not ks:
            return
        ks = np.asarray(ks)
        d = np.asarray(ps) - np.asarray(cs)
        n = np.linalg.norm(d, axis=-1)
        keep = n > 1e-9
        ks, d, n = ks[keep], d[keep], n[keep]
        D = d / n[:, None]
        K = len(cand)
        M = np.zeros((K, 3, 3))
        np.add.at(M, ks, D[:, :, None] * D[:, None, :])
        count = np.bincount(ks, minlength=K)
        scored = count >= 2
        if not scored.any():
            return
        M_s = M[scored] / count[scored, None, None]
        ev = np.linalg.eigvalsh(M_s)
        quality = np.sqrt(np.maximum(ev[:, 0], 0.0))
        for q, k in zip(quality, np.nonzero(scored)[0]):
            lm = cand[k]
            lm.quality = float(q)
            if lm.quality > self.cfg.min_parallax_quality:
                lm.initialised = True

    # ------------------------------------------------------------------
    # marginalisation (applyStrategy, ViSlamBackend.cpp:451-710)
    # ------------------------------------------------------------------
    def apply_marginalisation_strategy(self):
        self._eliminate_imu_frames()
        self._convert_keyframes_to_pose_graph()
        self._freeze_and_shrink()

    def _eliminate_imu_frames(self):
        """Merge non-keyframe states older than the IMU-frame horizon into
        their successors' IMU buffers (eliminateStateByImuMerge,
        ViGraphEstimator.cpp:57-157)."""
        cfg = self.cfg
        # the newest num_imu_frames states are protected
        protected = set(self.window[-cfg.num_imu_frames:])
        for sid in list(self.window[:-cfg.num_imu_frames]):
            rec = self.states[sid]
            if rec.is_keyframe or sid in protected:
                continue
            idx = self.window.index(sid)
            if idx == 0 or idx >= len(self.window) - 1:
                continue
            nxt = self.states[self.window[idx + 1]]
            # remove its observations
            for lm in self.landmarks.values():
                for key in [k for k in lm.obs if k[0] == sid]:
                    del lm.obs[key]
            self._obs_rev = getattr(self, "_obs_rev", 0) + 1
            self._merge_imu_into_successor(sid, nxt)
            self._pre_cache.pop(sid, None)
            rec.in_window = False
            self.window.remove(sid)
            self._set_history_anchor(sid)

    def _merge_imu_into_successor(self, sid: int, nxt: StateRecord):
        """Merge state sid's IMU buffer into its chain successor and CLEAR
        sid's own buffer — otherwise sid still "owns" the first half of the
        segment and a later full-graph / final-BA pack double-integrates
        the overlap (reference semantics: ImuError::append consumes the
        eliminated segment, ViGraphEstimator.cpp:57-157)."""
        rec = self.states[sid]
        if nxt.imu_from != sid:
            # the window neighbour is not sid's chain successor (e.g.
            # after a mid-window drop): merge into the ACTUAL successor
            # if one still exists so the IMU segment is preserved instead
            # of lost; only clear when the chain is truly broken
            succ = next(
                (s for s in self.states.values() if s.imu_from == sid),
                None,
            )
            if succ is None:
                rec.imu_w = np.zeros((0, 3))
                rec.imu_a = np.zeros((0, 3))
                rec.imu_dt = np.zeros((0,))
                rec.imu_from = None
                return
            nxt = succ
        nxt.imu_w = np.concatenate([rec.imu_w, nxt.imu_w])
        nxt.imu_a = np.concatenate([rec.imu_a, nxt.imu_a])
        nxt.imu_dt = np.concatenate([rec.imu_dt, nxt.imu_dt])
        nxt.imu_from = rec.imu_from
        rec.imu_w = np.zeros((0, 3))
        rec.imu_a = np.zeros((0, 3))
        rec.imu_dt = np.zeros((0,))
        rec.imu_from = None
        self._pre_cache.pop(nxt.id, None)

    def _convert_keyframes_to_pose_graph(self, max_convert: int = 3):
        """Turn the least-covisible excess keyframes into pose-graph frames
        (convertToPoseGraphMst, ViGraphEstimator.cpp:319-574)."""
        cfg = self.cfg
        kf_in_window = [
            s for s in self.window
            if self.states[s].is_keyframe
            and not self.states[s].is_pose_graph_frame
        ]
        n_excess = len(kf_in_window) - cfg.num_keyframes
        if n_excess <= 0:
            return
        newest_kf = kf_in_window[-1]
        # one pass over landmarks: covisibility of every frame with the
        # newest keyframe (instead of per-pair landmark scans)
        cov_new = {s: 0 for s in kf_in_window[:-1]}
        for lm in self.landmarks.values():
            sids = {k[0] for k in lm.obs}
            if newest_kf in sids:
                for s in sids:
                    if s in cov_new:
                        cov_new[s] += 1
        to_convert = sorted(cov_new, key=cov_new.get)[: min(n_excess, max_convert)]
        for sid in to_convert:
            self._convert_one_keyframe(sid)

    def _convert_one_keyframe(self, sid: int):
        cfg = self.cfg
        rec = self.states[sid]
        # pick reference keyframe(s) via the covisibility maximum spanning
        # tree over {sid + window keyframes} (convertToPoseGraphMst /
        # buildMst, ViGraphEstimator.cpp:875-930): the factor attaches to
        # sid's MST neighbour, which is the strongest covisibility path
        partners = {
            s: 0 for s in self.window
            if s != sid and self.states[s].is_keyframe
        }
        if not partners:
            # nothing to anchor against: just drop observations
            self._strip_observations(sid)
            rec.is_pose_graph_frame = True
            return
        nodes = [sid] + list(partners)
        node_idx = {s: i for i, s in enumerate(nodes)}
        pair_cov: Dict[Tuple[int, int], int] = {}
        node_set = set(nodes)
        for lm in self.landmarks.values():
            sids = sorted({k[0] for k in lm.obs} & node_set)
            for a_i in range(len(sids)):
                for b_i in range(a_i + 1, len(sids)):
                    key = (sids[a_i], sids[b_i])
                    pair_cov[key] = pair_cov.get(key, 0) + 1
        edges = [
            (node_idx[a], node_idx[b], w) for (a, b), w in pair_cov.items()
        ]
        mst = max_spanning_tree(len(nodes), edges)
        # sid's neighbours in the MST; fall back to strongest direct pair
        refs = [
            nodes[v] if nodes[u] == sid else nodes[u]
            for u, v, _ in mst
            if sid in (nodes[u], nodes[v])
        ]
        if refs:
            ref = refs[0]
        else:
            for lm in self.landmarks.values():
                sids = {k[0] for k in lm.obs}
                if sid in sids:
                    for s in sids:
                        if s in partners:
                            partners[s] += 1
            ref = max(partners, key=partners.get)

        # gather shared observations (both frames' obs of common landmarks)
        shared = []
        lm_list = []
        for lid, lm in self.landmarks.items():
            keys_i = [k for k in lm.obs if k[0] == ref]
            keys_j = [k for k in lm.obs if k[0] == sid]
            if keys_i and keys_j and lm.initialised:
                lm_list.append(lid)
        lm_list = lm_list[: cfg.two_pose_lm_capacity]
        lm_idx = {lid: i for i, lid in enumerate(lm_list)}
        obs_rows = []
        stored = []
        for lid in lm_list:
            lm = self.landmarks[lid]
            for (s, ci, kp), (u, v, size) in lm.obs.items():
                if s == ref or s == sid:
                    obs_rows.append(
                        (0.0 if s == ref else 1.0, ci, lm_idx[lid], u, v,
                         8.0 / size)
                    )
                if s == sid:
                    stored.append((lid, s, ci, kp, u, v, size))

        if len(lm_list) >= 3 and len(obs_rows) >= 8:
            Oc = cfg.two_pose_obs_capacity
            Lc = cfg.two_pose_lm_capacity
            obs_arr = np.zeros((Oc, 6))
            obs_m = np.zeros(Oc, bool)
            n = min(len(obs_rows), Oc)
            obs_arr[:n] = np.asarray(obs_rows[:n])
            obs_m[:n] = True
            hp = np.zeros((Lc, 4))
            hp[:, 3] = 1.0
            lmm = np.zeros(Lc, bool)
            for lid, i in lm_idx.items():
                hp[i] = self.landmarks[lid].hp_W
                lmm[i] = True
            out = compute_two_pose_factor(
                jnp.asarray(self.states[ref].pose),
                jnp.asarray(rec.pose),
                jnp.asarray(np.stack(self.T_SC)),
                jnp.asarray(hp),
                jnp.asarray(obs_arr),
                jnp.asarray(obs_m),
                jnp.asarray(lmm),
                self.cameras,
            )
            self.pose_graph_edges.append(
                PoseGraphEdge(
                    ref, sid, np.asarray(out["T_ij"]),
                    np.asarray(out["sqrt_info"]), stored, "marg",
                )
            )
        # remove this frame's observations from the live graph
        self._strip_observations(sid)
        rec.is_pose_graph_frame = True

    def reactivate_loop_states(self, chain: List[int]):
        """Re-admit the oldest `num_loop_closure_frames` states of a
        closed loop into the realtime window, unfrozen — the
        addLoopClosureFrame loop-span unfreeze + window-composition role
        of numLoopClosureFrames (ViSlamBackend.cpp:1284-1409,
        config/euroc.yaml:77)."""
        n = self.cfg.num_loop_closure_frames
        if n <= 0:
            return 0
        added = 0
        for sid in chain[:n]:
            rec = self.states.get(sid)
            if rec is None:
                continue
            rec.frozen = False
            if sid not in self.window:
                rec.in_window = True
                # keep the window time-ordered
                pos = 0
                while pos < len(self.window) and self.window[pos] < sid:
                    pos += 1
                self.window.insert(pos, sid)
                added += 1
        return added

    def expand_keyframe(self, sid: int, min_shared: int = 12) -> bool:
        """Frontier re-activation (expandKeyframe,
        ViSlamBackend.cpp:357-406): when the current keyframe re-observes
        landmarks stored in a pose-graph frame's marginalisation edge,
        convert that edge back into live observations and return the
        frame to the window."""
        lms_cur = {lid for (lid, _c, _k) in self.obs_of_state(sid)}
        if not lms_cur:
            return False
        best, best_n = None, 0
        for e in self.pose_graph_edges:
            if e.kind != "marg" or not e.stored_obs:
                continue
            target = e.id_j
            if target in self.window or target not in self.states:
                continue
            n = sum(1 for o in e.stored_obs if o[0] in lms_cur)
            if n > best_n:
                best, best_n = e, n
        if best is None or best_n < min_shared:
            return False
        for (lid, s, ci, kp, u, v, size) in best.stored_obs:
            if lid in self.landmarks and s in self.states:
                self.landmarks[lid].obs[(s, ci, kp)] = (u, v, size)
        self._obs_rev = getattr(self, "_obs_rev", 0) + 1
        self.pose_graph_edges.remove(best)
        rec = self.states[best.id_j]
        rec.frozen = False
        rec.is_pose_graph_frame = False
        if best.id_j not in self.window:
            rec.in_window = True
            pos = 0
            while pos < len(self.window) and self.window[pos] < best.id_j:
                pos += 1
            self.window.insert(pos, best.id_j)
        return True

    def _strip_observations(self, sid: int):
        for lm in self.landmarks.values():
            for key in [k for k in lm.obs if k[0] == sid]:
                del lm.obs[key]
        self._obs_rev = getattr(self, "_obs_rev", 0) + 1

    def _freeze_and_shrink(self):
        """Freeze old pose-graph frames; drop states from the window when
        all their constraints are frozen (freezePosesUntil,
        ViGraphEstimator.cpp:201-318)."""
        cfg = self.cfg
        pg = [s for s in self.window if self.states[s].is_pose_graph_frame]
        # keep the newest num_pose_graph_frames unfrozen
        for sid in pg[:-cfg.num_pose_graph_frames] if cfg.num_pose_graph_frames else pg:
            self.states[sid].frozen = True
        # drop frozen pose-graph frames whose edges all touch frozen states
        for sid in list(self.window):
            rec = self.states[sid]
            if not (rec.is_pose_graph_frame and rec.frozen):
                continue
            partners_unfrozen = any(
                (e.id_i == sid and not self.states[e.id_j].frozen)
                or (e.id_j == sid and not self.states[e.id_i].frozen)
                for e in self.pose_graph_edges
            )
            has_obs = any(
                any(k[0] == sid for k in lm.obs)
                for lm in self.landmarks.values()
            )
            if not partners_unfrozen and not has_obs:
                self._drop_from_window(sid)
        # hard cap: force-drop oldest frozen states beyond capacity
        while len(self.window) > cfg.window_slots:
            for sid in self.window:
                if self.states[sid].frozen:
                    self._drop_from_window(sid)
                    break
            else:
                # nothing frozen to drop: freeze the oldest
                self.states[self.window[0]].frozen = True

    def _drop_from_window(self, sid: int):
        """Remove a state from the window keeping the IMU chain sound.
        States that vanish from every graph (plain IMU frames) get their
        buffer merged into the window successor; keyframes / pose-graph
        frames stay in the full graph, so they keep their buffer and the
        realtime pack simply masks the now non-adjacent link."""
        rec = self.states[sid]
        idx = self.window.index(sid)
        if (
            not rec.is_keyframe
            and not rec.is_pose_graph_frame
            and 0 < idx < len(self.window) - 1
        ):
            self._merge_imu_into_successor(
                sid, self.states[self.window[idx + 1]]
            )
        self._pre_cache.pop(sid, None)
        rec.in_window = False
        self.window.remove(sid)
        if not rec.is_keyframe and not rec.is_pose_graph_frame:
            self._set_history_anchor(sid)

    # ------------------------------------------------------------------
    def _set_history_anchor(self, sid: int):
        """A non-keyframe state leaving the optimised graph records its
        pose relative to the nearest keyframe/pose-graph state (by time)
        still being optimised. `trajectory()` recomposes through the
        anchor, so loop closures and full-graph solves that move
        keyframes carry the eliminated history with them — the
        keyframe-relative non-causal update of okvis::Trajectory
        (okvis_ceres/src/Trajectory.cpp)."""
        rec = self.states[sid]
        best, best_dt = None, float("inf")
        for s in self.window:
            r = self.states[s]
            if not (r.is_keyframe or r.is_pose_graph_frame):
                continue
            dt = abs(r.t - rec.t)
            if dt < best_dt:
                best, best_dt = s, dt
        if best is None:
            return  # no optimised anchor exists (startup) — keep absolute
        rec.anchor_id = best
        rec.T_anchor7 = _compose7_np(
            _inverse7_np(self.states[best].pose), rec.pose
        )

    def get_pose(self, sid: int) -> np.ndarray:
        return self.states[sid].pose

    def trajectory(self) -> List[Tuple[float, np.ndarray]]:
        out = []
        for s in self.state_order:
            rec = self.states[s]
            if rec.anchor_id is not None and rec.anchor_id in self.states:
                pose = _compose7_np(
                    self.states[rec.anchor_id].pose, rec.T_anchor7
                )
            else:
                pose = rec.pose
            out.append((rec.t, pose))
        return out


def _set_row(full: np.ndarray, i: int, one: np.ndarray) -> np.ndarray:
    full = np.asarray(full).copy()
    full[i] = np.asarray(one)
    return full


_warn_counts: Dict[str, int] = {}


def _warn_capacity(key: str, msg: str):
    """Log capacity-bound truncation (weak spot vs the uncapped
    reference), rate-limited with exponential backoff: occurrences
    1, 64, 512, 4096, ... (a per-frame condition must not flood logs)."""
    import logging

    n = _warn_counts.get(key, 0)
    _warn_counts[key] = n + 1
    if n == 0 or n == 64 or (n >= 512 and (n & (n - 1)) == 0):
        logging.getLogger("okvis2_tpu").warning("%s (x%d)", msg, n + 1)


# -- numpy quaternion helpers (xyzw, Eigen convention like core/so3) --
# host bookkeeping must not issue eager device ops: over the TPU tunnel
# every op is a ~ms roundtrip

def _quat_conj_np(q: np.ndarray) -> np.ndarray:
    return np.concatenate([-q[:3], q[3:4]])


def _quat_mul_np(q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    v1, w1 = q1[:3], q1[3]
    v2, w2 = q2[:3], q2[3]
    v = w1 * v2 + w2 * v1 + np.cross(v1, v2)
    w = w1 * w2 - v1 @ v2
    q = np.concatenate([v, [w]])
    return q / np.linalg.norm(q)


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _compose7_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """T_a ∘ T_b for [r|q_xyzw] 7-vectors (numpy, no device ops)."""
    r = a[:3] + _quat_to_mat_np(a[3:7]) @ b[:3]
    q = _quat_mul_np(a[3:7], b[3:7])
    return np.concatenate([r, q])


def _inverse7_np(a: np.ndarray) -> np.ndarray:
    qc = _quat_conj_np(a[3:7])
    return np.concatenate([-(_quat_to_mat_np(qc) @ a[:3]), qc])
