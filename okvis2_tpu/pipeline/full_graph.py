"""Full-graph optimisation + loop closure backend.

Covers the loop-closure half of okvis::ViSlamBackend (reference:
okvis_ceres/src/ViSlamBackend.cpp — attemptLoopClosure :2033-2210,
addLoopClosureFrame :1284-1409, optimiseFullGraph :1726-1757,
synchroniseRealtimeAndFullGraph :1411-1650) with a TPU-first
simplification of the threading model:

The reference runs a SECOND copy of the whole factor graph in a
background thread because a CPU Ceres solve of the full history takes
seconds; merging the two copies back (backlogs, touched-state sets,
rigid re-anchoring) is the subtlest machinery in the codebase. On TPU
the equivalent full-graph solve is a single fixed-shape device program
that runs in milliseconds at realistic session sizes, so we run it
*inline* right after a verified loop closure and write results straight
back — no replica, no backlog, same math.

Loop-closure fidelity (matching the reference mechanisms):
- geometric verification returns the matched landmark pairs and a
  GN-refined pose whose 6x6 Hessian becomes the edge information
  (verifyRecognisedPlace + mini ceres solve, Frontend.cpp:271-555);
- a drift-error-budget acceptance test rejects place matches whose
  implied correction exceeds what odometry drift can explain
  (ViSlamBackend.cpp:2131-2153);
- the accepted correction is DISTRIBUTED over the loop's states by
  path-length-weighted slerp before solving (ViSlamBackend.cpp:2160-2200),
  with landmarks rigidly following their anchor keyframe;
- duplicate landmarks re-observed through the loop are merged
  (Frontend.cpp:853-879 -> ViSlamBackend::mergeLandmark :1685);
- stored observations of marginalisation edges inside the loop span are
  re-activated (convertToObservations at loop closure,
  ViSlamBackend.cpp:1284-1409) so the full-graph solve is a real bundle
  adjustment over the loop, not pose-graph-only;
- the full problem GROWS in powers of two instead of silently
  truncating old keyframes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.core import se3_np
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.frontend.bow import BinaryVocabulary, PlaceRecognitionDatabase
from okvis2_tpu.frontend.matching import match_descriptors
from okvis2_tpu.frontend.p3p import ransac_rig_pose
from okvis2_tpu.frontend.pose_refine import refine_pose_hessian
from okvis2_tpu.graph.estimator import Estimator, PoseGraphEdge
from okvis2_tpu.solver.gauss_newton import solve_window
from okvis2_tpu.solver.window_problem import SolverConfig, WindowProblem


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    min_score: float = 0.4  # DBoW acceptance (Frontend.cpp:802)
    min_inliers: int = 10  # verifyRecognisedPlace (Frontend.cpp:359-389)
    # the reference uses 0.7 with BRISK on real imagery
    # (Frontend.cpp:1224-1359); our ring descriptor on long-horizon
    # synthetic content aliases more, so true revisits measure ~0.4-0.5
    # inlier share vs 0.1-0.2 for FALSE candidates (r4 600-frame A/B:
    # 11-12 inliers of ~27 at the true revisit, 3-4 at impostors).
    # The absolute min_inliers floor, the drift-budget gate and the
    # eigen-clipped edge information carry the false-positive defence
    min_inlier_ratio: float = 0.35
    verify_match_threshold: int = 80  # Hamming, wider than tracking
    verify_capacity: int = 512  # fixed landmark-candidate slots per verify
    # place-recognition database density (prunePlaceRecognitionFrames
    # parity, ViSlamBackend.cpp:2276-2309). r4's near-miss diagnosis
    # showed ~10 stored PR frames/lap left the circle-1200 revisit one
    # descriptor-statistics shift away from 0 closures; the densified
    # defaults (coverage harder to claim: higher overlap bar, tighter
    # same-ray cone) roughly double the stored frames per lap
    pr_max_overlap: float = 0.75
    pr_max_ray_angle: float = 0.03
    # don't match against the most recent N place-recognition frames;
    # with view-pruned, well-spaced PR frames a small N suffices (the
    # drift budget + pose verification guard against near-field matches)
    exclude_recent: int = 5
    full_graph_iterations: int = 15  # config/euroc.yaml:85
    vocabulary_size: int = 512
    # pretrained general vocabulary (the reference ships
    # resources/small_voc.yml.gz the same way); None disables, "" means
    # the committed default resource. Falls back to online training
    # when the file is missing.
    vocabulary_path: Optional[str] = ""
    # online-training fallback: train as soon as a few keyframes' worth
    # of descriptors exist — waiting longer starves place recognition
    # on keyframe-sparse sequences
    min_train_descriptors: int = 800
    # drift error budget (ViSlamBackend.cpp:2135-2140): positional
    # 1.35 %/m of travelled path + 2 % scale + noise/sqrt(steps);
    # rotational (4e-4 + 4e-3/sqrt(steps)) rad per step
    drift_pos_per_m: float = 0.0135
    drift_pos_scale: float = 0.02
    drift_pos_noise: float = 0.08
    drift_rot_per_step: float = 0.0004
    drift_rot_noise: float = 0.004
    check_drift_budget: bool = True
    reactivate_observations: bool = True
    max_reactivated_landmarks: int = 4096
    max_reactivated_obs: int = 16384


def _pow2_at_least(n: int, floor: int) -> int:
    s = floor
    while s < n:
        s *= 2
    return s


class LoopClosureBackend:
    """Place recognition + loop-closure verification + full-graph solve."""

    def __init__(self, cameras, extrinsics, config: LoopClosureConfig = LoopClosureConfig()):
        self.cameras = tuple(cameras)
        self.extrinsics = list(extrinsics)
        self.T_SC_np = np.stack([
            np.concatenate([np.asarray(T.r), np.asarray(T.q)])
            for T in extrinsics
        ])
        self.cfg = config
        self.voc: Optional[BinaryVocabulary] = None
        self.db: Optional[PlaceRecognitionDatabase] = None
        # prefer the committed general vocabulary (first-scene-biased
        # online training is the fallback; the reference ships a
        # pretrained small_voc.yml.gz the same way)
        if config.vocabulary_path is not None:
            import os

            path = config.vocabulary_path or os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "resources", "default_voc.npz",
            )
            if os.path.exists(path):
                self.voc = BinaryVocabulary.load(path)
                self.db = PlaceRecognitionDatabase(self.voc)
        self._train_buffer: List[np.ndarray] = []
        # per keyframe: descriptor signs + keypoint xy (cam0) for verification
        self._kf_data: dict = {}
        self._key = jax.random.PRNGKey(7)
        self.num_loop_closures = 0
        self.num_rejected_by_budget = 0
        # per ACCEPTED closure: verify inlier-ratio headroom over the
        # acceptance threshold (ratio / min_inlier_ratio). The r4
        # circle-1200 revisit passed at 0.52/0.55 "by a hair" before the
        # multi-variant descriptor fix; the regression suite gates on
        # this staying >= 1.2 (VERDICT r4 #5)
        self.verify_margins: List[float] = []
        self._pr_ids: List[int] = []
        # loaded-map components, each with its own queryable database
        # (Frontend::loadComponent fills per-component DBoW databases,
        # Frontend.cpp:180-218)
        self._components: List[dict] = []
        # debug/introspection: last query results + last verify diagnosis
        self.last_query_results = []
        self.last_verify_info = ""

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def _cos_half_fov(self) -> float:
        cached = getattr(self, "_cos_half_fov_v", None)
        if cached is None:
            cam = self.cameras[0]
            f = np.asarray(cam.focal, np.float64)
            half = float(np.arctan(np.hypot(
                0.5 * cam.width / f[0], 0.5 * cam.height / f[1]
            )))
            cached = float(np.cos(half))
            self._cos_half_fov_v = cached
        return cached

    def _pr_eligible(self, estimator: Estimator, sid: int,
                     max_overlap: Optional[float] = None,
                     max_ray_angle: Optional[float] = None) -> bool:
        """prunePlaceRecognitionFrames parity (ViSlamBackend.cpp:
        2276-2309: overlapFraction > 0.6 drops the frame from DBoW
        eligibility): a candidate keyframe's observed landmark is
        "covered" by a stored PR frame when it lies in that frame's
        viewing cone AND is seen from nearly the same ray direction
        (< max_ray_angle of parallax — hovering in place is covered, a
        real baseline is not, mirroring the reference's projected-hull
        overlap shrinking with viewpoint change; 0.05 rad keeps ~1 m
        displacements at ~10 m scene depth as distinct views). When any stored
        frame covers > max_overlap of the view, adding the candidate
        gains no recall and bloats the database — this bounds growth on
        arbitrarily long revisiting trajectories, which the previous
        last-8 proxy did not. Vectorised numpy over ALL stored frames
        at PR-frame granularity."""
        if max_overlap is None:
            max_overlap = self.cfg.pr_max_overlap
        if max_ray_angle is None:
            max_ray_angle = self.cfg.pr_max_ray_angle
        rec_c = estimator.states[sid]
        pts = []
        for (lid, _ci, _kp) in estimator.obs_of_state(sid):
            lm = estimator.landmarks.get(lid)
            if lm is not None:
                hp = lm.hp_W
                w = hp[3] if abs(hp[3]) > 1e-12 else 1e-12
                pts.append(hp[:3] / w)
        if len(pts) < 8:
            return True  # too few points to judge overlap
        p = np.asarray(pts)  # [n,3]
        R_SC0 = se3_np.quat_to_mat(self.T_SC_np[0, 3:7])
        r_SC0 = self.T_SC_np[0, :3]
        R_WSc = se3_np.quat_to_mat(rec_c.pose[3:7])
        o_c = rec_c.pose[:3] + R_WSc @ r_SC0
        ray_c = p - o_c[None, :]
        ray_c = ray_c / np.maximum(
            np.linalg.norm(ray_c, axis=-1, keepdims=True), 1e-9
        )
        fwds, origins = [], []
        for prev in self._pr_ids:
            rec = estimator.states.get(prev)
            if rec is None:
                continue
            R_WS = se3_np.quat_to_mat(rec.pose[3:7])
            origins.append(rec.pose[:3] + R_WS @ r_SC0)
            fwds.append(R_WS @ R_SC0[:, 2])  # cam0 optical axis
        if not origins:
            return True
        o = np.stack(origins)  # [P,3]
        f = np.stack(fwds)  # [P,3]
        rel = p[None, :, :] - o[:, None, :]  # [P,n,3]
        dist = np.maximum(np.linalg.norm(rel, axis=-1), 1e-9)
        z = np.einsum("pnk,pk->pn", rel, f)
        in_cone = (z > 0.2) & (z > self._cos_half_fov() * dist)
        ray_dot = np.einsum(
            "pnk,nk->pn", rel / dist[..., None], ray_c
        )
        same_view = ray_dot > np.cos(max_ray_angle)
        overlap = (in_cone & same_view).mean(axis=1)  # [P]
        return float(overlap.max()) <= max_overlap

    @staticmethod
    def _stack_frames(frames):
        """[NC,N,...] host stacks of a keyframe's per-camera data."""
        signs = np.stack([f["signs_np"] for f in frames])
        mask = np.stack([np.asarray(f["mask"], bool) for f in frames])
        xy = np.stack([np.asarray(f["xy"]) for f in frames])
        return signs, mask, xy

    def add_keyframe(self, estimator: Estimator, sid: int, frames):
        """Register a keyframe for place recognition, unless pruned for
        overlap. The BoW document concatenates ALL cameras' descriptors
        (the reference builds its DBoW features the same way,
        Frontend.cpp:660-673) — a stereo rig doubles recall, a Hilti rig
        7x's it."""
        if not self._pr_eligible(estimator, sid):
            return
        self._pr_ids.append(sid)
        signs, mask, xy = self._stack_frames(frames)
        self._kf_data[sid] = {"signs": signs, "mask": mask, "xy": xy}
        B = signs.shape[-1]
        flat_signs = signs.reshape(-1, B)
        flat_mask = mask.reshape(-1)
        if self.voc is None:
            self._train_buffer.append(flat_signs[flat_mask])
            total = sum(len(b) for b in self._train_buffer)
            if total >= self.cfg.min_train_descriptors:
                train = np.concatenate(self._train_buffer)
                self.voc = BinaryVocabulary.train(
                    train, n_words=self.cfg.vocabulary_size
                )
                self.db = PlaceRecognitionDatabase(self.voc)
                # backfill database
                for kid, d in self._kf_data.items():
                    Bk = d["signs"].shape[-1]
                    self.db.add(
                        kid, d["signs"].reshape(-1, Bk),
                        d["mask"].reshape(-1),
                    )
                self._train_buffer = []
            return
        self.db.add(sid, flat_signs, flat_mask)

    # ------------------------------------------------------------------
    def detect_loop(self, estimator: Estimator, sid: int, frames,
                    frontend=None) -> Optional[int]:
        """Query place recognition for the current keyframe (all
        cameras' descriptors); verify geometrically; return the matched
        old keyframe id or None."""
        if self.db is None or len(self.db) < self.cfg.exclude_recent + 2:
            return None
        signs, mask, _xy = self._stack_frames(frames)
        B = signs.shape[-1]
        results = self.db.query(
            signs.reshape(-1, B),
            mask.reshape(-1),
            exclude_recent=self.cfg.exclude_recent,
            min_score=self.cfg.min_score,
        )
        self.last_query_results = results[:5]
        for old_id, score in results[:3]:
            v = self._verify(estimator, old_id, sid, frames, frontend)
            if v is not None:
                return old_id
        return None

    def _verify(self, estimator: Estimator, old_id: int, sid: int, frames,
                frontend=None):
        """Geometric verification (verifyRecognisedPlace,
        Frontend.cpp:271-555): match the current frame's descriptors
        (ALL cameras) against the old keyframe's landmarks, rig
        absolute-pose RANSAC, then a GN pose refine whose 6x6 Hessian is
        the edge information. Returns dict {T_WS7, H, sqrt_info, pairs}
        or None; pairs are (lid, cam, kp) of the current frame."""
        cfg = self.cfg
        old = self._kf_data.get(old_id)
        if old is None:
            return None
        N_old = old["signs"].shape[1]
        # landmarks observed by the old keyframe (any camera), keyed by
        # landmark id so a landmark seen both live and in a
        # marginalisation edge's stored_obs (or in several edges) enters
        # the verify problem ONCE — duplicates would double-count in the
        # RANSAC inlier count, ratio test, and refine Hessian
        entry_of: Dict[int, Tuple[int, int]] = {}
        for lid, lm in estimator.landmarks.items():
            for (s, ci, kp) in lm.obs:
                if s == old_id and kp < N_old:
                    entry_of[lid] = (ci, kp)
                    break
        # landmarks of marginalised edges (stored observations)
        for e in estimator.pose_graph_edges:
            for (lid, s, ci, kp, u, v, size) in e.stored_obs:
                if (s == old_id and kp < N_old and lid not in entry_of
                        and lid in estimator.landmarks):
                    entry_of[lid] = (ci, kp)
        if len(entry_of) < cfg.min_inliers:
            self.last_verify_info = f"few lm_entries {len(entry_of)}"
            return None
        # up to 3 descriptor VARIANTS per landmark (the old keyframe's
        # own view + the landmark's accumulated distinct views from the
        # frontend's descriptor sets): a revisit often matches a later
        # view of the landmark better than the PR frame's own — the
        # reference's <=3-descriptors-per-landmark matching
        # (Frontend.cpp:1224-1359). Capacity-aware: every landmark's
        # primary descriptor enters before any variants do.
        desc_of_lid = {}
        for lid, (ci, kp) in entry_of.items():
            base_signs = old["signs"][ci][kp]
            descs = [base_signs]
            if frontend is not None:
                base = np.packbits(np.asarray(base_signs) > 0)
                for p in frontend.lm_desc_sets.get(lid, ()):
                    if int(np.unpackbits(p ^ base).sum()) < 16:
                        continue  # near-duplicate of the old view
                    descs.append(
                        np.unpackbits(p).astype(np.float32) * 2.0 - 1.0
                    )
                    if len(descs) >= 3:
                        break
            desc_of_lid[lid] = descs
        lm_entries = []
        for r in range(max(len(d) for d in desc_of_lid.values())):
            for lid, descs in desc_of_lid.items():
                if r < len(descs) and len(lm_entries) < cfg.verify_capacity:
                    lm_entries.append((lid, descs[r]))
        pts = {
            lid: estimator.landmarks[lid].hp_W[:3]
            / max(estimator.landmarks[lid].hp_W[3], 1e-12)
            for lid in desc_of_lid
        }
        return self._verify_entries(lm_entries, pts, frames)

    def _verify_entries(self, lm_entries, pts_of, frames):
        """Core geometric verification shared by loop closure and
        multi-session relocalisation: lm_entries = [(lid, signs)],
        pts_of = {lid: p_W [3]}; matches against ALL cameras of the
        current frame, rig P3P RANSAC, GN refine + Hessian."""
        cfg = self.cfg
        NC = len(self.cameras)
        # fixed-capacity padding throughout: variable landmark/match counts
        # would recompile the matching + RANSAC programs on every query
        cap = cfg.verify_capacity
        sel = lm_entries[:cap]
        n_sel = len(sel)
        B = sel[0][1].shape[-1]
        sg = np.zeros((cap, B), sel[0][1].dtype)
        sg[:n_sel] = np.stack([s for _, s in sel])
        sel_mask = np.zeros(cap, bool)
        sel_mask[:n_sel] = True
        pts_W = np.zeros((cap, 3))
        pts_W[:n_sel] = np.stack([pts_of[lid] for lid, _ in sel])
        # current frame: all cameras' descriptors concatenated; matched
        # keypoint index decodes as (cam, kp) = divmod(idx, N)
        cur_signs = np.stack([f["signs_np"] for f in frames])
        cur_mask = np.stack([np.asarray(f["mask"], bool) for f in frames])
        N = cur_signs.shape[1]
        m = match_descriptors(
            jnp.asarray(sg),
            jnp.asarray(sel_mask),
            jnp.asarray(cur_signs.reshape(NC * N, B)),
            jnp.asarray(cur_mask.reshape(NC * N)),
            max_distance=cfg.verify_match_threshold,
        )
        ok = np.asarray(m["valid"]).copy()
        dist = np.asarray(m["dist"])
        # one surviving row per LANDMARK (entries may carry several
        # descriptor variants of the same landmark — without dedup a
        # twice-matched landmark would double-count in the RANSAC
        # inlier tally and the refine Hessian)
        best_row: Dict[int, int] = {}
        for i in np.nonzero(ok[:n_sel])[0]:
            lid = sel[i][0]
            j = best_row.get(lid)
            if j is None or dist[i] < dist[j]:
                best_row[lid] = int(i)
        keep = np.zeros(cap, bool)
        keep[list(best_row.values())] = True
        ok &= keep
        n_lids = len({lid for lid, _ in sel})
        if ok.sum() < cfg.min_inliers:
            self.last_verify_info = (
                f"few desc matches {int(ok.sum())}/{n_lids}"
            )
            return None
        idx_np = np.asarray(m["idx_b"])
        idx_full = np.where(ok, idx_np, 0)
        rays_all = jnp.concatenate([
            cam.back_project(jnp.asarray(np.asarray(f["xy"])))
            for cam, f in zip(self.cameras, frames)
        ])
        rays = rays_all[jnp.asarray(idx_full)]
        cam_idx = jnp.asarray((idx_full // N).astype(np.int32))
        T_SC7 = jnp.asarray(self.T_SC_np)
        res = ransac_rig_pose(
            self._next_key(),
            jnp.asarray(pts_W),
            rays,
            cam_idx,
            jnp.asarray(ok),
            T_SC7,
        )
        n_in = int(res["num_inliers"])
        if n_in < cfg.min_inliers or n_in < cfg.min_inlier_ratio * int(ok.sum()):
            self.last_verify_info = f"ransac inliers {n_in}/{int(ok.sum())}"
            return None
        verify_margin = (n_in / max(int(ok.sum()), 1)) / cfg.min_inlier_ratio
        # GN refine on the inlier set; 6x6 Hessian = edge information
        # (the reference's mini ceres solve, Frontend.cpp:440-530)
        T = res["T_WS"]
        T_WS7 = np.concatenate([np.asarray(T.r), np.asarray(T.q)])
        T_SW7 = se3_np.inverse7(T_WS7)
        inl = np.asarray(res["inliers"])
        T_SW7_r, H, sqrt_info = refine_pose_hessian(
            jnp.asarray(T_SW7),
            jnp.asarray(pts_W),
            rays,
            cam_idx,
            jnp.asarray(inl),
            T_SC7,
        )
        T_SW7_r, H, sqrt_info = jax.device_get((T_SW7_r, H, sqrt_info))
        if not np.all(np.isfinite(T_SW7_r)):
            self.last_verify_info = "refine diverged"
            return None
        pairs = [
            (sel[i][0],) + divmod(int(idx_np[i]), N)
            for i in np.nonzero(inl[:n_sel])[0]
        ]
        return {
            "T_WS7": se3_np.inverse7(np.asarray(T_SW7_r)),
            "H": np.asarray(H),
            "sqrt_info": np.asarray(sqrt_info),
            "pairs": pairs,
            "num_inliers": n_in,
            "margin": verify_margin,
        }

    # ------------------------------------------------------------------
    # multi-session relocalisation (per-component databases)
    # ------------------------------------------------------------------
    def has_components(self) -> bool:
        return bool(self._components)

    def add_component(self, kf_docs: Dict[int, List[int]],
                      lm_signs: Dict[int, np.ndarray]):
        """Register a loaded component for place-recognition-based
        relocalisation: kf_docs maps component keyframe id -> list of
        observed landmark ids (SESSION ids after remapping); lm_signs
        maps landmark id -> descriptor signs. Each component gets its
        own queryable database (Frontend.cpp:180-218, queried at
        :674-749) so a fresh session can relocalise from an UNKNOWN pose
        — projection-gated matching alone needs the prediction to
        already be roughly right."""
        docs = {
            kid: [l for l in lids if l in lm_signs]
            for kid, lids in kf_docs.items()
        }
        docs = {k: v for k, v in docs.items() if len(v) >= 3}
        if not docs:
            return
        if self.voc is None:
            # bootstrap the vocabulary from the component's descriptors:
            # relocalisation must work from frame one of a fresh session,
            # before any online training data exists — and a previous
            # session's descriptors are a far better sample than the
            # first few keyframes of this one
            train = np.stack([
                lm_signs[l] for lids in docs.values() for l in lids
            ])
            self.voc = BinaryVocabulary.train(
                train, n_words=min(self.cfg.vocabulary_size, len(train))
            )
            self.db = PlaceRecognitionDatabase(self.voc)
            for kid, d in self._kf_data.items():
                B = d["signs"].shape[-1]
                self.db.add(
                    kid, d["signs"].reshape(-1, B),
                    d["mask"].reshape(-1),
                )
            self._train_buffer = []
        cdb = PlaceRecognitionDatabase(self.voc)
        for kid, lids in docs.items():
            cdb.add(kid, np.stack([lm_signs[l] for l in lids]))
        self._components.append({"db": cdb, "docs": docs,
                                 "signs": lm_signs})

    def relocalise(self, estimator: Estimator, sid: int, frames):
        """Query every loaded component's database with the current
        keyframe (all cameras) and geometrically verify WITHOUT any
        pose prior. Returns the verify dict (T_WS7, pairs, sqrt_info,
        ...) of the first verified hit, or None."""
        if not self._components:
            return None
        signs, mask, _xy = self._stack_frames(frames)
        B = signs.shape[-1]
        q_signs = signs.reshape(-1, B)
        q_mask = mask.reshape(-1)
        for comp in self._components:
            results = comp["db"].query(
                q_signs, q_mask, min_score=self.cfg.min_score
            )
            self.last_query_results = results[:5]
            for kid, _score in results[:3]:
                lids = [
                    l for l in comp["docs"][kid]
                    if l in estimator.landmarks
                ]
                if len(lids) < self.cfg.min_inliers:
                    continue
                lm_entries = [(l, comp["signs"][l]) for l in lids]
                pts_of = {
                    l: estimator.landmarks[l].hp_W[:3]
                    / max(estimator.landmarks[l].hp_W[3], 1e-12)
                    for l in lids
                }
                v = self._verify_entries(lm_entries, pts_of, frames)
                if v is not None:
                    return v
        return None

    # ------------------------------------------------------------------
    def _loop_chain(self, estimator: Estimator, old_id: int, sid: int):
        """Keyframe/pose-graph state ids from old_id to sid inclusive."""
        ids = [
            s for s in estimator.state_order
            if old_id <= s <= sid and s in estimator.states
            and (estimator.states[s].is_keyframe
                 or estimator.states[s].is_pose_graph_frame
                 or s in estimator.window)
        ]
        if old_id not in ids:
            ids.insert(0, old_id)
        if sid not in ids:
            ids.append(sid)
        return ids

    def _drift_budget_ok(self, estimator, chain, T_WS_meas7, sid) -> bool:
        """attemptLoopClosure's error-budget acceptance
        (ViSlamBackend.cpp:2131-2153): the implied correction must be
        explicable by accumulated odometry drift over the loop path."""
        cfg = self.cfg
        poses = [estimator.states[s].pose for s in chain]
        steps = max(len(chain) - 1, 1)
        path = float(
            sum(np.linalg.norm(poses[k + 1][:3] - poses[k][:3])
                for k in range(len(poses) - 1))
        )
        T_est = estimator.states[sid].pose
        # discrepancy between measured and estimated CURRENT pose
        d_pos = float(np.linalg.norm(T_WS_meas7[:3] - T_est[:3]))
        dq = se3_np.quat_mul(se3_np.quat_conj(T_est[3:7]), T_WS_meas7[3:7])
        d_rot = float(np.linalg.norm(se3_np.log_so3(dq)))
        rel_norm = float(np.linalg.norm(
            T_WS_meas7[:3] - estimator.states[chain[0]].pose[:3]
        ))
        budget_pos = (
            cfg.drift_pos_per_m * path
            + cfg.drift_pos_scale * rel_norm
            + cfg.drift_pos_noise * path / max(np.sqrt(steps), 1.0)
        )
        budget_rot = (cfg.drift_rot_per_step
                      + cfg.drift_rot_noise / np.sqrt(steps)) * steps
        ok = d_pos <= budget_pos and d_rot <= budget_rot
        if not ok:
            self.last_verify_info = (
                f"drift budget: d_pos {d_pos:.3f}>{budget_pos:.3f} or "
                f"d_rot {d_rot:.4f}>{budget_rot:.4f} (path {path:.2f} m, "
                f"{steps} steps)"
            )
        return ok

    def _distribute_drift(self, estimator, chain, T_WS_meas7, sid):
        """Spread the loop correction over the chain by path-length-
        weighted interpolation (slerp for rotation), moving landmarks
        rigidly with their anchor keyframe
        (ViSlamBackend.cpp:2160-2200)."""
        old_poses = {s: estimator.states[s].pose.copy() for s in chain}
        T_est = estimator.states[sid].pose
        # world-frame left correction at the loop end
        T_corr = se3_np.compose7(T_WS_meas7, se3_np.inverse7(T_est))
        r_c = T_corr[:3]
        q_c = T_corr[3:7]
        rotvec = se3_np.log_so3(q_c)
        # cumulative path weights
        cum = [0.0]
        for k in range(len(chain) - 1):
            cum.append(cum[-1] + float(np.linalg.norm(
                estimator.states[chain[k + 1]].pose[:3]
                - estimator.states[chain[k]].pose[:3]
            )))
        total = max(cum[-1], 1e-9)
        for k, s in enumerate(chain):
            w = cum[k] / total
            half = 0.5 * w * rotvec
            ang = np.linalg.norm(half)
            q_w = (np.concatenate([half * np.sinc(ang / np.pi), [np.cos(ang)]])
                   if ang > 0 else np.array([0.0, 0, 0, 1.0]))
            dT = np.concatenate([w * r_c, q_w / np.linalg.norm(q_w)])
            estimator.states[s].pose = se3_np.compose7(
                dT, estimator.states[s].pose
            )
        self._reanchor_landmarks(estimator, old_poses, chain)
        return old_poses

    @staticmethod
    def _reanchor_landmarks(estimator: Estimator, old_poses: dict, ids):
        """Rigidly transform each landmark by its anchor keyframe's pose
        change (one batched host computation)."""
        idset = set(ids)
        lm_list, anchor_of = [], []
        for lid, lm in estimator.landmarks.items():
            anchor = None
            for (s, _ci, _kp) in lm.obs:
                if s in idset:
                    anchor = s
                    break
            if anchor is not None:
                lm_list.append(lid)
                anchor_of.append(anchor)
        if not lm_list:
            return
        deltas = {}
        for a in set(anchor_of):
            deltas[a] = se3_np.compose7(
                estimator.states[a].pose, se3_np.inverse7(old_poses[a])
            )
        for lid, a in zip(lm_list, anchor_of):
            d = deltas[a]
            lm = estimator.landmarks[lid]
            hp = lm.hp_W
            p = se3_np.quat_to_mat(d[3:7]) @ hp[:3] + d[:3] * hp[3]
            lm.hp_W = np.concatenate([p, hp[3:4]])

    def _merge_loop_landmarks(self, estimator, sid, pairs, frames=None,
                              frontend=None):
        """Merge duplicate landmarks re-observed through the loop: if the
        current frame's keypoint kp already hosts a landmark different
        from the loop landmark, merge them (Frontend.cpp:853-879 ->
        ViSlamBackend::mergeLandmark). A verified pair whose current
        keypoint hosts NO landmark becomes a fresh observation of the
        old-map landmark (the reference's matchToMap restricted to
        loopClosureLandmarks inserts exactly these), so old-map points
        constrain the loop BA even where tracking never picked them up."""
        # current frame's (cam, kp) -> landmark map
        kp_lm = {}
        for lid, lm in estimator.landmarks.items():
            for (s, ci, kp) in lm.obs:
                if s == sid:
                    kp_lm[(ci, kp)] = lid
        n = 0
        n_new_obs = 0
        for (lid_old, ci, kp) in pairs:
            lid_new = kp_lm.get((ci, kp))
            fr = frames[ci] if frames is not None else None
            if lid_new is not None and lid_new != lid_old \
                    and lid_old in estimator.landmarks \
                    and lid_new in estimator.landmarks:
                estimator.merge_landmarks(lid_old, lid_new)
                n += 1
            elif (lid_new is None and lid_old in estimator.landmarks
                  and fr is not None and kp < len(fr["xy"])
                  and fr["mask"][kp]):
                estimator.add_observation(
                    lid_old, sid, ci, kp, fr["xy"][kp], fr["size"][kp]
                )
                if frontend is not None:
                    frontend.table.stage_descriptor(lid_old, ci, kp)
                n_new_obs += 1
        if n_new_obs and frontend is not None and frames is not None \
                and "stacked" in frames[0]:
            frontend.table.flush(frames[0]["stacked"]["signs"])
        self.num_loop_observations = getattr(
            self, "num_loop_observations", 0
        ) + n_new_obs
        return n

    def _reactivate_loop_observations(self, estimator, chain):
        """convertToObservations for marginalisation edges whose both
        endpoints lie in the loop span (ViSlamBackend.cpp:1284-1409):
        their stored reprojection errors rejoin the live problem so the
        full-graph solve is a true BA over the loop."""
        idset = set(chain)
        kept, n_restored = [], 0
        for e in estimator.pose_graph_edges:
            if (e.kind == "marg" and e.stored_obs
                    and e.id_i in idset and e.id_j in idset):
                for (lid, s, ci, kp, u, v, size) in e.stored_obs:
                    if lid in estimator.landmarks and s in estimator.states:
                        estimator.landmarks[lid].obs[(s, ci, kp)] = (u, v, size)
                        n_restored += 1
            else:
                kept.append(e)
        estimator.pose_graph_edges = kept
        estimator._obs_rev = getattr(estimator, "_obs_rev", 0) + 1
        return n_restored

    # ------------------------------------------------------------------
    def close_loop(self, estimator: Estimator, old_id: int, sid: int,
                   frames, frontend=None, async_solve: bool = False):
        """Verify, budget-check, distribute, merge, reactivate, solve —
        the attemptLoopClosure + addLoopClosureFrame sequence. With
        async_solve the full-graph solve is only DISPATCHED here and
        applied at the next frame (`apply_pending_full_graph`) — the
        loop-closure frame never blocks on it, like the reference's
        background optimiseFullGraph thread."""
        v = self._verify(estimator, old_id, sid, frames, frontend)
        if v is None:
            return False
        T_WS_meas7 = v["T_WS7"]
        chain = self._loop_chain(estimator, old_id, sid)
        if self.cfg.check_drift_budget and not self._drift_budget_ok(
                estimator, chain, T_WS_meas7, sid):
            self.num_rejected_by_budget += 1
            return False

        # relative measurement old -> new, with Hessian-derived info
        old_rec = estimator.states[old_id]
        T_ij = se3_np.compose7(
            se3_np.inverse7(old_rec.pose), T_WS_meas7
        )
        # scale guard: keep the edge from dwarfing the rest of the graph
        # by clipping the INFORMATION eigenvalues (like two_pose.py's
        # eigen-clip) instead of rescaling the whole matrix, which would
        # distort the rotation-vs-translation weighting
        H = 0.5 * (v["H"] + v["H"].T)
        evals, evecs = np.linalg.eigh(H)
        evals = np.clip(evals, 0.0, 1e8)  # sqrt-info entries <= 1e4
        sqrt_info = np.diag(np.sqrt(evals)) @ evecs.T
        estimator.pose_graph_edges.append(
            PoseGraphEdge(old_id, sid, T_ij, sqrt_info, [], "loop")
        )
        self.num_loop_closures += 1
        self.verify_margins.append(float(v.get("margin", 0.0)))

        self._merge_loop_landmarks(estimator, sid, v["pairs"], frames,
                                   frontend)
        self._distribute_drift(estimator, chain, T_WS_meas7, sid)
        if self.cfg.reactivate_observations:
            self._reactivate_loop_observations(estimator, chain)
        # the oldest loop states rejoin the realtime window unfrozen
        # (numLoopClosureFrames, config/euroc.yaml:77)
        estimator.reactivate_loop_states(chain)
        if async_solve:
            self.dispatch_full_graph(estimator)
        else:
            self.optimise_full_graph(estimator)
        return True

    # ------------------------------------------------------------------
    def pack_full_problem(self, estimator: Estimator):
        """Pack ALL keyframes + pose-graph frames into one problem: IMU
        chain links, two-pose/loop relative edges, AND live observations
        of landmarks seen from >=2 packed states (reactivated loop spans
        make this a real BA). Capacities grow in powers of two — no
        silent truncation."""
        cfg = self.cfg
        ids = [
            s for s in estimator.state_order
            if s in estimator.states
            and (estimator.states[s].is_keyframe
                 or estimator.states[s].is_pose_graph_frame
                 or s in estimator.window)
        ]
        S = _pow2_at_least(len(ids), 32)
        slot_of = {s: i for i, s in enumerate(ids)}
        # sid -> slot as a lookup array: the observation pass below runs
        # on each landmark's CACHED row block (LandmarkRecord.packed_rows,
        # rebuilt only when that landmark's observations changed) with
        # numpy filtering — the previous per-observation Python loop made
        # every loop-closure frame O(whole graph) host time
        max_sid = max(ids) if ids else 0
        slot_lookup = np.full(max_sid + 1, -1, np.int32)
        for s, i in slot_of.items():
            slot_lookup[s] = i

        # landmarks observed by >= 2 packed states
        lm_ids, lm_chunks = [], []
        for lid, lm in estimator.landmarks.items():
            if not lm.initialised:
                continue
            rows = lm.packed_rows()  # [n,5] sid,cam,u,v,8/size
            if len(rows) < 2:
                continue
            sids = rows[:, 0].astype(np.int64)
            sl = np.where(
                sids <= max_sid,
                slot_lookup[np.minimum(sids, max_sid)], -1,
            )
            m = sl >= 0
            if np.count_nonzero(m) < 2:
                continue
            lm_ids.append(lid)
            w_scale = float(np.sqrt(lm.info_scale))
            r = rows[m]
            lm_chunks.append((sl[m], r[:, 1], r[:, 2:4],
                              r[:, 4] * w_scale))
            if len(lm_ids) >= cfg.max_reactivated_landmarks:
                break
        L = _pow2_at_least(max(len(lm_ids), 1), 64)
        lm_slot = {lid: i for i, lid in enumerate(lm_ids)}

        if lm_chunks:
            o_state_v = np.concatenate([c[0] for c in lm_chunks])
            o_cam_v = np.concatenate([c[1] for c in lm_chunks]).astype(
                np.int32
            )
            o_lm_v = np.concatenate([
                np.full(len(c[0]), i, np.int32)
                for i, c in enumerate(lm_chunks)
            ])
            o_uv_v = np.concatenate([c[2] for c in lm_chunks])
            o_w_v = np.concatenate([c[3] for c in lm_chunks])
        else:
            o_state_v = np.zeros(0, np.int32)
            o_cam_v = np.zeros(0, np.int32)
            o_lm_v = np.zeros(0, np.int32)
            o_uv_v = np.zeros((0, 2))
            o_w_v = np.zeros(0)
        if len(o_state_v) > cfg.max_reactivated_obs:
            o_state_v = o_state_v[: cfg.max_reactivated_obs]
            o_cam_v = o_cam_v[: cfg.max_reactivated_obs]
            o_lm_v = o_lm_v[: cfg.max_reactivated_obs]
            o_uv_v = o_uv_v[: cfg.max_reactivated_obs]
            o_w_v = o_w_v[: cfg.max_reactivated_obs]
        n_obs = len(o_state_v)
        O = _pow2_at_least(max(n_obs, 1), 256)

        n_rel = sum(
            1 for e in estimator.pose_graph_edges
            if e.id_i in slot_of and e.id_j in slot_of
        )
        R = _pow2_at_least(max(n_rel, 1), 64)

        prob = WindowProblem.empty(
            S, L, O, len(self.cameras), estimator.cfg.imu_seg_capacity,
            num_rel=R,
        )
        prob = jax.tree_util.tree_map(np.asarray, prob)
        pose = np.array(prob.pose)
        sb = np.array(prob.speed_bias)
        smask = np.zeros(S, bool)
        for s, i in slot_of.items():
            rec = estimator.states[s]
            pose[i] = rec.pose
            sb[i] = rec.speed_bias
            smask[i] = True

        lms = np.array(prob.landmarks)
        lmask = np.zeros(L, bool)
        for lid, i in lm_slot.items():
            lms[i] = estimator.landmarks[lid].hp_W
            lmask[i] = True

        o_state = np.zeros(O, np.int32)
        o_cam = np.zeros(O, np.int32)
        o_lm = np.zeros(O, np.int32)
        o_uv = np.zeros((O, 2))
        o_w = np.ones(O)
        o_mask = np.zeros(O, bool)
        o_state[:n_obs] = o_state_v
        o_cam[:n_obs] = o_cam_v
        o_lm[:n_obs] = o_lm_v
        o_uv[:n_obs] = o_uv_v
        o_w[:n_obs] = o_w_v
        o_mask[:n_obs] = True

        # IMU links between consecutive packed states where buffers chain
        imu_pre = jax.tree_util.tree_map(np.array, prob.imu_pre)
        imu_mask = np.zeros(S - 1, bool)
        imu_i = np.arange(S - 1, dtype=np.int32)
        imu_j = np.arange(1, S, dtype=np.int32)
        for i in range(len(ids) - 1):
            nxt = estimator.states[ids[i + 1]]
            # the buffer on ids[i+1] spans from state nxt.imu_from; only
            # build a factor when that is exactly ids[i] (a factor over a
            # different span would double-count the IMU integrals)
            if len(nxt.imu_dt) and nxt.imu_from == ids[i]:
                pre = estimator._get_preintegrated(ids[i + 1])
                imu_pre = jax.tree_util.tree_map(
                    lambda full, one: _set_row(full, i, one), imu_pre, pre
                )
                imu_mask[i] = True

        r_i = np.zeros(R, np.int32)
        r_j = np.zeros(R, np.int32)
        r_T = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (R, 1))
        r_sq = np.zeros((R, 6, 6))
        r_m = np.zeros(R, bool)
        k = 0
        for e in estimator.pose_graph_edges:
            if e.id_i in slot_of and e.id_j in slot_of and k < R:
                r_i[k] = slot_of[e.id_i]
                r_j[k] = slot_of[e.id_j]
                r_T[k] = e.T_ij
                r_sq[k] = e.sqrt_info
                r_m[k] = True
                k += 1

        # gauge: prior on the oldest packed state
        pp_T = np.array(prob.pose_prior)
        pp_sq = np.zeros((S, 6, 6))
        pp_m = np.zeros(S, bool)
        pp_T[0] = pose[0]
        pp_sq[0] = np.eye(6) * 1e4
        pp_m[0] = True

        prob = dataclasses.replace(
            prob,
            pose=pose,
            speed_bias=sb,
            extrinsics=np.stack(estimator.T_SC),
            landmarks=lms,
            state_mask=smask,
            lm_mask=lmask,
            obs_state=o_state,
            obs_cam=o_cam,
            obs_lm=o_lm,
            obs_uv=o_uv,
            obs_sqrt_info=o_w,
            obs_mask=o_mask,
            imu_pre=imu_pre,
            imu_i=imu_i,
            imu_j=imu_j,
            imu_mask=imu_mask,
            pose_prior=pp_T,
            pose_prior_sqrt=pp_sq,
            pose_prior_mask=pp_m,
            rel_i=r_i,
            rel_j=r_j,
            rel_T=r_T,
            rel_sqrt=r_sq,
            rel_mask=r_m,
        )
        prob = jax.tree_util.tree_map(jnp.asarray, prob)
        # used-vs-capacity counts for the growth-step prewarm (host
        # values: reading the device masks back would cost RPCs)
        self._last_pack_counts = (len(ids), len(lm_ids), n_obs, n_rel)
        return prob, ids, slot_of, lm_ids

    def optimise_full_graph(self, estimator: Estimator):
        """Synchronous full-graph solve: dispatch + apply immediately
        (tests / offline use; the live loop prefers dispatch + lagged
        apply, matching the reference's background thread —
        ViSlamBackend.cpp:1726-1757)."""
        self.dispatch_full_graph(estimator)
        return self.apply_pending_full_graph(estimator)

    def dispatch_full_graph(self, estimator: Estimator) -> None:
        """Dispatch the full-graph solve WITHOUT blocking: the solved
        states/landmarks concatenate into one flat device array whose
        host copy starts immediately; `apply_pending_full_graph` (next
        frame) integrates it. This keeps the loop-closure frame from
        stalling on the solve + readback the way the reference keeps it
        off the camera thread (optimiseFullGraph background thread)."""
        prob, ids, slot_of, lm_ids = self.pack_full_problem(estimator)
        solved, stats = solve_window(
            prob, self.cameras, estimator.imu_params,
            SolverConfig(max_iterations=self.cfg.full_graph_iterations),
        )
        out = _concat_fg_solved(
            solved.pose, solved.speed_bias, solved.landmarks,
            stats["initial_cost"], stats["final_cost"],
        )
        try:
            out.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        self._pending_fg = {
            "out": out, "ids": ids, "slot_of": slot_of,
            "lm_ids": lm_ids, "S": int(prob.pose.shape[0]),
            "L": int(prob.landmarks.shape[0]), "newest": ids[-1],
        }
        # pre-warm the NEXT pow2 problem shape in the background once
        # ANY capacity dimension is nearly full (each of S/L/O/R grows
        # independently and any growth is a fresh XLA compile), so the
        # growth step never pays a foreground (remote) compile stall
        caps = (
            prob.pose.shape[0], prob.landmarks.shape[0],
            prob.obs_mask.shape[0], prob.rel_mask.shape[0],
        )
        used = self._last_pack_counts
        nxt = tuple(
            2 * c if u > 0.75 * c else c for u, c in zip(used, caps)
        )
        if nxt != caps:
            self.prewarm_shapes_async(estimator, *nxt)

    def apply_pending_full_graph(self, estimator: Estimator):
        """Integrate a dispatched full-graph solve. States that joined
        the estimator AFTER the dispatch are rigidly re-anchored by the
        newest solved state's correction (the role of
        synchroniseRealtimeAndFullGraph's T_Wnew_Wold re-anchoring,
        ViSlamBackend.cpp:1411-1650). Returns stats or None."""
        p = getattr(self, "_pending_fg", None)
        if p is None:
            return None
        self._pending_fg = None
        out = np.asarray(p["out"])
        S, L = p["S"], p["L"]
        o = 0
        pose = out[o:o + S * 7].reshape(S, 7); o += S * 7
        sb = out[o:o + S * 9].reshape(S, 9); o += S * 9
        lms_solved = out[o:o + L * 4].reshape(L, 4); o += L * 4
        stats = {"initial_cost": out[o], "final_cost": out[o + 1]}
        ids = [s for s in p["ids"] if s in estimator.states]
        if not ids:
            return stats
        slot_of = p["slot_of"]
        newest = p["newest"]
        old_poses = {s: estimator.states[s].pose.copy() for s in ids}
        T_cur_newest = (
            estimator.states[newest].pose.copy()
            if newest in estimator.states else None
        )
        for s, i in slot_of.items():
            rec = estimator.states.get(s)
            if rec is not None:
                rec.pose = np.asarray(pose[i], np.float64)
                rec.speed_bias = np.asarray(sb[i], np.float64)
        # rigid re-anchor of states added since the dispatch
        if T_cur_newest is not None:
            T_corr = se3_np.compose7(
                estimator.states[newest].pose,
                se3_np.inverse7(T_cur_newest),
            )
            if (np.linalg.norm(T_corr[:3]) > 1e-12
                    or abs(T_corr[6] - 1.0) > 1e-12):
                R = se3_np.quat_to_mat(T_corr[3:7])
                for s in estimator.state_order:
                    if s > newest and s in estimator.states:
                        rec = estimator.states[s]
                        rec.pose = se3_np.compose7(T_corr, rec.pose)
                        rec.speed_bias = rec.speed_bias.copy()
                        rec.speed_bias[:3] = R @ rec.speed_bias[:3]
        # solved landmarks come straight back; landmarks NOT in the solve
        # follow their anchor keyframe rigidly
        solved_set = set(p["lm_ids"])
        for i, lid in enumerate(p["lm_ids"]):
            if lid in estimator.landmarks:
                estimator.landmarks[lid].hp_W = np.asarray(
                    lms_solved[i], np.float64
                )
        idset = set(ids)
        rest_anchor = []
        for lid, lm in estimator.landmarks.items():
            if lid in solved_set:
                continue
            for (s, _ci, _kp) in lm.obs:
                if s in idset:
                    rest_anchor.append((lid, s))
                    break
        deltas = {}
        for lid, a in rest_anchor:
            if a not in deltas:
                deltas[a] = se3_np.compose7(
                    estimator.states[a].pose, se3_np.inverse7(old_poses[a])
                )
            d = deltas[a]
            lm = estimator.landmarks[lid]
            hp = lm.hp_W
            p3 = se3_np.quat_to_mat(d[3:7]) @ hp[:3] + d[:3] * hp[3]
            lm.hp_W = np.concatenate([p3, hp[3:4]])
        estimator._pre_cache.clear()
        return stats

    def prewarm_shapes_async(self, estimator: Estimator,
                             S: int, L: int, O: int, R: int):
        """Compile (and once-run) the full-graph solve at a given shape
        in a BACKGROUND thread — XLA compilation releases the GIL, so
        the frame loop keeps running while the growth-step program
        builds (over the remote-helper compiler a foreground compile is
        a multi-second stall)."""
        import threading

        key = (S, L, O, R)
        warmed = getattr(self, "_warmed_shapes", None)
        if warmed is None:
            warmed = set()
            self._warmed_shapes = warmed
        if key in warmed:
            return
        warmed.add(key)
        cams = self.cameras
        imu_params = estimator.imu_params
        imu_cap = estimator.cfg.imu_seg_capacity
        cfg = SolverConfig(max_iterations=self.cfg.full_graph_iterations)

        def work():
            try:
                prob = WindowProblem.empty(
                    S, L, O, len(cams), imu_cap, num_rel=R
                )
                solved, _stats = solve_window(prob, cams, imu_params, cfg)
                jax.block_until_ready(solved.pose)
            except Exception:
                pass  # prewarm is best-effort

        threading.Thread(target=work, daemon=True).start()

    def predicted_full_graph_shape(self, estimator: Estimator):
        """Cheap host-side prediction of the pow2 capacities
        `pack_full_problem` would pick RIGHT NOW, without packing:
        upper-bounds each count (states eligible for the pack,
        initialised landmarks with >=2 observations, their total
        observation rows, pose-graph edges) and rounds up the same way
        the pack does. Used to keep the full-graph program compiled
        AHEAD of the first loop closure — the init-time prewarm shape
        (32,64,256,64) is far below a few-hundred-frame session's real
        shape, and a cold (remote-helper) compile at dispatch time is a
        ~80 s foreground stall on the loop-closure frame (measured r4,
        textured drive frame 293)."""
        cfg = self.cfg
        n_s = sum(
            1 for s in estimator.state_order
            if s in estimator.states
            and (estimator.states[s].is_keyframe
                 or estimator.states[s].is_pose_graph_frame
                 or s in estimator.window)
        )
        n_lm = n_obs = 0
        for lm in estimator.landmarks.values():
            if not lm.initialised or len(lm.obs) < 2:
                continue
            n_lm += 1
            n_obs += len(lm.obs)
            if n_lm >= cfg.max_reactivated_landmarks:
                break
        n_obs = min(n_obs, cfg.max_reactivated_obs)
        n_rel = len(estimator.pose_graph_edges)
        return (
            _pow2_at_least(max(n_s, 1), 32),
            _pow2_at_least(max(n_lm, 1), 64),
            _pow2_at_least(max(n_obs, 1), 256),
            _pow2_at_least(max(n_rel, 1), 64),
        ), (n_s, n_lm, n_obs, n_rel)

    def prewarm_predicted(self, estimator: Estimator) -> None:
        """Background-compile the full-graph solve at the CURRENT
        predicted shape, plus the grown shape for any dimension past
        75% of its capacity (the graph keeps growing between this
        keyframe and whenever the loop closure actually fires). Each
        distinct shape compiles once (`_warmed_shapes` dedup), so a
        whole session pays only log-many background compiles."""
        caps, used = self.predicted_full_graph_shape(estimator)
        self.prewarm_shapes_async(estimator, *caps)
        grown = tuple(
            2 * c if u > 0.75 * c else c for u, c in zip(used, caps)
        )
        if grown != caps:
            self.prewarm_shapes_async(estimator, *grown)


def _set_row(full: np.ndarray, i: int, one) -> np.ndarray:
    full = np.array(full)
    full[i] = np.asarray(one)
    return full


@jax.jit
def _concat_fg_solved(pose, sb, lms, initial_cost, final_cost):
    """One flat array for the full-graph solve's results so the lagged
    readback is a single transfer (the tunnel serialises RPCs)."""
    d = pose.dtype
    return jnp.concatenate([
        pose.ravel(), sb.ravel(), lms.ravel(),
        jnp.stack([initial_cost.astype(d), final_cost.astype(d)]),
    ])
