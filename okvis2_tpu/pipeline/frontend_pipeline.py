"""Frontend orchestration: detection -> association -> initialisation.

Re-designs okvis::Frontend (reference: okvis_frontend/src/Frontend.cpp,
especially detectAndDescribe :221-269 and
dataAssociationAndInitialization :558-1015) around batched device calls:

- detection/description for ALL cameras is one batched device program
  (vs. the reference's thread-per-camera, ThreadedSlam.cpp:360-384);
- match-to-map is one gated Hamming matmul against the window landmarks'
  descriptors (vs. multithreaded descriptor loops, Frontend.cpp:1171-1719);
- static-stereo initialisation matches cam0<->cam1 with an epipolar gate
  and triangulates all candidates in one vmapped call
  (vs. matchStereo + per-candidate triangulateFast, Frontend.cpp:1981-2150);
- 3D-2D RANSAC is the batched-hypothesis version (frontend/ransac.py).

Keyframe selection uses the matched-vs-detected spatial coverage heuristic
(doWeNeedANewKeyframe, Frontend.cpp:1057-1167) computed on a grid.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.frontend.descriptor import describe_keypoints
from okvis2_tpu.frontend.detection import (
    DetectionConfig,
    detect_keypoints,
    detect_keypoints_batch,
)
from okvis2_tpu.frontend.matching import match_descriptors
from okvis2_tpu.frontend.ransac import ransac_absolute_pose
from okvis2_tpu.frontend.triangulation import triangulate_in_frames
from okvis2_tpu.graph.estimator import Estimator


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    detection: DetectionConfig = DetectionConfig()
    matching_threshold: int = 60  # Hamming (config/euroc.yaml:65)
    map_match_radius: float = 40.0  # px gate around predicted projection
    map_match_capacity: int = 1024  # fixed landmark-slot count per match call
    stereo_epipolar_gate: float = 3.0  # px distance to epipolar line
    keyframe_overlap_threshold: float = 0.6  # euroc.yaml:68
    keyframe_grid: int = 8  # coverage grid (grid cells per axis)
    ransac_min_inliers: int = 10
    use_ransac: bool = True
    min_depth: float = 0.1
    max_depth: float = 60.0


@functools.partial(jax.jit, static_argnames=("max_distance",))
def _match_map_device(
    cam,
    T_WC7: jnp.ndarray,  # [7] camera pose in world
    hp: jnp.ndarray,  # [Lc,4] landmark homogeneous points
    lm_mask: jnp.ndarray,  # [Lc]
    lm_signs: jnp.ndarray,  # [Lc,B]
    kp_xy: jnp.ndarray,  # [N,2]
    kp_mask: jnp.ndarray,  # [N]
    kp_signs: jnp.ndarray,  # [N,B]
    radius: jnp.ndarray,
    max_distance: int,
):
    """One-dispatch map matching for one camera: project landmarks,
    gate by image radius, Hamming-match (matchToMap device part)."""
    T_CW = Transformation(r=T_WC7[:3], q=T_WC7[3:7]).inverse()
    hp_C = jax.vmap(T_CW.apply_homogeneous)(hp)
    uv_pred, valid = cam.project_homogeneous(hp_C)
    valid = valid & lm_mask
    d2 = jnp.sum(
        (uv_pred[:, None, :] - kp_xy[None, :, :]) ** 2, axis=-1
    )
    gate = (d2 < radius * radius) & valid[:, None] & kp_mask[None, :]
    m = match_descriptors(
        lm_signs, valid, kp_signs, kp_mask,
        max_distance=max_distance, gate=gate,
    )
    return m["idx_b"], m["valid"]


@functools.partial(
    jax.jit, static_argnames=("max_distance", "allow_parallel")
)
def _stereo_device(
    cam_a,
    cam_b,
    T_WA7: jnp.ndarray,  # [7] camera-A pose in world
    T_WB7: jnp.ndarray,  # [7] camera-B pose in world
    xy_a: jnp.ndarray,
    signs_a: jnp.ndarray,
    free_a: jnp.ndarray,
    xy_b: jnp.ndarray,
    signs_b: jnp.ndarray,
    free_b: jnp.ndarray,
    epi_gate: jnp.ndarray,
    min_depth: jnp.ndarray,
    max_depth: jnp.ndarray,
    max_distance: int,
    allow_parallel: bool,
):
    """One-dispatch epipolar-gated matching + triangulation between two
    camera views (shared by static stereo and motion stereo). Returns
    (idx_b [N], hp_W [N,4], good [N], parallel [N])."""
    T_WA = Transformation(r=T_WA7[:3], q=T_WA7[3:7])
    T_WB = Transformation(r=T_WB7[:3], q=T_WB7[3:7])
    rays_a = cam_a.back_project(xy_a)
    rays_b = cam_b.back_project(xy_b)
    T_AB = T_WA.inverse() @ T_WB
    rays_b_in_a = (T_AB.C @ rays_b.T).T
    n_plane = jnp.cross(jnp.broadcast_to(T_AB.r, rays_a.shape), rays_a)
    n_plane = n_plane / (
        jnp.linalg.norm(n_plane, axis=-1, keepdims=True) + 1e-12
    )
    epi = jnp.abs(jnp.einsum("nk,mk->nm", n_plane, rays_b_in_a))
    gate = epi < epi_gate
    m = match_descriptors(
        signs_a, free_a, signs_b, free_b,
        max_distance=max_distance, gate=gate,
    )
    bi_full = jnp.where(m["valid"], m["idx_b"], 0)
    hp_W, valid_t, parallel = triangulate_in_frames(
        T_WA, T_WB, rays_a, rays_b[bi_full]
    )
    p_A = jax.vmap(T_WA.inverse().apply_homogeneous)(hp_W)
    safe_w = jnp.where(p_A[:, 3] != 0, p_A[:, 3], 1e-12)
    depth = p_A[:, 2] / safe_w
    depth_ok = (depth > min_depth) & (depth < max_depth)
    good = m["valid"] & valid_t & (
        (parallel & allow_parallel) | (~parallel & depth_ok)
    )
    return m["idx_b"], hp_W, good, parallel


class Frontend:
    def __init__(self, cameras, extrinsics: List[Transformation],
                 config: FrontendConfig = FrontendConfig()):
        self.cameras = tuple(cameras)
        self.extrinsics = list(extrinsics)
        self.cfg = config
        # landmark id -> latest descriptor signs (numpy [512])
        self.lm_descriptors: Dict[int, np.ndarray] = {}
        self._key = jax.random.PRNGKey(42)
        self.last_keyframe_id: Optional[int] = None

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def detect_and_describe(self, images: List[np.ndarray]):
        """Whole-rig detection+description: one batched device call when
        all cameras share a resolution (the common case), per-camera
        calls otherwise. Returns list of dicts per camera.
        """
        shapes = {img.shape for img in images}
        if len(shapes) == 1:
            stack = jnp.asarray(np.stack(images))
            det = detect_keypoints_batch(stack, self.cfg.detection)
            desc = jax.vmap(describe_keypoints)(
                stack, det["xy"], det["size"], det["mask"]
            )
            signs_np = np.asarray(desc["signs"])  # one bulk transfer
            return [
                {
                    "xy": np.asarray(det["xy"][ci]),
                    "size": np.asarray(det["size"][ci]),
                    "score": np.asarray(det["score"][ci]),
                    "mask": np.asarray(det["mask"][ci]),
                    "signs": desc["signs"][ci],  # device-resident
                    "signs_np": signs_np[ci],  # host copy for bookkeeping
                    "packed": np.asarray(desc["packed"][ci]),
                }
                for ci in range(len(images))
            ]
        out = []
        for ci, img in enumerate(images):
            imgj = jnp.asarray(img)
            det = detect_keypoints(imgj, self.cfg.detection)
            desc = describe_keypoints(
                imgj, det["xy"], det["size"], det["mask"]
            )
            out.append(
                {
                    "xy": np.asarray(det["xy"]),
                    "size": np.asarray(det["size"]),
                    "score": np.asarray(det["score"]),
                    "mask": np.asarray(det["mask"]),
                    "signs": desc["signs"],  # keep on device for matmuls
                    "signs_np": np.asarray(desc["signs"]),
                    "packed": np.asarray(desc["packed"]),
                }
            )
        return out

    # ------------------------------------------------------------------
    def match_to_map(
        self,
        estimator: Estimator,
        frames,  # output of detect_and_describe
        sid: int,
        T_WS_pred: Transformation,
    ) -> dict:
        """Project window landmarks into the predicted frame, gate by
        image distance, Hamming-match, insert observations.

        Reference: matchToMap (Frontend.cpp:1171-1719).
        """
        cfg = self.cfg
        # collect landmarks with descriptors, newest-observed first, up to
        # the fixed matching capacity
        lm_ids = [
            lid
            for lid, lm in estimator.landmarks.items()
            if lid in self.lm_descriptors
            and (lm.initialised or len(lm.obs) >= 1)
        ][-cfg.map_match_capacity:]
        n_matched_total = 0
        matched_kp: Dict[int, np.ndarray] = {}
        if lm_ids:
            Lc = cfg.map_match_capacity
            hp = np.zeros((Lc, 4))
            hp[:, 3] = 1.0
            hp[: len(lm_ids)] = np.stack(
                [estimator.landmarks[l].hp_W for l in lm_ids]
            )
            lm_mask = np.zeros(Lc, bool)
            lm_mask[: len(lm_ids)] = True
            sg = np.zeros(
                (Lc,) + self.lm_descriptors[lm_ids[0]].shape, np.float32
            )
            sg[: len(lm_ids)] = np.stack(
                [self.lm_descriptors[l] for l in lm_ids]
            )
            hp_j = jnp.asarray(hp)
            lm_signs = jnp.asarray(sg)
            lm_mask_j = jnp.asarray(lm_mask)
            for ci, cam in enumerate(self.cameras):
                T_WC = T_WS_pred @ self.extrinsics[ci]
                T_WC7 = jnp.concatenate([T_WC.r, T_WC.q])
                fr = frames[ci]
                idx_b, ok = _match_map_device(
                    cam, T_WC7, hp_j, lm_mask_j,
                    lm_signs.astype(fr["signs"].dtype),
                    jnp.asarray(fr["xy"]), jnp.asarray(fr["mask"]),
                    fr["signs"],
                    jnp.asarray(cfg.map_match_radius, fr["signs"].dtype),
                    cfg.matching_threshold,
                )
                idx_b = np.asarray(idx_b)
                ok = np.asarray(ok)
                for li in np.nonzero(ok)[0]:
                    kp = int(idx_b[li])
                    lid = lm_ids[li]
                    estimator.add_observation(
                        lid, sid, ci, kp,
                        frames[ci]["xy"][kp], frames[ci]["size"][kp],
                    )
                    # refresh the landmark's descriptor with latest view
                    self.lm_descriptors[lid] = frames[ci]["signs_np"][kp]
                    matched_kp.setdefault(ci, []).append(kp)
                    n_matched_total += 1

        return {"num_matched": n_matched_total, "matched_kp": matched_kp}

    # ------------------------------------------------------------------
    def ransac_3d2d(self, estimator: Estimator, sid: int, frames,
                    T_WS_pred: Transformation):
        """Remove obviously-wrong associations with absolute-pose RANSAC
        (runRansac3d2d, Frontend.cpp:2208-2278). Operates per camera on
        this frame's observations of initialised landmarks."""
        cfg = self.cfg
        removed = 0
        for ci, cam in enumerate(self.cameras):
            obs = []
            for lid, lm in estimator.landmarks.items():
                for (s, c, kp), (u, v, size) in lm.obs.items():
                    if s == sid and c == ci and lm.initialised:
                        obs.append((lid, kp, u, v))
            if len(obs) < max(cfg.ransac_min_inliers, 8):
                continue
            # fixed-capacity padding: variable correspondence counts would
            # recompile the RANSAC program every frame
            cap = cfg.detection.max_keypoints
            obs = obs[:cap]
            n = len(obs)
            pts = np.zeros((cap, 3))
            pts[:n] = np.stack([
                estimator.landmarks[lid].hp_W[:3]
                / max(estimator.landmarks[lid].hp_W[3], 1e-12)
                for lid, _, _, _ in obs
            ])
            uv = np.zeros((cap, 2))
            uv[:n] = np.stack([[u, v] for _, _, u, v in obs])
            mask = np.zeros(cap, bool)
            mask[:n] = True
            rays = np.asarray(cam.back_project(jnp.asarray(uv)))
            res = ransac_absolute_pose(
                self._next_key(),
                jnp.asarray(pts),
                jnp.asarray(rays),
                jnp.asarray(mask),
            )
            if not bool(res["ok"]):
                continue
            inl = np.asarray(res["inliers"])
            for i, (lid, kp, _, _) in enumerate(obs):
                if not inl[i]:
                    estimator.remove_observation(lid, sid, ci, kp)
                    removed += 1
        return removed

    # ------------------------------------------------------------------
    def match_stereo(self, estimator: Estimator, frames, sid: int):
        """Static-stereo initialisation of new landmarks between
        overlapping camera pairs (matchStereo, Frontend.cpp:1981-2150)."""
        cfg = self.cfg
        if len(self.cameras) < 2:
            return 0
        rec = estimator.states[sid]
        T_WS = Transformation(
            r=jnp.asarray(rec.pose[:3]), q=jnp.asarray(rec.pose[3:7])
        )
        n_new = 0
        used = {
            (c, kp)
            for lm in estimator.landmarks.values()
            for (s, c, kp) in lm.obs
            if s == sid
        }
        ci, cj = 0, 1
        fa, fb = frames[ci], frames[cj]
        # don't re-use keypoints already matched to the map
        free_a = np.asarray(fa["mask"]).copy()
        for (c, kp) in used:
            if c == ci:
                free_a[kp] = False
        free_b = np.asarray(fb["mask"]).copy()
        for (c, kp) in used:
            if c == cj:
                free_b[kp] = False

        T_WA = T_WS @ self.extrinsics[ci]
        T_WB = T_WS @ self.extrinsics[cj]
        idx_b, hp_W, good, parallel = _stereo_device(
            self.cameras[ci], self.cameras[cj],
            jnp.concatenate([T_WA.r, T_WA.q]),
            jnp.concatenate([T_WB.r, T_WB.q]),
            jnp.asarray(fa["xy"]), fa["signs"], jnp.asarray(free_a),
            jnp.asarray(fb["xy"]), fb["signs"], jnp.asarray(free_b),
            jnp.asarray(cfg.stereo_epipolar_gate / 460.0),
            jnp.asarray(cfg.min_depth), jnp.asarray(cfg.max_depth),
            cfg.matching_threshold, True,
        )
        hp_W = np.asarray(hp_W)
        good = np.asarray(good)
        parallel = np.asarray(parallel)
        idx_b = np.asarray(idx_b)
        for a in np.nonzero(good)[0]:
            a = int(a)
            b = int(idx_b[a])
            lid = estimator.add_landmark(hp_W[a], initialised=not parallel[a])
            estimator.add_observation(
                lid, sid, ci, a, fa["xy"][a], fa["size"][a]
            )
            estimator.add_observation(
                lid, sid, cj, b, fb["xy"][b], fb["size"][b]
            )
            self.lm_descriptors[lid] = fa["signs_np"][a]
            n_new += 1
        return n_new

    # ------------------------------------------------------------------
    def match_motion_stereo(self, estimator: Estimator, frames, sid: int):
        """Temporal landmark initialisation against the last keyframe
        (matchMotionStereo, Frontend.cpp:1733-1978): match this frame's
        still-unmatched keypoints to the last keyframe's stored frame
        data per camera, epipolar-gate with the current pose estimates,
        and triangulate over the temporal baseline."""
        cfg = self.cfg
        kf_id = self.last_keyframe_id
        if kf_id is None or kf_id == sid:
            return 0
        kf_frames = getattr(self, "_kf_frames", None)
        if kf_frames is None or self._kf_frames_id != kf_id:
            return 0
        rec_new = estimator.states[sid]
        rec_kf = estimator.states[kf_id]
        T_WS_new = Transformation(
            r=jnp.asarray(rec_new.pose[:3]), q=jnp.asarray(rec_new.pose[3:7])
        )
        T_WS_kf = Transformation(
            r=jnp.asarray(rec_kf.pose[:3]), q=jnp.asarray(rec_kf.pose[3:7])
        )
        used_new = {
            (c, kp)
            for lm in estimator.landmarks.values()
            for (s, c, kp) in lm.obs
            if s == sid
        }
        used_kf = {
            (c, kp)
            for lm in estimator.landmarks.values()
            for (s, c, kp) in lm.obs
            if s == kf_id
        }
        n_new = 0
        for ci, cam in enumerate(self.cameras):
            fa = kf_frames[ci]
            fb = frames[ci]
            T_WA = T_WS_kf @ self.extrinsics[ci]
            T_WB = T_WS_new @ self.extrinsics[ci]
            T_AB = T_WA.inverse() @ T_WB
            baseline = float(jnp.linalg.norm(T_AB.r))
            if baseline < 0.02:  # no parallax yet
                continue
            free_a = np.asarray(fa["mask"]).copy()
            for (c, kp) in used_kf:
                if c == ci and kp < len(free_a):
                    free_a[kp] = False
            free_b = np.asarray(fb["mask"]).copy()
            for (c, kp) in used_new:
                if c == ci and kp < len(free_b):
                    free_b[kp] = False
            idx_b, hp_W, good, parallel = _stereo_device(
                cam, cam,
                jnp.concatenate([T_WA.r, T_WA.q]),
                jnp.concatenate([T_WB.r, T_WB.q]),
                jnp.asarray(fa["xy"]), fa["signs"], jnp.asarray(free_a),
                jnp.asarray(fb["xy"]), fb["signs"], jnp.asarray(free_b),
                jnp.asarray(cfg.stereo_epipolar_gate / 460.0),
                jnp.asarray(cfg.min_depth), jnp.asarray(cfg.max_depth),
                cfg.matching_threshold, False,
            )
            hp_W = np.asarray(hp_W)
            good = np.asarray(good)
            idx_b = np.asarray(idx_b)
            for a in np.nonzero(good)[0]:
                a = int(a)
                b = int(idx_b[a])
                lid = estimator.add_landmark(hp_W[a], initialised=True)
                estimator.add_observation(
                    lid, kf_id, ci, a, fa["xy"][a], fa["size"][a]
                )
                estimator.add_observation(
                    lid, sid, ci, b, fb["xy"][b], fb["size"][b]
                )
                self.lm_descriptors[lid] = fb["signs_np"][b]
                n_new += 1
        return n_new

    def remember_keyframe_frames(self, sid: int, frames):
        """Store a keyframe's detection output for motion-stereo matching."""
        self._kf_frames = frames
        self._kf_frames_id = sid

    # ------------------------------------------------------------------
    def need_new_keyframe(self, estimator: Estimator, frames, sid: int) -> bool:
        """Grid-coverage keyframe heuristic (doWeNeedANewKeyframe,
        Frontend.cpp:1057-1167: matched-area / detected-area overlap)."""
        cfg = self.cfg
        if self.last_keyframe_id is None:
            return True
        g = cfg.keyframe_grid
        covered_m = set()
        covered_d = set()
        for ci, fr in enumerate(frames):
            W, H = self.cameras[ci].width, self.cameras[ci].height
            mask = fr["mask"]
            matched = set()
            for lm in estimator.landmarks.values():
                for (s, c, kp) in lm.obs:
                    if s == sid and c == ci:
                        matched.add(kp)
            for kp in np.nonzero(mask)[0]:
                x, y = fr["xy"][kp]
                cell = (ci, int(x * g / W), int(y * g / H))
                covered_d.add(cell)
                if int(kp) in matched:
                    covered_m.add(cell)
        if not covered_d:
            return False
        overlap = len(covered_m) / len(covered_d)
        return overlap < cfg.keyframe_overlap_threshold

    # ------------------------------------------------------------------
    def tracking_quality(self, estimator: Estimator, frames, sid: int) -> float:
        """Fraction of detection-covered cells with matches (trackingQuality
        analogue, ViSlamBackend.cpp:157-197)."""
        g = self.cfg.keyframe_grid
        total = 0
        matched_cells = set()
        for ci, fr in enumerate(frames):
            W, H = self.cameras[ci].width, self.cameras[ci].height
            matched = set()
            for lm in estimator.landmarks.values():
                for (s, c, kp) in lm.obs:
                    if s == sid and c == ci:
                        matched.add(kp)
            for kp in matched:
                x, y = fr["xy"][kp]
                matched_cells.add((ci, int(x * g / W), int(y * g / H)))
            total += g * g
        return len(matched_cells) / max(total, 1)
