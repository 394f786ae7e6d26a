"""Frontend orchestration: detection -> association -> initialisation.

Re-designs okvis::Frontend (reference: okvis_frontend/src/Frontend.cpp,
especially detectAndDescribe :221-269 and
dataAssociationAndInitialization :558-1015) around batched device calls:

- detection/description for ALL cameras is one batched device program
  (vs the reference's thread-per-camera, ThreadedSlam.cpp:360-384);
- the landmark descriptor map is DEVICE-RESIDENT with <= 3 descriptors
  per landmark (Frontend.cpp:1224-1359 keeps the 3 most recent distinct
  descriptors) — only per-frame deltas are uploaded;
- match-to-map + rig absolute-pose RANSAC run fused in ONE device
  program per frame (`_associate_device`): project landmarks into every
  camera, gate, Hamming-match on the MXU, P3P-RANSAC over the joint rig
  correspondences (Frontend.cpp:1171-1719 matchToMap + :2208-2278
  runRansac3d2d), returning only the small match/inlier tables;
- static-stereo / motion-stereo initialisation matches with an epipolar
  gate and triangulates all candidates in one call per pair
  (matchStereo :1981-2150, matchMotionStereo :1733-1978);
- all host-side pose math is numpy (core/se3_np) — an eager device op
  costs a tunnel roundtrip.

Keyframe selection uses the matched-vs-detected spatial coverage
heuristic (doWeNeedANewKeyframe, Frontend.cpp:1057-1167) on a grid.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.core import se3_np
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.frontend.descriptor import describe_keypoints
from okvis2_tpu.frontend.detection import (
    DetectionConfig,
    detect_keypoints,
    detect_keypoints_batch,
)
from okvis2_tpu.frontend.matching import hamming_distance_matrix, match_descriptors
from okvis2_tpu.frontend.p3p import ransac_rig_pose_impl
from okvis2_tpu.frontend.ransac import ransac_absolute_pose
from okvis2_tpu.frontend.triangulation import triangulate_in_frames
from okvis2_tpu.graph.estimator import Estimator, _warn_capacity


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    detection: DetectionConfig = DetectionConfig()
    matching_threshold: int = 60  # Hamming (config/euroc.yaml:65)
    map_match_radius: float = 40.0  # px gate around predicted projection
    # fixed landmark-slot count per match call; a full table LRU-evicts
    # (see DeviceLandmarkTable). 2048 keeps roughly the current + one
    # previous lap of a 10 Hz drive matchable, so revisits re-match old
    # landmarks instead of spawning duplicates
    map_match_capacity: int = 2048
    n_desc_per_lm: int = 3  # <=3 best descriptors (Frontend.cpp:1224-1359)
    stereo_epipolar_gate: float = 3.0  # px distance to epipolar line
    keyframe_overlap_threshold: float = 0.6  # euroc.yaml:68
    # reference's second keyframe criterion: matched/detected keypoint
    # RATIO (doWeNeedANewKeyframe, Frontend.cpp:1057-1167)
    keyframe_matching_ratio: float = 0.2
    keyframe_grid: int = 8  # coverage grid (grid cells per axis)
    ransac_min_inliers: int = 10
    ransac_hypotheses: int = 128
    ransac_threshold_deg: float = 0.6  # ~4px at f=460 (thresh 16 px^2)
    use_ransac: bool = True
    # rotation-only 2D-2D model check on motion-stereo matches: if a
    # pure rotation explains this fraction of the keyframe<->current
    # matches, the apparent parallax is illusory and no landmarks are
    # triangulated (runRansac2d2d rotation-only, Frontend.cpp:2311-2334)
    rotation_only_veto: float = 0.95
    # motion stereo matches the current frame against the TOP-K window
    # keyframes ranked by view overlap, not just the last one (the
    # reference ranks ALL window keyframes by overlapFraction and
    # matches each, Frontend.cpp:1742-1768); fixed K keeps the fused
    # program's shapes static
    motion_stereo_keyframes: int = 3
    # BRISK-2 gravity-aligned extraction direction (Frontend.cpp:231-251)
    gravity_aligned_description: bool = False
    min_depth: float = 0.1
    max_depth: float = 60.0
    # frame-to-frame matching: current keypoints are matched against the
    # PREVIOUS dispatch's device-resident keypoints (rotation-compensated
    # angular gate, degrees) and resolved to that frame's landmarks at
    # finish time. This keeps match recall intact when the pipelined
    # loop dispatches a frame BEFORE the previous frame's bookkeeping
    # has staged its new landmarks into the device matching table (the
    # table is one dispatch stale under lag) — the role of the
    # reference's sequential keyframe-to-frame BRISK matching
    # (Frontend.cpp:1399-1504).
    ff_match_angle_deg: float = 5.0


def _T7(T: Transformation) -> jnp.ndarray:
    return jnp.concatenate([T.r, T.q])


def _min3_gated_match(
    tab_signs: jnp.ndarray,  # [Lc,K,B] ±1 (0 rows invalid)
    tab_valid: jnp.ndarray,  # [Lc,K]
    kp_signs: jnp.ndarray,  # [N,B]
    kp_mask: jnp.ndarray,  # [N]
    gate: jnp.ndarray,  # [Lc,N]
    max_distance: int,
):
    """Mutual-best Hamming match, landmark distance = min over its <=K
    stored descriptors."""
    Lc, K, B = tab_signs.shape
    d_all = hamming_distance_matrix(
        tab_signs.reshape(Lc * K, B), kp_signs
    ).reshape(Lc, K, -1)
    BIG = jnp.asarray(1e9, d_all.dtype)
    d_all = jnp.where(tab_valid[:, :, None], d_all, BIG)
    d = jnp.min(d_all, axis=1)  # [Lc,N]
    lm_has = jnp.any(tab_valid, axis=1)
    m = lm_has[:, None] & kp_mask[None, :] & gate
    d = jnp.where(m, d, BIG)
    best_b = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    best_a_of_b = jnp.argmin(d, axis=0)
    mutual = best_a_of_b[best_b] == jnp.arange(Lc)
    valid = mutual & (best_d <= max_distance) & lm_has
    return jnp.where(valid, best_b, 0).astype(jnp.int32), valid


@functools.partial(
    jax.jit,
    static_argnames=("max_distance", "n_hyp", "min_inliers", "use_ransac"),
)
def _associate_device(
    cameras,
    key,
    T_WS7: jnp.ndarray,  # [7] predicted body pose
    T_SC7: jnp.ndarray,  # [NC,7] extrinsics
    hp: jnp.ndarray,  # [Lc,4] landmark homogeneous points
    lm_mask: jnp.ndarray,  # [Lc]
    lm_init: jnp.ndarray,  # [Lc] initialised (RANSAC-eligible)
    tab_signs: jnp.ndarray,  # [Lc,K,B]
    tab_valid: jnp.ndarray,  # [Lc,K]
    xy: jnp.ndarray,  # [NC,N,2]
    kp_mask: jnp.ndarray,  # [NC,N]
    kp_signs: jnp.ndarray,  # [NC,N,B]
    radius: jnp.ndarray,
    threshold_deg: jnp.ndarray,
    max_distance: int,
    n_hyp: int,
    min_inliers: int,
    use_ransac: bool,
):
    """ONE dispatch for the whole data-association front half:
    project landmarks into every camera, gate by predicted reprojection
    radius, Hamming-match (min over <=K stored descriptors), then
    rig-joint P3P RANSAC over all matches of initialised landmarks.

    Returns (idx [NC,Lc], ok [NC,Lc], inlier [NC,Lc], n_inl, ransac_ok).
    Reference: matchToMap + runRansac3d2d interleave,
    Frontend.cpp:1171-1719, 2208-2278."""
    return _associate_core(
        cameras, key, T_WS7, T_SC7, hp, lm_mask, lm_init,
        tab_signs, tab_valid, xy, kp_mask, kp_signs,
        radius, threshold_deg, max_distance, n_hyp, min_inliers,
        use_ransac,
    )


def _frame_associate_body(
    cameras,
    images: jnp.ndarray,  # [NC,H,W] uint8
    aux: jnp.ndarray,  # [Nf+Ni] f32 flat: float section | int-as-float
    # section (lm_mask | lm_init | kf_free | kf_valid | counter | upd);
    # ints ride the float carrier (< 2^24, exact) so the whole per-frame
    # host state crosses the tunnel as ONE upload RPC
    tab_signs: jnp.ndarray,
    tab_valid: jnp.ndarray,
    prev_signs: jnp.ndarray,  # [NC,N,B] source of staged table updates
    kf_xy: jnp.ndarray,  # [KF,NC,N,2] top-K keyframe stacks (device)
    kf_signs: jnp.ndarray,  # [KF,NC,N,B] (device)
    ff_xy: jnp.ndarray,  # [NC,N,2] previous DISPATCH's keypoints
    ff_signs: jnp.ndarray,  # [NC,N,B] (frame-to-frame continuity)
    ff_mask: jnp.ndarray,  # [NC,N] bool
    extra_flat: jnp.ndarray,  # [K] piggybacked through the readback
    det_cfg,
    max_distance: int,
    n_hyp: int,
    min_inliers: int,
    use_ransac: bool,
    do_motion_stereo: bool,
    do_ff: bool,
    gravity_aligned: bool = False,
):
    """THE per-frame frontend program: detection + description +
    match-to-map + rig P3P-RANSAC + motion stereo, fused into ONE
    dispatch whose host-relevant outputs come back as a single flat
    float array (one readback — each roundtrip over the TPU tunnel
    costs ~60 ms, so the frame loop gets exactly one).

    All small per-frame host inputs arrive as TWO flat buffers (aux_f /
    aux_i) sliced here: every individual host->device upload is its own
    serialised RPC over the tunnel (~5-27 ms each), so the frame pays
    for three uploads (images + aux_f + aux_i), not ~15.

    Returns (diag [D], stacked, match) where stacked holds the
    device-resident detection arrays for later programs (table update,
    static stereo, keyframe storage) and match feeds the Phase-B
    device-side observation append."""
    NC = len(cameras)
    cap = tab_signs.shape[0]
    KF, _, N = kf_xy.shape[0], kf_xy.shape[1], kf_xy.shape[2]
    # ---- decode the flat aux upload (free slicing in XLA) ----
    nf = 7 + 7 + NC * 7 + cap * 4 + KF * 7 + 6
    aux_f = aux[:nf]
    # int section rides the float carrier; values are exact (< 2^24)
    aux_i = jnp.round(aux[nf:]).astype(jnp.int32)
    o = 0
    T_WS7 = aux_f[o:o + 7]; o += 7
    T_WS_prev7 = aux_f[o:o + 7]; o += 7  # previous dispatch's pose
    T_SC7 = aux_f[o:o + NC * 7].reshape(NC, 7); o += NC * 7
    hp = aux_f[o:o + cap * 4].reshape(cap, 4); o += cap * 4
    T_WS_kf7 = aux_f[o:o + KF * 7].reshape(KF, 7); o += KF * 7
    radius = aux_f[o]
    threshold_deg = aux_f[o + 1]
    epi_px = aux_f[o + 2]
    min_depth = aux_f[o + 3]
    max_depth = aux_f[o + 4]
    ff_angle_deg = aux_f[o + 5]
    oi = 0
    lm_mask = aux_i[oi:oi + cap] > 0; oi += cap
    lm_init = aux_i[oi:oi + cap] > 0; oi += cap
    kf_free = (aux_i[oi:oi + KF * NC * N] > 0).reshape(KF, NC, N)
    oi += KF * NC * N
    kf_valid = aux_i[oi:oi + KF] > 0; oi += KF
    # RANSAC randomness derived ON DEVICE from the frame counter — a
    # host-side key split would be one more dispatch on the serialised
    # tunnel every frame
    key = jax.random.fold_in(jax.random.PRNGKey(42), aux_i[oi]); oi += 1
    # descriptor-table updates staged by the PREVIOUS frame's (lagged)
    # bookkeeping fold into this dispatch — the separate flush
    # upload+dispatch pair would be two more serialised RPCs per frame
    upd = aux_i[oi:oi + 4 * _FLUSH_U]
    tab_signs, tab_valid = _table_update_body(
        tab_signs, tab_valid, prev_signs, upd
    )
    if images.dtype == jnp.uint8:
        # images travel the tunnel as uint8 (4x less upload) and widen
        # on device
        images = images.astype(jnp.float32) * (1.0 / 255.0)
    det = detect_keypoints_batch(images, det_cfg)
    if gravity_aligned:
        # BRISK-2 gravity-aligned extraction direction
        # (Frontend.cpp:231-251): per keypoint, the image direction of
        # world gravity under the predicted pose — descriptors become
        # roll-invariant across revisits
        T_WS_g = Transformation(r=T_WS7[:3], q=T_WS7[3:7])
        g_W = jnp.asarray([0.0, 0.0, -1.0], images.dtype)
        g_S = T_WS_g.C.T @ g_W
        angles = []
        for ci, cam in enumerate(cameras):
            T_sc = Transformation(r=T_SC7[ci, :3], q=T_SC7[ci, 3:7])
            g_C = T_sc.C.T @ g_S
            rays = cam.back_project(det["xy"][ci])
            p0 = rays * 2.0
            uv0, _ = cam.project(p0)
            uv1, _ = cam.project(p0 + 0.02 * g_C)
            d = uv1 - uv0
            angles.append(jnp.arctan2(d[:, 1], d[:, 0]))
        ext_dir = jnp.stack(angles)
        desc = jax.vmap(
            lambda im, x, s, m, a: describe_keypoints(
                im, x, s, m, extraction_direction=a
            )
        )(images, det["xy"], det["size"], det["mask"], ext_dir)
    else:
        desc = jax.vmap(describe_keypoints)(
            images, det["xy"], det["size"], det["mask"]
        )
    xy = det["xy"]  # [NC,N,2]
    kp_mask = det["mask"]
    kp_signs = desc["signs"]
    N = xy.shape[1]
    dtype = kp_signs.dtype

    idx, ok, keep, n_inl, ransac_ok = _associate_core(
        cameras, key, T_WS7, T_SC7, hp, lm_mask, lm_init,
        tab_signs, tab_valid, xy, kp_mask, kp_signs,
        radius, threshold_deg, max_distance, n_hyp, min_inliers,
        use_ransac,
    )

    # keypoints matched to the map this frame (per camera)
    Lc = hp.shape[0]
    matched = jnp.zeros((NC, N), bool)
    src = jnp.where(keep, idx, N)  # out-of-range -> dropped
    matched = jax.vmap(
        lambda m, s: m.at[s].set(True, mode="drop")
    )(matched, src)

    # frame-to-frame continuity: match the still-unmatched current
    # keypoints against the PREVIOUS dispatch's keypoints (rotation-
    # compensated angular gate). The host resolves these to landmarks
    # hosted by the previous frame's keypoints at finish time — finishes
    # run in order, so by then it knows them even when this dispatch ran
    # BEFORE the previous frame's bookkeeping (pipelined lag) and its
    # new landmarks were not yet in the matching table. Reference role:
    # the sequential keyframe-to-frame match (Frontend.cpp:1399-1504).
    ff_idx = jnp.full((NC, N), -1, jnp.int32)
    ff_good = jnp.zeros((NC, N), bool)
    if do_ff:
        T_WS_cur = Transformation(r=T_WS7[:3], q=T_WS7[3:7])
        T_WS_prev = Transformation(r=T_WS_prev7[:3], q=T_WS_prev7[3:7])
        cos_thr = jnp.cos(jnp.deg2rad(ff_angle_deg))
        avail_ff = kp_mask & ~matched
        for ci, cam in enumerate(cameras):
            T_sc = Transformation(r=T_SC7[ci, :3], q=T_SC7[ci, 3:7])
            C_WA = (T_WS_prev @ T_sc).C
            C_WB = (T_WS_cur @ T_sc).C
            dp = (C_WA @ cam.back_project(ff_xy[ci]).T).T
            dc = (C_WB @ cam.back_project(xy[ci]).T).T
            dp = dp / (jnp.linalg.norm(dp, axis=-1, keepdims=True) + 1e-12)
            dc = dc / (jnp.linalg.norm(dc, axis=-1, keepdims=True) + 1e-12)
            gate = jnp.einsum("nk,mk->nm", dp, dc) > cos_thr
            mres = match_descriptors(
                ff_signs[ci], ff_mask[ci], kp_signs[ci], avail_ff[ci],
                max_distance=max_distance, gate=gate,
            )
            ff_idx = ff_idx.at[ci].set(mres["idx_b"])
            ff_good = ff_good.at[ci].set(mres["valid"])

    # motion stereo vs the top-K overlap-ranked window keyframes (same
    # camera across time; the reference ranks ALL window keyframes by
    # overlapFraction and matches each, Frontend.cpp:1742-1768)
    KF = kf_xy.shape[0]
    ms_idx = jnp.zeros((KF, NC, N), jnp.int32)
    ms_hp = jnp.zeros((KF, NC, N, 4), dtype)
    ms_good = jnp.zeros((KF, NC, N), bool)
    rot_frac = jnp.zeros((), jnp.float32)
    if do_motion_stereo:
        T_WS = Transformation(r=T_WS7[:3], q=T_WS7[3:7])
        B_wahba = jnp.zeros((3, 3), dtype)
        pair_d1 = []
        pair_d2 = []
        pair_m = []
        # current-frame keypoints are consumed keyframe-by-keyframe so a
        # keypoint triangulated against an earlier (higher-overlap)
        # keyframe doesn't spawn a duplicate landmark from a later one
        avail_b = kp_mask & ~matched
        for k in range(KF):
            T_WS_kf = Transformation(
                r=T_WS_kf7[k, :3], q=T_WS_kf7[k, 3:7]
            )
            for ci, cam in enumerate(cameras):
                T_sc = Transformation(r=T_SC7[ci, :3], q=T_SC7[ci, 3:7])
                T_WA = T_WS_kf @ T_sc
                T_WB = T_WS @ T_sc
                baseline = jnp.linalg.norm(T_WB.r - T_WA.r)
                f0 = cam.focal.ravel()[0]
                i_b, hp_W, good, parallel = _stereo_pair(
                    cam, cam, T_WA, T_WB,
                    kf_xy[k, ci], kf_signs[k, ci], kf_free[k, ci],
                    xy[ci], kp_signs[ci], avail_b[ci],
                    epi_px / f0, min_depth, max_depth,
                    max_distance, False,
                )
                good = good & (baseline > 0.02) & kf_valid[k]
                ms_idx = ms_idx.at[k, ci].set(i_b)
                ms_hp = ms_hp.at[k, ci].set(hp_W.astype(dtype))
                ms_good = ms_good.at[k, ci].set(good)
                taken = jnp.zeros(N, bool).at[
                    jnp.where(good, i_b, N)
                ].set(True, mode="drop")
                avail_b = avail_b.at[ci].set(avail_b[ci] & ~taken)
                if k == 0:
                    # bearings of matched pairs (same camera, old vs
                    # new) for the rotation-only model (runRansac2d2d's
                    # 2-pt rotation-only check, Frontend.cpp:2311-2334):
                    # matched even when not good; kf 0 = best overlap
                    rays_a = cam.back_project(kf_xy[0, ci])
                    rays_b = cam.back_project(
                        xy[ci][jnp.where(i_b >= 0, i_b, 0)]
                    )
                    m = (i_b >= 0) & kf_free[0, ci]
                    pair_d1.append(rays_a)
                    pair_d2.append(rays_b)
                    pair_m.append(m)
        d1 = jnp.concatenate(pair_d1)
        d2 = jnp.concatenate(pair_d2)
        pm = jnp.concatenate(pair_m).astype(dtype)
        # Wahba fit: orthogonal polar factor of B = sum m * d2 d1^T
        B_wahba = jnp.einsum("n,ni,nj->ij", pm, d2, d1)
        from okvis2_tpu.ops.linalg import inv3x3

        detB = jnp.linalg.det(B_wahba)
        sgn = jnp.where(detB < 0, -1.0, 1.0)
        nB = jnp.abs(detB) ** (1.0 / 3.0)
        X = B_wahba * sgn / jnp.maximum(nB, 1e-12)
        for _ in range(6):
            X = 0.5 * (X + inv3x3(X).T)
        R_rot = X
        cosang = jnp.sum(jnp.einsum("ij,nj->ni", R_rot, d1) * d2, -1)
        thr = jnp.cos(jnp.deg2rad(0.3))
        n_pairs = jnp.maximum(jnp.sum(pm), 1.0)
        rot_frac = (
            jnp.sum((cosang > thr).astype(dtype) * pm) / n_pairs
        ).astype(jnp.float32)

    # compact the motion-stereo outputs: only the good rows matter to
    # the host (typically tens per frame), and the dense [KF,NC,N]
    # blocks dominate the readback's bytes (~74 KB of ~106 KB)
    flat_good = ms_good.reshape(-1)
    order = jnp.argsort(~flat_good)  # good rows first (stable)
    sel = order[:_MS_ROWS]
    ms_rows = jnp.concatenate([
        (sel // N)[:, None].astype(jnp.float32),  # k*NC + ci
        (sel % N)[:, None].astype(jnp.float32),  # keyframe kp a
        ms_idx.reshape(-1)[sel][:, None].astype(jnp.float32),  # cur kp b
        ms_hp.reshape(-1, 4)[sel].astype(jnp.float32),
        flat_good[sel][:, None].astype(jnp.float32),
    ], axis=1)  # [_MS_ROWS,8]

    # compact the frame-to-frame matches the same way: (ci, prev kp a,
    # current kp b, valid), good rows first
    ff_flat = ff_good.reshape(-1)
    ff_sel = jnp.argsort(~ff_flat)[:_FF_ROWS]
    ff_rows = jnp.concatenate([
        (ff_sel // N)[:, None].astype(jnp.float32),  # ci
        (ff_sel % N)[:, None].astype(jnp.float32),  # prev kp a
        ff_idx.reshape(-1)[ff_sel][:, None].astype(jnp.float32),  # cur b
        ff_flat[ff_sel][:, None].astype(jnp.float32),
    ], axis=1)  # [_FF_ROWS,4]

    f32 = lambda a: a.astype(jnp.float32).ravel()
    diag = jnp.concatenate([
        f32(xy), f32(det["size"]), f32(kp_mask),
        f32(idx), f32(keep),
        f32(ms_rows),
        f32(ff_rows),
        jnp.stack([n_inl.astype(jnp.float32),
                   ransac_ok.astype(jnp.float32),
                   rot_frac,
                   # TOTAL good row counts: the host warns when they
                   # exceed the compaction budgets (rows past the
                   # budget were dropped from this readback)
                   jnp.sum(flat_good).astype(jnp.float32),
                   jnp.sum(ff_flat).astype(jnp.float32)]),
        # piggyback: e.g. the PREVIOUS frame's solve output rides this
        # frame's single readback instead of paying its own ~60 ms RPC
        extra_flat.astype(jnp.float32).ravel(),
    ])
    # signs_packed: keyframes fetch descriptors to the host (place
    # recognition / map export) as bit-packed uint32 — 64 KB instead of
    # 2 MB ±1 floats over the tunnel
    stacked = {
        "xy": xy, "mask": kp_mask, "signs": kp_signs,
        "signs_packed": desc["packed"],
    }
    # device-resident match tensors for the Phase-B fused solve (obs
    # rows are appended on device without any host readback)
    match = {"idx": idx, "keep": keep, "xy": xy, "size": det["size"]}
    return diag, stacked, match, tab_signs, tab_valid


@functools.partial(
    jax.jit,
    # the program folds the staged descriptor-table updates and returns
    # the new table state; donating the old buffers avoids a 6 MB copy
    donate_argnums=(3, 4),
    static_argnames=(
        "det_cfg", "max_distance", "n_hyp", "min_inliers", "use_ransac",
        "do_motion_stereo", "do_ff", "gravity_aligned",
    ),
)
def _frame_associate_device(
    cameras, images, aux, tab_signs, tab_valid, prev_signs,
    kf_xy, kf_signs, ff_xy, ff_signs, ff_mask, extra_flat,
    det_cfg, max_distance, n_hyp,
    min_inliers, use_ransac, do_motion_stereo, do_ff,
    gravity_aligned=False,
):
    """Two-upload entry (uint8 images + float32 aux carrier): the
    synchronous frame loop and tests."""
    return _frame_associate_body(
        cameras, images, aux, tab_signs, tab_valid, prev_signs,
        kf_xy, kf_signs, ff_xy, ff_signs, ff_mask, extra_flat,
        det_cfg, max_distance, n_hyp,
        min_inliers, use_ransac, do_motion_stereo, do_ff,
        gravity_aligned,
    )


@functools.partial(
    jax.jit,
    donate_argnums=(2, 3),
    static_argnames=(
        "det_cfg", "max_distance", "n_hyp", "min_inliers", "use_ransac",
        "do_motion_stereo", "do_ff", "gravity_aligned", "img_shape",
        "n_aux",
    ),
)
def _frame_associate_from_carrier(
    cameras, carrier, tab_signs, tab_valid, prev_signs,
    kf_xy, kf_signs, ff_xy, ff_signs, ff_mask, extra_flat,
    det_cfg, max_distance, n_hyp,
    min_inliers, use_ransac, do_motion_stereo, do_ff, gravity_aligned,
    img_shape=None, n_aux=0,
):
    """Single-carrier entry (pipelined loop): the frame's ENTIRE
    host->device state — the uint8 image stack, the float32 frontend
    aux section AND the packed realtime-solve problem — crosses the
    tunnel as ONE upload RPC (each separate upload is its own
    serialised ~tens-of-ms roundtrip). This program reads the first two
    sections; the fused solve (solve_packed_fused_carrier) reads the
    third from the SAME device buffer."""
    NC, H, W = img_shape
    nimg = NC * H * W
    images = carrier[:nimg].reshape(NC, H, W)
    # bitcast the float32 section back from its bytes (exact)
    aux = jax.lax.bitcast_convert_type(
        carrier[nimg:nimg + 4 * n_aux].reshape(-1, 4), jnp.float32
    )
    return _frame_associate_body(
        cameras, images, aux, tab_signs, tab_valid, prev_signs,
        kf_xy, kf_signs, ff_xy, ff_signs, ff_mask, extra_flat,
        det_cfg, max_distance, n_hyp,
        min_inliers, use_ransac, do_motion_stereo, do_ff,
        gravity_aligned,
    )


def _stereo_pair(
    cam_a, cam_b, T_WA, T_WB,
    xy_a, signs_a, free_a, xy_b, signs_b, free_b,
    epi_gate, min_depth, max_depth, max_distance, allow_parallel,
):
    """Traced helper: epipolar-gated match + triangulation between two
    views (shared by fused motion stereo and static stereo)."""
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


def _associate_core(
    cameras, key, T_WS7, T_SC7, hp, lm_mask, lm_init,
    tab_signs, tab_valid, xy, kp_mask, kp_signs,
    radius, threshold_deg, max_distance, n_hyp, min_inliers, use_ransac,
):
    """Traced body shared by _associate_device and the fused frame
    program: project-gate-match per camera + rig-joint P3P RANSAC."""
    NC = len(cameras)
    Lc = hp.shape[0]
    T_WS = Transformation(r=T_WS7[:3], q=T_WS7[3:7])

    idx_c, ok_c, rays_c = [], [], []
    for ci, cam in enumerate(cameras):
        T_WC = T_WS @ Transformation(r=T_SC7[ci, :3], q=T_SC7[ci, 3:7])
        T_CW = T_WC.inverse()
        hp_C = jax.vmap(T_CW.apply_homogeneous)(hp)
        uv_pred, valid = cam.project_homogeneous(hp_C)
        valid = valid & lm_mask
        d2 = jnp.sum((uv_pred[:, None, :] - xy[ci][None, :, :]) ** 2, -1)
        gate = (d2 < radius * radius) & valid[:, None]
        idx, ok = _min3_gated_match(
            tab_signs, tab_valid, kp_signs[ci], kp_mask[ci], gate,
            max_distance,
        )
        rays = cam.back_project(xy[ci][idx])
        idx_c.append(idx)
        ok_c.append(ok)
        rays_c.append(rays)

    idx = jnp.stack(idx_c)
    ok = jnp.stack(ok_c)
    rays = jnp.stack(rays_c)

    if not use_ransac:
        z = jnp.zeros((), jnp.int32)
        return idx, ok, ok, z, jnp.asarray(False)

    w = hp[:, 3:4]
    pts = hp[:, :3] / jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    pts_all = jnp.tile(pts, (NC, 1))
    rays_all = rays.reshape(NC * Lc, 3)
    cam_idx = jnp.repeat(jnp.arange(NC, dtype=jnp.int32), Lc)
    corr_mask = (ok & lm_init[None, :]).reshape(NC * Lc)
    res = ransac_rig_pose_impl(
        key, pts_all, rays_all, cam_idx, corr_mask, T_SC7,
        threshold_deg=threshold_deg, n_hyp=n_hyp, min_inliers=min_inliers,
    )
    inlier = res["inliers"].reshape(NC, Lc)
    keep = jnp.where(res["ok"], inlier, ok)
    return idx, ok, keep & ok, res["num_inliers"], res["ok"]


_FLUSH_U = 512  # staged table updates folded into each fused dispatch
# per-frame frame-to-frame match row budget (readback): the 1200-frame
# and textured regression drives measured up to ~350 good rows at 256
# keypoints/camera — 512 keeps the readback compact (+4 KB) without
# truncating continuity matches
_FF_ROWS = 512
_MS_ROWS = 256  # per-frame motion-stereo row budget (readback)


def _table_update_body(tab_signs, tab_valid, kp_signs, upd):
    U = upd.shape[0] // 4
    tgt = upd[0:U]
    cam = upd[U:2 * U]
    kp = upd[2 * U:3 * U]
    clear = upd[3 * U:4 * U]
    """Scatter this frame's new landmark descriptors into the resident
    table and clear freed slots — the per-frame delta upload is a few
    hundred int32s instead of the whole multi-MB table. Clears apply
    BEFORE the descriptor writes: a slot freed and re-allocated in the
    same flush batch keeps its freshly staged descriptor."""
    Lc, K, B = tab_signs.shape
    src = kp_signs[cam, kp].astype(tab_signs.dtype)  # [U,B]
    tab_valid = tab_valid.at[clear].set(False, mode="drop")
    flat_s = tab_signs.reshape(Lc * K, B)
    flat_v = tab_valid.reshape(Lc * K)
    flat_s = flat_s.at[tgt].set(src, mode="drop")
    flat_v = flat_v.at[tgt].set(True, mode="drop")
    return flat_s.reshape(Lc, K, B), flat_v.reshape(Lc, K)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _table_update(tab_signs, tab_valid, kp_signs, upd):
    """Standalone flush dispatch (sync path / keyframe extras)."""
    return _table_update_body(tab_signs, tab_valid, kp_signs, upd)


@functools.partial(
    jax.jit, static_argnames=("pairs", "max_distance", "allow_parallel")
)
def _stereo_pairs_device(
    cameras,
    aux: jnp.ndarray,  # flat f32: T_WA7s | T_WB7s | gates | 2 depths |
    #                    free_a | free_b  (ONE upload RPC)
    xy: jnp.ndarray,  # [NC,N,2] stacked keypoints (device)
    signs: jnp.ndarray,  # [NC,N,B]
    pairs,  # static tuple of (ci, cj)
    max_distance: int,
    allow_parallel: bool,
):
    """Static stereo across ALL overlapping camera pairs in ONE dispatch
    with one stacked output — the per-pair dispatch+readback loop costs
    a serialised tunnel roundtrip per pair (~10 of them on a Hilti-rig
    keyframe). Returns ONE flat float array
    [idx_b | hp_W | good | parallel] (decode with _decode_stereo_flat):
    a pytree output costs one ~40 ms tunnel fetch PER LEAF.
    Reference: matchStereo, Frontend.cpp:1981-2150."""
    P = len(pairs)
    N = xy.shape[1]
    o = 0
    T_WA7s = aux[o:o + P * 7].reshape(P, 7); o += P * 7
    T_WB7s = aux[o:o + P * 7].reshape(P, 7); o += P * 7
    gates = aux[o:o + P]; o += P
    min_depth = aux[o]
    max_depth = aux[o + 1]; o += 2
    free_a = aux[o:o + P * N].reshape(P, N) > 0.5; o += P * N
    free_b = aux[o:o + P * N].reshape(P, N) > 0.5
    outs = []
    for p, (ci, cj) in enumerate(pairs):
        T_WA = Transformation(r=T_WA7s[p, :3], q=T_WA7s[p, 3:7])
        T_WB = Transformation(r=T_WB7s[p, :3], q=T_WB7s[p, 3:7])
        i_b, hp_W, good, parallel = _stereo_pair(
            cameras[ci], cameras[cj], T_WA, T_WB,
            xy[ci], signs[ci], free_a[p], xy[cj], signs[cj], free_b[p],
            gates[p], min_depth, max_depth,
            max_distance, allow_parallel,
        )
        outs.append((i_b, hp_W, good, parallel))
    idx_b, hp_W, good, parallel = (jnp.stack(x) for x in zip(*outs))
    f = hp_W.dtype
    return jnp.concatenate([
        idx_b.astype(f).ravel(),  # keypoint indices < N: exact
        hp_W.ravel(),
        good.astype(f).ravel(),
        parallel.astype(f).ravel(),
    ])


def _decode_stereo_flat(flat: np.ndarray, P: int, N: int):
    """Host decode of _stereo_pairs_device's flat output."""
    flat = np.asarray(flat)
    o = P * N
    idx_b = np.round(flat[:o]).astype(np.int32).reshape(P, N)
    hp_W = flat[o:o + P * N * 4].reshape(P, N, 4)
    o += P * N * 4
    good = flat[o:o + P * N].reshape(P, N) > 0.5
    parallel = flat[o + P * N:o + 2 * P * N].reshape(P, N) > 0.5
    return idx_b, hp_W, good, parallel


@jax.jit
def _pack_kf_fetch(signs_packed: jnp.ndarray, stereo_flat: jnp.ndarray):
    """Fuse a keyframe's two deferred outputs — the bit-packed
    descriptor table fetch and the static-stereo flat — into ONE array
    so the background thread pays a single tunnel readback (each fetch
    RPC costs ~30-60 ms regardless of size). uint32 words travel as two
    exact uint16 halves (a float32 carrier can't hold 2^32, and
    bitcasting risks NaN canonicalisation on the way)."""
    s = signs_packed.ravel()
    f = stereo_flat.dtype
    lo = (s & jnp.uint32(0xFFFF)).astype(f)
    hi = (s >> jnp.uint32(16)).astype(f)
    return jnp.concatenate([lo, hi, stereo_flat])


def _unpack_kf_fetch(flat: np.ndarray, signs_shape):
    """Host split of _pack_kf_fetch's output: (signs_packed uint32,
    stereo flat)."""
    flat = np.asarray(flat)
    n = int(np.prod(signs_shape))
    lo = np.round(flat[:n]).astype(np.uint32)
    hi = np.round(flat[n:2 * n]).astype(np.uint32)
    signs = ((hi << np.uint32(16)) | lo).reshape(signs_shape)
    return signs, flat[2 * n:]


class DeviceLandmarkTable:
    """Host bookkeeping for the device-resident landmark descriptor map."""

    def __init__(self, capacity: int, n_desc: int):
        self.capacity = capacity
        self.n_desc = n_desc
        self.slot_of: Dict[int, int] = {}
        self.lid_of: Dict[int, int] = {}
        # slot -> lid as an array twin of lid_of: per-frame consumers
        # (solver slot maps, w_scale) vectorise over it instead of
        # iterating the dicts (~1k dict ops x K in-flight sets/frame)
        self.slot_lid = np.full(capacity, -1, np.int64)
        self.free = list(range(capacity - 1, -1, -1))
        self.ring_next = np.zeros(capacity, np.int32)
        # LRU bookkeeping: a full table evicts the least-recently-staged
        # landmark instead of refusing new ones (refusal silently made
        # every post-capacity landmark unmatchable forever — measured on
        # the 1200-frame circle as a tracking-decay spiral: keyframes
        # every 1-3 frames, ~900 duplicate landmarks per lap). The
        # reference's analogue is matching against the bounded covisible
        # local map (Frontend.cpp:1362-1432) rather than the whole map.
        self.last_seen = np.zeros(capacity, np.int64)
        self.tick = 0
        self.num_evictions = 0
        self.signs = None  # device [cap,K,B]
        self.valid = None  # device [cap,K]
        # staged per-frame updates
        self._upd: List[tuple] = []  # (slot, ring, cam, kp)
        self._clear: List[int] = []

    def ensure(self, B: int, dtype):
        if self.signs is None:
            self.signs = jnp.zeros(
                (self.capacity, self.n_desc, B), dtype
            )
            self.valid = jnp.zeros((self.capacity, self.n_desc), bool)

    def load_host_descriptors(self, lid_signs: Dict[int, np.ndarray]):
        """Bulk-insert host descriptors (multi-session map load:
        Frontend::loadComponent role, Frontend.cpp:180-218): allocate a
        slot per landmark and upload the merged table once."""
        if not lid_signs:
            return
        B = len(next(iter(lid_signs.values())))
        self.ensure(B, jnp.float32)
        signs_np = np.array(self.signs)  # writable copies
        valid_np = np.array(self.valid)
        for lid, sg in lid_signs.items():
            s = self.alloc(lid)
            if s is None:
                break
            signs_np[s, 0] = np.asarray(sg, signs_np.dtype)
            valid_np[s, 0] = True
            self.ring_next[s] = 1
        self.signs = jnp.asarray(signs_np)
        self.valid = jnp.asarray(valid_np)

    def alloc(self, lid: int) -> Optional[int]:
        s = self.slot_of.get(lid)
        if s is not None:
            return s
        if not self.free:
            # evict the least-recently-staged tenant (old-lap landmarks;
            # anything actively matched was staged within a few frames).
            # Its LandmarkRecord stays in the graph and lm_desc_sets keeps
            # its variants for loop-closure verification — only future
            # map matching forgets it.
            ev = int(np.argmin(self.last_seen))
            old_lid = self.lid_of.get(ev)
            if old_lid is None:
                return None
            self.release(old_lid)
            # staged updates of the evicted tenant must not land in the
            # new tenant's slot (clears apply before updates per batch)
            if self._upd:
                self._upd = [u for u in self._upd if u[0] != ev]
            self.num_evictions += 1
        s = self.free.pop()
        self.slot_of[lid] = s
        self.lid_of[s] = lid
        self.slot_lid[s] = lid
        self.ring_next[s] = 0
        self.tick += 1
        self.last_seen[s] = self.tick
        return s

    def release(self, lid: int):
        s = self.slot_of.pop(lid, None)
        if s is not None:
            del self.lid_of[s]
            self.slot_lid[s] = -1
            self.free.append(s)
            self._clear.append(s)

    def stage_descriptor(self, lid: int, cam: int, kp: int):
        s = self.slot_of.get(lid)
        if s is None:
            s = self.alloc(lid)
            if s is None:
                return
        self.tick += 1
        self.last_seen[s] = self.tick
        ring = int(self.ring_next[s])
        self.ring_next[s] = (ring + 1) % self.n_desc
        self._upd.append((s, ring, cam, kp))

    def staged_count(self) -> int:
        return len(self._upd) + len(self._clear)

    def drain(self, U: int) -> "np.ndarray":
        """Consume up to U staged updates + clears into one flat [4U]
        int32 block (tgt | cam | kp | clear) for the fused in-program
        table update; leftovers stay staged."""
        K = self.n_desc
        upd = np.empty(4 * U, np.int32)
        tgt = upd[0:U]
        tgt[:] = self.capacity * K  # drop
        cam = upd[U:2 * U]
        cam[:] = 0
        kp = upd[2 * U:3 * U]
        kp[:] = 0
        # same ordering rule as flush(): when the clear backlog spills
        # over one batch, drain only clears so a later batch's clear can
        # never wipe a slot whose new tenant's descriptor went out in an
        # earlier batch
        batch = [] if len(self._clear) > U else self._upd[:U]
        self._upd = self._upd[len(batch):]
        for i, (sl, ring, c, k) in enumerate(batch):
            tgt[i] = sl * K + ring
            cam[i] = c
            kp[i] = k
        clear = upd[3 * U:4 * U]
        clear[:] = self.capacity
        clr = self._clear[:U]
        self._clear = self._clear[U:]
        clear[: len(clr)] = clr
        return upd

    def flush(self, kp_signs_device, upd_capacity: int = 512):
        """Apply staged updates in one donated-scatter dispatch."""
        if self.signs is None:
            return
        if not self._upd and not self._clear:
            return
        K = self.n_desc
        while self._upd or self._clear:
            # clears apply before updates inside _table_update; when the
            # clear backlog spills over one batch, drain it first so a
            # slot freed and re-allocated in the same frame never has a
            # LATER batch's clear wipe the new tenant's descriptor
            # (which would silently destroy that landmark's matchability)
            batch = ([] if len(self._clear) > upd_capacity
                     else self._upd[:upd_capacity])
            self._upd = self._upd[len(batch):]
            clr = self._clear[:upd_capacity]
            self._clear = self._clear[upd_capacity:]
            U = upd_capacity
            upd = np.empty(4 * U, np.int32)
            tgt = upd[0:U]
            tgt[:] = self.capacity * K  # drop
            cam = upd[U:2 * U]
            kp = upd[2 * U:3 * U]
            for i, (s, ring, c, k) in enumerate(batch):
                tgt[i] = s * K + ring
                cam[i] = c
                kp[i] = k
            clear = upd[3 * U:4 * U]
            clear[:] = self.capacity
            clear[: len(clr)] = clr
            self.signs, self.valid = _table_update(
                self.signs, self.valid, kp_signs_device, upd,
            )


class Frontend:
    def __init__(self, cameras, extrinsics: List[Transformation],
                 config: FrontendConfig = FrontendConfig()):
        self.cameras = tuple(cameras)
        self.extrinsics = list(extrinsics)
        # numpy copies for host-side composition
        self.T_SC_np = [
            np.concatenate([np.asarray(T.r), np.asarray(T.q)])
            for T in extrinsics
        ]
        self.cfg = config
        # landmark id -> latest descriptor signs (numpy, for loop-closure
        # verification and map export); the matching path uses the
        # device-resident table below
        self.lm_descriptors: Dict[int, np.ndarray] = {}
        # landmark id -> up to 3 DISTINCT descriptor variants (bit-packed
        # uint8[B/8], 64 B each) accumulated over the landmark's life:
        # loop-closure verification matches the current frame against
        # ALL of them, like the reference's <=3-descriptors-per-landmark
        # matching (Frontend.cpp:1224-1359) — a revisit often resembles
        # a LATER view of the landmark better than the PR keyframe's own
        self.lm_desc_sets: Dict[int, list] = {}
        self.table = DeviceLandmarkTable(
            config.map_match_capacity, config.n_desc_per_lm
        )
        self._key = jax.random.PRNGKey(42)
        self.last_keyframe_id: Optional[int] = None
        self.last_ransac = {"num_inliers": 0, "ok": False}
        self._desc_stage: List[tuple] = []

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def detect_and_describe(self, images: List[np.ndarray]):
        """Whole-rig detection+description: one batched device call when
        all cameras share a resolution (the common case). Returns a list
        of per-camera dicts (host numpy) sharing a "stacked" entry with
        the device-resident arrays."""
        shapes = {img.shape for img in images}
        if len(shapes) == 1:
            stack = jnp.asarray(np.stack(images))
            det = detect_keypoints_batch(stack, self.cfg.detection)
            desc = jax.vmap(describe_keypoints)(
                stack, det["xy"], det["size"], det["mask"]
            )
            stacked = {
                "xy": det["xy"],
                "mask": det["mask"],
                "signs": desc["signs"],
            }
            # ONE bulk host fetch for all bookkeeping data
            xy_np, size_np, mask_np, signs_np = jax.device_get(
                (det["xy"], det["size"], det["mask"], desc["signs"])
            )
            return [
                {
                    "xy": xy_np[ci],
                    "size": size_np[ci],
                    "mask": mask_np[ci],
                    "signs_np": signs_np[ci],
                    "stacked": stacked,
                    "cam": ci,
                }
                for ci in range(len(images))
            ]
        out = []
        dets = []
        for ci, img in enumerate(images):
            imgj = jnp.asarray(img)
            det = detect_keypoints(imgj, self.cfg.detection)
            desc = describe_keypoints(
                imgj, det["xy"], det["size"], det["mask"]
            )
            dets.append((det, desc))
        # heterogeneous rigs: no stacking; fetch per camera
        for ci, (det, desc) in enumerate(dets):
            xy_np, size_np, mask_np, signs_np = jax.device_get(
                (det["xy"], det["size"], det["mask"], desc["signs"])
            )
            out.append(
                {
                    "xy": xy_np,
                    "size": size_np,
                    "mask": mask_np,
                    "signs_np": signs_np,
                    "stacked": {
                        "xy": det["xy"][None],
                        "mask": det["mask"][None],
                        "signs": desc["signs"][None],
                    },
                    "cam": ci,
                }
            )
        return out

    # ------------------------------------------------------------------
    def associate_frame(self, estimator: Estimator, images, sid: int,
                        T_WS_pred7: np.ndarray,
                        between_dispatch_hook=None,
                        extra_flat=None):
        """THE per-frame frontend entry: detection + description +
        match-to-map + rig RANSAC + motion stereo as one fused dispatch
        with a single flat readback, then host bookkeeping (observation
        and landmark insertion). Returns (frames, info).

        Replaces the detectAndDescribe -> matchToMap -> runRansac3d2d ->
        matchMotionStereo sequence (Frontend.cpp:221-269, 558-1015) with
        tunnel-friendly orchestration: ~60 ms per roundtrip means the
        frame loop can afford exactly one. The pipelined frame loop
        (slam.py, Phase B) splits this into dispatch_frame (no readback)
        + finish_frame (next frame, on the lagged combined output)."""
        ctx = self.dispatch_frame(
            estimator, images, sid, T_WS_pred7, extra_flat=extra_flat
        )
        if between_dispatch_hook is not None:
            # the device is busy with the fused program; overlap host
            # work (e.g. integrating the previous frame's solve) with it
            between_dispatch_hook()
        diag_np = np.asarray(ctx["diag"])  # the frame's ONE readback
        return self.finish_frame(estimator, ctx, diag_np)

    def prepare_frame(self, estimator: Estimator, images, sid: int,
                      T_WS_pred7: np.ndarray):
        """Host-side prep for the fused frontend program: stack/quantise
        the images, fill the flat aux carrier (predicted pose,
        extrinsics, landmark-table state, top-K keyframe stacks, staged
        descriptor-table updates) and resolve the device-side keyframe
        stacks. NO uploads happen here: the caller either embeds
        `imgs_u8` + `aux_all` into the frame's single carrier upload
        (dispatch_prepared, pipelined loop) or uploads them separately
        (dispatch_frame)."""
        from okvis2_tpu.frontend.descriptor import DESCRIPTOR_BITS
        from okvis2_tpu.utils.timing import SwitchableTimer

        cfg = self.cfg
        with SwitchableTimer("1.1 prep: sync table"):
            self._sync_table(estimator)
        # host descriptor copies resolve only when this frame's signs are
        # fetched (keyframes); stale stages from non-keyframes would
        # index into the wrong frame's keypoints, so reset per frame
        self._desc_stage = []
        table = self.table
        NC = len(self.cameras)
        N = cfg.detection.max_keypoints
        with SwitchableTimer("1.2 prep: stack+quantise imgs"):
            imgs = np.stack(images)
            if imgs.dtype != np.uint8:
                # quantise on host: the upload is 4x smaller and the
                # device widens back to float32 (EuRoC is uint8 natively)
                imgs = (np.clip(imgs, 0.0, 1.0) * 255.0 + 0.5).astype(
                    np.uint8
                )
        fdtype = np.float32  # device compute dtype after widening
        table.ensure(DESCRIPTOR_BITS, fdtype)

        # ---- flat aux buffers: 2 uploads instead of ~15 (each upload
        # is its own serialised RPC over the tunnel) ----
        cap = table.capacity
        KF = cfg.motion_stereo_keyframes
        B = DESCRIPTOR_BITS
        nf = 7 + 7 + NC * 7 + cap * 4 + KF * 7 + 6
        ni = 2 * cap + KF * NC * N + KF + 1 + 4 * _FLUSH_U  # + staged upd
        bufs = getattr(self, "_aux_bufs", None)
        if bufs is None or bufs[2].shape[0] != nf + ni:
            # ONE float32 carrier (ints are exact < 2^24): the whole
            # per-frame aux state is a single upload RPC over the tunnel
            combined = np.zeros(nf + ni, np.float32)
            bufs = (combined[:nf], combined[nf:], combined)
            self._aux_bufs = bufs
        aux_f, aux_i, aux_all = bufs
        # previous DISPATCH's device-resident keypoints: frame-to-frame
        # continuity when the pipelined loop runs ahead of bookkeeping
        ffp = getattr(self, "_ff_prev", None)
        do_ff = ffp is not None and ffp["sid"] in estimator.states
        o = 0
        aux_f[o:o + 7] = T_WS_pred7; o += 7
        aux_f[o:o + 7] = (
            estimator.states[ffp["sid"]].pose if do_ff
            else np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32)
        ); o += 7
        aux_f[o:o + NC * 7] = np.concatenate(self.T_SC_np); o += NC * 7
        hp_view = aux_f[o:o + cap * 4].reshape(cap, 4)
        hp_view[:] = 0.0
        hp_view[:, 3] = 1.0
        o_kf = o + cap * 4
        _t_tbl = SwitchableTimer("1.3 prep: landmark table fill")
        _t_tbl.__enter__()
        lm_mask = np.zeros(cap, bool)
        lm_init = np.zeros(cap, bool)
        for lid, s in table.slot_of.items():
            lm = estimator.landmarks.get(lid)
            if lm is None:
                continue
            hp_view[s] = lm.hp_W
            lm_mask[s] = True
            lm_init[s] = lm.initialised
        aux_i[:cap] = lm_mask
        aux_i[cap:2 * cap] = lm_init
        _t_tbl.__exit__(None, None, None)

        # top-K overlap-ranked keyframe stacks for motion stereo
        # (Frontend.cpp:1742-1768 ranks all window keyframes by
        # overlapFraction; fixed K keeps the device shapes static)
        with SwitchableTimer("1.4 prep: rank keyframes"):
            top_ids = self._rank_keyframes_by_overlap(
                estimator, T_WS_pred7, sid, hp_view, lm_mask, KF
            )
        do_ms = bool(top_ids)
        kf7_view = aux_f[o_kf:o_kf + KF * 7].reshape(KF, 7)
        kf7_view[:] = np.array([0, 0, 0, 0, 0, 0, 1.0])
        aux_f[o_kf + KF * 7:] = (
            cfg.map_match_radius, cfg.ransac_threshold_deg,
            cfg.stereo_epipolar_gate, cfg.min_depth, cfg.max_depth,
            cfg.ff_match_angle_deg,
        )
        _t_kf = SwitchableTimer("1.5 prep: kf stacks")
        _t_kf.__enter__()
        kf_free = np.zeros((KF, NC, N), bool)
        kf_valid = np.zeros(KF, bool)
        if do_ms:
            for k, kid in enumerate(top_ids):
                kfr = self._kf_store[kid]
                free = np.stack([f["mask"] for f in kfr]).copy()
                for (_l, c, kp) in estimator.obs_of_state(kid):
                    if kp < N:
                        free[c, kp] = False
                kf_free[k] = free
                kf_valid[k] = True
                kf7_view[k] = estimator.states[kid].pose
            # the stacked device arrays only change when the top-K SET
            # changes (stable between keyframes): caching them saves two
            # device ops per frame on the serialised tunnel
            cache = getattr(self, "_kf_stack_cache", None)
            key_ids = tuple(top_ids)
            if cache is None or cache[0] != key_ids \
                    or cache[1].shape != (KF, NC, N, 2):
                zeros = getattr(self, "_kf_zero_pads", None)
                if zeros is None or zeros[0].shape != (NC, N, 2):
                    zeros = (jnp.zeros((NC, N, 2), fdtype),
                             jnp.zeros((NC, N, B), fdtype))
                    self._kf_zero_pads = zeros
                kf_xy_s, kf_signs_s = [], []
                for k in range(KF):
                    if k < len(top_ids):
                        kfr = self._kf_store[top_ids[k]]
                        kf_xy_s.append(kfr[0]["stacked"]["xy"])
                        kf_signs_s.append(kfr[0]["stacked"]["signs"])
                    else:
                        kf_xy_s.append(zeros[0])
                        kf_signs_s.append(zeros[1])
                cache = (key_ids, jnp.stack(kf_xy_s),
                         jnp.stack(kf_signs_s))
                self._kf_stack_cache = cache
            kf_xy_dev, kf_signs_dev = cache[1], cache[2]
        else:
            pads = getattr(self, "_kf_zero_stack", None)
            if pads is None or pads[0].shape != (KF, NC, N, 2):
                pads = (jnp.zeros((KF, NC, N, 2), fdtype),
                        jnp.zeros((KF, NC, N, B), fdtype))
                self._kf_zero_stack = pads
            kf_xy_dev, kf_signs_dev = pads
        aux_i[2 * cap:2 * cap + KF * NC * N] = kf_free.reshape(-1)
        oc = 2 * cap + KF * NC * N
        aux_i[oc:oc + KF] = kf_valid
        self._frame_counter = getattr(self, "_frame_counter", 0) + 1
        aux_i[oc + KF] = self._frame_counter
        # staged descriptor-table updates (from the previous frame's
        # lagged bookkeeping) fold into this dispatch
        aux_i[oc + KF + 1:] = table.drain(_FLUSH_U)
        prev_signs = getattr(self, "_staged_signs_dev", None)
        if prev_signs is None:
            zp = getattr(self, "_prev_signs_zero", None)
            if zp is None or zp.shape != (NC, N, B):
                zp = jnp.zeros((NC, N, B), fdtype)
                self._prev_signs_zero = zp
            prev_signs = zp

        if do_ff:
            ff_xy_dev = ffp["xy"]
            ff_signs_dev = ffp["signs"]
            ff_mask_dev = ffp["mask"]
        else:
            zf = getattr(self, "_ff_zero", None)
            if zf is None or zf[0].shape != (NC, N, 2):
                zf = (jnp.zeros((NC, N, 2), fdtype),
                      jnp.zeros((NC, N, B), fdtype),
                      jnp.zeros((NC, N), bool))
                self._ff_zero = zf
            ff_xy_dev, ff_signs_dev, ff_mask_dev = zf

        _t_kf.__exit__(None, None, None)
        return {
            "sid": sid, "imgs_u8": imgs, "aux_all": aux_all,
            "do_ms": do_ms, "top_ids": top_ids,
            "prev_signs": prev_signs,
            "kf_xy_dev": kf_xy_dev, "kf_signs_dev": kf_signs_dev,
            "do_ff": do_ff, "ff_prev_sid": ffp["sid"] if do_ff else None,
            "ff_xy_dev": ff_xy_dev, "ff_signs_dev": ff_signs_dev,
            "ff_mask_dev": ff_mask_dev,
            "NC": NC, "N": N, "cap": cap, "KF": KF,
            # the match rows will reference table slots AS OF THIS PREP
            # (nothing mutates the table between prep and dispatch);
            # later bookkeeping may release/reallocate slots, so
            # downstream consumers map through this snapshot
            "slot_of": dict(table.slot_of),
            "slot_lid": table.slot_lid.copy(),
        }

    def _zero_extra_dev(self):
        extra_dev = getattr(self, "_zero_extra", None)
        if extra_dev is None:
            extra_dev = jnp.zeros(0, jnp.float32)
            self._zero_extra = extra_dev
        return extra_dev

    def _adopt_dispatch(self, prep, diag, stacked, match,
                        new_signs, new_valid):
        """Shared dispatch postlude: adopt the program's folded
        descriptor-table state and build the frame ctx."""
        table = self.table
        # the program applied the folded staged updates — adopt its
        # table state as the resident one
        table.signs = new_signs
        table.valid = new_valid
        if not table._upd:
            # all descriptor writes consumed (leftover clears don't
            # reference the staged signs, so the source can go)
            self._staged_signs_dev = None
        # this dispatch's keypoints become the NEXT dispatch's
        # frame-to-frame matching source (device-resident)
        self._ff_prev = {
            "sid": prep["sid"], "xy": stacked["xy"],
            "signs": stacked["signs"], "mask": stacked["mask"],
        }
        return {
            "sid": prep["sid"], "diag": diag, "stacked": stacked,
            "match": match, "do_ms": prep["do_ms"],
            "top_ids": prep["top_ids"],
            "ff_prev_sid": prep["ff_prev_sid"],
            "NC": prep["NC"], "N": prep["N"], "cap": prep["cap"],
            "KF": prep["KF"], "slot_of": prep["slot_of"],
            "slot_lid": prep["slot_lid"],
        }

    def dispatch_prepared(self, prep, carrier_dev):
        """Fused frontend dispatch reading the image + aux sections of
        the frame's SINGLE carrier upload (pipelined loop)."""
        cfg = self.cfg
        diag, stacked, match, new_signs, new_valid = \
            _frame_associate_from_carrier(
                self.cameras,
                carrier_dev,
                self.table.signs,
                self.table.valid,
                prep["prev_signs"],
                prep["kf_xy_dev"],
                prep["kf_signs_dev"],
                prep["ff_xy_dev"],
                prep["ff_signs_dev"],
                prep["ff_mask_dev"],
                self._zero_extra_dev(),
                cfg.detection,
                cfg.matching_threshold,
                cfg.ransac_hypotheses,
                cfg.ransac_min_inliers,
                cfg.use_ransac,
                # config-static flags: frames without keyframes (resp. a
                # previous dispatch) pass all-False kf_valid / ff_mask
                # instead of extra (expensive) compile variants of the
                # fused program
                cfg.motion_stereo_keyframes > 0,
                cfg.ff_match_angle_deg > 0,
                cfg.gravity_aligned_description,
                img_shape=prep["imgs_u8"].shape,
                n_aux=int(prep["aux_all"].size),
            )
        return self._adopt_dispatch(prep, diag, stacked, match,
                                    new_signs, new_valid)

    def dispatch_frame(self, estimator: Estimator, images, sid: int,
                       T_WS_pred7: np.ndarray, extra_flat=None,
                       images_dev=None):
        """Prep + the fused frontend dispatch, NO readback (two-upload
        path: the synchronous loop and tests). Returns a ctx dict
        holding the device handles (diag, stacked detection arrays,
        match tensors for the Phase-B device-side observation append)
        and the host-side decode context. `images_dev` optionally
        supplies an already-uploaded uint8 image stack."""
        prep = self.prepare_frame(estimator, images, sid, T_WS_pred7)
        cfg = self.cfg
        if images_dev is None:
            images_dev = jnp.asarray(prep["imgs_u8"])
        if extra_flat is None:
            extra_dev = self._zero_extra_dev()
        else:
            extra_dev = jnp.asarray(extra_flat)
        diag, stacked, match, new_signs, new_valid = \
            _frame_associate_device(
                self.cameras,
                images_dev,
                jnp.asarray(prep["aux_all"]),
                self.table.signs,
                self.table.valid,
                prep["prev_signs"],
                prep["kf_xy_dev"],
                prep["kf_signs_dev"],
                prep["ff_xy_dev"],
                prep["ff_signs_dev"],
                prep["ff_mask_dev"],
                extra_dev,
                cfg.detection,
                cfg.matching_threshold,
                cfg.ransac_hypotheses,
                cfg.ransac_min_inliers,
                cfg.use_ransac,
                cfg.motion_stereo_keyframes > 0,  # config-static flags,
                cfg.ff_match_angle_deg > 0,       # see dispatch_prepared
                cfg.gravity_aligned_description,
            )
        return self._adopt_dispatch(prep, diag, stacked, match,
                                    new_signs, new_valid)

    def finish_frame(self, estimator: Estimator, ctx, diag: np.ndarray):
        """Decode the fused program's flat diagnostics and do the host
        bookkeeping (observation + landmark insertion, descriptor table
        staging). `diag` is the host copy of ctx["diag"] — fetched
        synchronously (associate_frame) or arriving one frame late
        through the combined Phase-B readback (slam.py pipelined loop).
        Returns (frames, info)."""
        cfg = self.cfg
        table = self.table
        # leftovers the last fold couldn't take (>_FLUSH_U staged in one
        # frame) index an OLDER frame's signs — flush them before this
        # frame's staging starts so the sources never mix
        if table._upd:
            self._flush_staged()
        # per-finish staging: with the adaptive pending queue several
        # frames can finish back-to-back before the next prepare; the
        # descriptor-stage list must only ever hold THIS frame's
        # entries or a keyframe's deferred fetch would resolve another
        # frame's keypoint indices against the wrong signs
        self._desc_stage = []
        sid = ctx["sid"]
        stacked = ctx["stacked"]
        do_ms = ctx["do_ms"]
        top_ids = ctx["top_ids"]
        NC, N, cap, KF = ctx["NC"], ctx["N"], ctx["cap"], ctx["KF"]

        # ---- decode the flat diagnostics ----
        off = 0

        def take(n, shape=None):
            nonlocal off
            v = diag[off:off + n]
            off += n
            return v.reshape(shape) if shape else v

        xy = take(NC * N * 2, (NC, N, 2))
        size = take(NC * N, (NC, N))
        kp_mask = take(NC * N, (NC, N)) > 0.5
        idx = take(NC * cap, (NC, cap)).astype(np.int32)
        keep = take(NC * cap, (NC, cap)) > 0.5
        # the device compaction emits min(budget, available) rows — a
        # small config (few keypoints/cameras) has fewer candidate rows
        # than the budget, and the argsort slice clamps silently; the
        # decode must clamp identically or every later field mis-frames
        ms_n = min(_MS_ROWS, KF * NC * N)
        ff_n = min(_FF_ROWS, NC * N)
        ms_rows = take(ms_n * 8, (ms_n, 8))
        ff_rows = take(ff_n * 4, (ff_n, 4))
        n_inl = int(diag[off]); ransac_ok = diag[off + 1] > 0.5
        rot_frac = float(diag[off + 2])
        ms_total = int(diag[off + 3]); ff_total = int(diag[off + 4])
        extra_np = diag[off + 5:]
        if ms_total > ms_n:
            _warn_capacity(
                "ms_rows",
                f"motion-stereo rows truncated ({ms_total} good > "
                f"{ms_n} budget) — raise _MS_ROWS",
            )
        if ff_total > ff_n:
            _warn_capacity(
                "ff_rows",
                f"frame-to-frame match rows truncated ({ff_total} good "
                f"> {ff_n} budget) — raise _FF_ROWS",
            )

        frames = [
            {
                "xy": xy[ci], "size": size[ci], "mask": kp_mask[ci],
                "stacked": stacked, "cam": ci,
            }
            for ci in range(NC)
        ]
        self.last_ransac = {"num_inliers": n_inl, "ok": ransac_ok}

        # ---- observation insertion (RANSAC survivors only) ----
        # the match rows index table slots AS OF THE DISPATCH: under
        # pipelined lag, bookkeeping between dispatch and this finish
        # can have released/reallocated slots, so resolve through the
        # ctx snapshot (and drop landmarks deleted since)
        lid_of_dispatch = {s: l for l, s in ctx["slot_of"].items()}
        n_matched = 0
        for ci in range(NC):
            fr = frames[ci]
            for s in np.nonzero(keep[ci])[0]:
                lid = lid_of_dispatch.get(int(s))
                if lid is None or lid not in estimator.landmarks:
                    continue
                kp = int(idx[ci][s])
                estimator.add_observation(
                    lid, sid, ci, kp, fr["xy"][kp], fr["size"][kp]
                )
                table.stage_descriptor(lid, ci, kp)
                self._desc_stage.append((lid, ci, kp))
                n_matched += 1

        # ---- frame-to-frame continuity resolution ----
        # a current keypoint the map match missed, matched on device to
        # a previous-dispatch keypoint: if the host's (by now complete)
        # bookkeeping says that keypoint hosts a landmark, observe it.
        # This is what keeps recall intact when this frame was
        # DISPATCHED before the previous frame's finish staged its new
        # landmarks into the matching table (pipelined lag).
        n_ff = 0
        prev_sid = ctx.get("ff_prev_sid")
        if prev_sid is not None and prev_sid in estimator.states:
            host_of = {
                (c2, k2): l2
                for (l2, c2, k2) in estimator.obs_of_state(prev_sid)
            }
            if host_of:
                cur_obs = estimator.obs_of_state(sid)
                cur_used = {(c2, k2) for (_l, c2, k2) in cur_obs}
                cur_lids = {l2 for (l2, _c, _k) in cur_obs}
                for r in ff_rows[ff_rows[:, 3] > 0.5]:
                    ci, a, b = int(r[0]), int(r[1]), int(r[2])
                    if b < 0 or ci >= NC:
                        continue
                    lid = host_of.get((ci, a))
                    if lid is None or lid not in estimator.landmarks:
                        continue
                    if (ci, b) in cur_used or lid in cur_lids:
                        continue
                    fr = frames[ci]
                    if not fr["mask"][b]:
                        continue
                    estimator.add_observation(
                        lid, sid, ci, b, fr["xy"][b], fr["size"][b]
                    )
                    table.stage_descriptor(lid, ci, b)
                    self._desc_stage.append((lid, ci, b))
                    cur_used.add((ci, b))
                    cur_lids.add(lid)
                    n_ff += 1
        n_matched += n_ff

        # ---- motion-stereo landmark initialisation ----
        # rotation-only veto: when a pure rotation explains nearly all
        # keyframe<->current matches, apparent parallax is spurious
        n_ms = 0
        if do_ms and rot_frac < cfg.rotation_only_veto:
            # host-side dedup: the device excluded keypoints that were
            # observed as of the DISPATCH; with the dispatch-first
            # pipelined order, bookkeeping between dispatch and this
            # finish can have inserted observations on the keyframe or
            # current keypoints since — never double-host a keypoint
            used_of = {
                s2: {(c2, k2)
                     for (_l, c2, k2) in estimator.obs_of_state(s2)}
                for s2 in set(top_ids) | {sid}
            }
            for r in ms_rows[ms_rows[:, 7] > 0.5]:
                k, ci = divmod(int(r[0]), NC)
                if k >= len(top_ids):
                    continue
                kid = top_ids[k]
                kfr = self._kf_store.get(kid)
                if kfr is None:
                    # the ranked keyframe was evicted from the store
                    # between this frame's dispatch and its (lagged)
                    # finish — its host detection arrays are gone, so
                    # its motion-stereo rows can't be inserted
                    continue
                a, b = int(r[1]), int(r[2])
                if (ci, a) in used_of[kid] or (ci, b) in used_of[sid]:
                    continue
                used_of[kid].add((ci, a))
                used_of[sid].add((ci, b))
                fa = kfr[ci]
                fr = frames[ci]
                lid = estimator.add_landmark(r[3:7], initialised=True)
                estimator.add_observation(
                    lid, kid, ci, a, fa["xy"][a], fa["size"][a]
                )
                estimator.add_observation(
                    lid, sid, ci, b, fr["xy"][b], fr["size"][b]
                )
                table.stage_descriptor(lid, ci, b)
                self._desc_stage.append((lid, ci, b))
                n_ms += 1
        # do NOT flush here: the staged updates fold into the NEXT
        # frame's fused dispatch (one fewer upload+dispatch RPC pair per
        # frame over the serialised tunnel); record which frame's signs
        # they index so the fold gathers from the right array
        self._staged_signs_dev = stacked["signs"]
        return frames, {
            "num_matched": n_matched, "num_motion_stereo": n_ms,
            "num_ff": n_ff,
            "ransac_inliers": n_inl, "ransac_ok": ransac_ok,
            "rotation_only_frac": rot_frac,
            "extra": extra_np,
        }

    def fetch_signs(self, frames):
        """Blocking fetch of this frame's descriptors (keyframes only:
        place recognition, loop verification and map export need host
        copies). Fetches the BIT-PACKED uint32 form (64 KB instead of
        2 MB of ±1 floats — the tunnel charges for bytes beyond the
        fixed RTT) and unpacks to the ±1 convention on host. Also
        resolves the staged lm_descriptors updates."""
        stacked = frames[0]["stacked"]
        packed = np.asarray(stacked["signs_packed"])  # [NC,N,B//32]
        stage = self._desc_stage
        self._desc_stage = []
        return self._apply_fetched_signs(frames, packed, stage)

    def _apply_fetched_signs(self, frames, packed, desc_stage):
        """Host half of the descriptor fetch: unpack the bit-packed
        uint32 form and resolve staged lm_descriptors host copies."""
        NC, N = packed.shape[0], packed.shape[1]
        bits = (
            (packed[..., None] >> np.arange(32, dtype=np.uint32)) & 1
        ).reshape(NC, N, -1)
        signs_np = np.where(bits > 0, 1.0, -1.0).astype(np.float32)
        # masked-out keypoints have all-zero sign rows in the float form
        for ci, fr in enumerate(frames):
            signs_np[ci] *= np.asarray(
                fr["mask"], np.float32
            )[:, None]
            fr["signs_np"] = signs_np[ci]
        for (lid, ci, kp) in desc_stage:
            if kp < signs_np.shape[1]:
                self._remember_descriptor(lid, signs_np[ci, kp])
        return signs_np

    def dispatch_keyframe_extras(self, estimator: Estimator, frames,
                                 sid: int):
        """Start a keyframe's device work WITHOUT blocking (pipelined
        loop): the bit-packed descriptor fetch (place recognition, loop
        verification, map export) and the all-pairs static-stereo
        program. Both host syncs (~45 ms of pure latency each on the
        tunnel) cross in ONE background thread; finish_keyframe_extras
        consumes them a frame later. Returns the pending dict."""
        import threading

        stacked = frames[0]["stacked"]
        stereo = self._dispatch_static_stereo(estimator, frames, sid)
        pend = {
            "sid": sid,
            "frames": frames,
            "stereo": stereo,
            "signs_shape": tuple(stacked["signs_packed"].shape),
            # entries staged by THIS frame's finish_frame; the list
            # resets at the next finish, so snapshot now
            "desc_stage": self._desc_stage,
        }
        self._desc_stage = []
        # fuse both outputs into ONE device array so the background
        # thread pays a single tunnel readback (each fetch RPC costs
        # ~30-60 ms regardless of size; a pytree fetch pays per leaf)
        if stereo is not None:
            combined = _pack_kf_fetch(stacked["signs_packed"],
                                      stereo["out"])
        else:
            combined = None
        fut = {}

        def _fetch(f=fut):
            try:
                if combined is not None:
                    f["combined"] = np.asarray(combined)
                else:
                    f["signs_packed"] = np.asarray(
                        stacked["signs_packed"]
                    )
            except Exception as e:  # surfaced at join time
                f["err"] = e

        th = threading.Thread(target=_fetch, daemon=True)
        th.start()
        pend["fetch"] = (th, fut)
        return pend

    def finish_keyframe_extras(self, estimator: Estimator, pend):
        """Consume a keyframe's deferred device outputs: descriptor
        unpack + staged host copies, static-stereo landmark insertion,
        keyframe store. Returns the number of stereo-initialised
        landmarks."""
        th, fut = pend["fetch"]
        th.join()
        if "err" in fut:
            raise fut["err"]
        frames, sid = pend["frames"], pend["sid"]
        stereo_fetched = None
        if "combined" in fut:
            signs_packed, stereo_flat = _unpack_kf_fetch(
                fut["combined"], pend["signs_shape"]
            )
            stereo_fetched = _decode_stereo_flat(
                stereo_flat, len(pend["stereo"]["pairs"]),
                pend["stereo"]["N"],
            )
        else:
            signs_packed = fut["signs_packed"]
        self._apply_fetched_signs(
            frames, signs_packed, pend["desc_stage"]
        )
        n_new = 0
        if stereo_fetched is not None:
            n_new = self._insert_static_stereo(
                estimator, frames, sid, pend["stereo"], stereo_fetched
            )
        self.remember_keyframe_frames(sid, frames)
        return n_new

    # ------------------------------------------------------------------
    def _flush_staged(self):
        """Apply descriptor updates still staged for the fused fold
        (their source signs were recorded when they were staged) — call
        before any direct read of the device table outside the fused
        program. Pending clears don't need this: dead slots are already
        gated host-side via lm_mask/slot_of."""
        t = self.table
        src = getattr(self, "_staged_signs_dev", None)
        if t._upd and src is not None:
            t.flush(src)
            self._staged_signs_dev = None

    def _remember_descriptor(self, lid: int, signs: np.ndarray):
        """Record a landmark's descriptor: latest view in lm_descriptors
        and up to 3 DISTINCT variants (bit-packed) in lm_desc_sets for
        loop-closure verification. Near-duplicates (< 16 of 512 bits
        apart) don't displace an existing variant — diversity over
        recency, as measured by the 3-vs-1 descriptor recall A/B
        (tests/test_descriptor_recall.py)."""
        signs = np.asarray(signs)
        self.lm_descriptors[lid] = signs
        packed = np.packbits(signs > 0)
        sets = self.lm_desc_sets.get(lid)
        if sets is None:
            self.lm_desc_sets[lid] = [packed]
            return
        for p in sets:
            if int(np.unpackbits(p ^ packed).sum()) < 16:
                return
        if len(sets) < 3:
            sets.append(packed)
        else:
            # keep the oldest (first-seen view) + the two newest variants
            sets[1] = sets[2]
            sets[2] = packed

    def _sync_table(self, estimator: Estimator):
        """Free table slots of landmarks that no longer exist."""
        dead = [
            lid for lid in self.table.slot_of
            if lid not in estimator.landmarks
        ]
        for lid in dead:
            self.table.release(lid)
            self.lm_descriptors.pop(lid, None)
            self.lm_desc_sets.pop(lid, None)

    def match_to_map(
        self,
        estimator: Estimator,
        frames,
        sid: int,
        T_WS_pred7: np.ndarray,
    ) -> dict:
        """Fused matchToMap + runRansac3d2d: one device dispatch, then
        insert only RANSAC-surviving observations (the reference adds
        then removes — Frontend.cpp:1388-1432; same net effect)."""
        cfg = self.cfg
        self._sync_table(estimator)
        # this path reads the device table directly — apply updates the
        # next fused dispatch hasn't folded yet
        self._flush_staged()
        table = self.table
        stacked = frames[0]["stacked"]
        if not table.slot_of:
            return {"num_matched": 0, "matched_kp": {}}
        table.ensure(
            stacked["signs"].shape[-1], stacked["signs"].dtype
        )

        cap = table.capacity
        hp = np.zeros((cap, 4))
        hp[:, 3] = 1.0
        lm_mask = np.zeros(cap, bool)
        lm_init = np.zeros(cap, bool)
        for lid, s in table.slot_of.items():
            lm = estimator.landmarks.get(lid)
            if lm is None:
                continue
            hp[s] = lm.hp_W
            lm_mask[s] = True
            lm_init[s] = lm.initialised

        dtype = stacked["signs"].dtype
        idx, ok, keep, n_inl, ransac_ok = _associate_device(
            self.cameras,
            self._next_key(),
            jnp.asarray(T_WS_pred7, dtype),
            jnp.asarray(np.stack(self.T_SC_np), dtype),
            jnp.asarray(hp, dtype),
            jnp.asarray(lm_mask),
            jnp.asarray(lm_init),
            table.signs,
            table.valid,
            stacked["xy"],
            stacked["mask"],
            stacked["signs"],
            jnp.asarray(cfg.map_match_radius, dtype),
            jnp.asarray(cfg.ransac_threshold_deg, dtype),
            cfg.matching_threshold,
            cfg.ransac_hypotheses,
            cfg.ransac_min_inliers,
            cfg.use_ransac,
        )
        idx, keep, n_inl, ransac_ok = jax.device_get(
            (idx, keep, n_inl, ransac_ok)
        )
        self.last_ransac = {
            "num_inliers": int(n_inl), "ok": bool(ransac_ok)
        }

        n_matched_total = 0
        matched_kp: Dict[int, list] = {}
        for ci in range(len(self.cameras)):
            fr = frames[ci]
            for s in np.nonzero(keep[ci])[0]:
                lid = table.lid_of.get(int(s))
                if lid is None:
                    continue
                kp = int(idx[ci][s])
                estimator.add_observation(
                    lid, sid, ci, kp, fr["xy"][kp], fr["size"][kp]
                )
                self._remember_descriptor(lid, fr["signs_np"][kp])
                table.stage_descriptor(lid, ci, kp)
                matched_kp.setdefault(ci, []).append(kp)
                n_matched_total += 1
        table.flush(stacked["signs"])
        return {"num_matched": n_matched_total, "matched_kp": matched_kp}

    # ------------------------------------------------------------------
    def ransac_3d2d(self, estimator: Estimator, sid: int, frames,
                    T_WS_pred) -> int:
        """Kept for API parity: outlier rejection now happens inside the
        fused match_to_map dispatch (RANSAC-surviving observations are
        the only ones inserted), so there is nothing left to remove."""
        return 0

    # ------------------------------------------------------------------
    def _overlapping_pairs(self):
        """Camera pairs with FoV overlap (NCameraSystem::computeOverlaps
        role; all-pairs generalisation of matchStereo,
        Frontend.cpp:1981-2150)."""
        pairs = getattr(self, "_overlap_pairs", None)
        if pairs is None:
            from okvis2_tpu.cameras.ncamera import NCameraSystem

            nc = len(self.cameras)
            if nc == 2:
                pairs = [(0, 1)]
            else:
                try:
                    rig = NCameraSystem(
                        list(self.cameras), list(self.extrinsics)
                    )
                    pairs = [
                        (i, j) for i in range(nc) for j in range(i + 1, nc)
                        if rig.has_overlap(i, j)
                    ]
                except Exception:
                    pairs = [
                        (i, j) for i in range(nc) for j in range(i + 1, nc)
                    ]
            self._overlap_pairs = pairs
        return pairs

    def match_stereo(self, estimator: Estimator, frames, sid: int):
        """Static-stereo initialisation of new landmarks across ALL
        overlapping camera pairs (matchStereo, Frontend.cpp:1981-2150).

        All pairs run in ONE device dispatch with one readback (the old
        per-pair loop paid a serialised tunnel roundtrip per pair); the
        pair-order keypoint consumption the reference gets from its
        sequential matching is reproduced by a host-side dedup over the
        batched results. Synchronous wrapper; the pipelined loop splits
        into dispatch_keyframe_extras / finish_keyframe_extras."""
        pend = self._dispatch_static_stereo(estimator, frames, sid)
        if pend is None:
            return 0
        fetched = _decode_stereo_flat(
            jax.device_get(pend["out"]), len(pend["pairs"]), pend["N"]
        )
        return self._insert_static_stereo(
            estimator, frames, sid, pend, fetched
        )

    def _dispatch_static_stereo(self, estimator: Estimator, frames,
                                sid: int):
        """Host prep + device dispatch of the all-pairs static-stereo
        program; NO readback. Returns {"out": device handles, "pairs"}
        or None when the rig has no overlapping pairs."""
        cfg = self.cfg
        if len(self.cameras) < 2:
            return None
        pairs = tuple(self._overlapping_pairs())
        if not pairs:
            return None
        rec = estimator.states[sid]
        stacked = frames[0]["stacked"]
        dtype = np.float32
        free = np.stack([np.asarray(f["mask"], bool) for f in frames])
        N = free.shape[1]
        for (_l, c, kp) in estimator.obs_of_state(sid):
            if kp < N:
                free[c, kp] = False
        P = len(pairs)
        aux = np.zeros(P * 14 + P + 2 + 2 * P * N, dtype)
        o = 0
        for p, (ci, cj) in enumerate(pairs):
            aux[o + p * 7:o + p * 7 + 7] = se3_np.compose7(
                rec.pose, self.T_SC_np[ci]
            )
            aux[o + (P + p) * 7:o + (P + p) * 7 + 7] = se3_np.compose7(
                rec.pose, self.T_SC_np[cj]
            )
            f0 = float(np.asarray(self.cameras[ci].focal).ravel()[0])
            aux[o + 14 * P + p] = cfg.stereo_epipolar_gate / f0
        o += 15 * P
        aux[o] = cfg.min_depth
        aux[o + 1] = cfg.max_depth
        o += 2
        for p, (ci, cj) in enumerate(pairs):
            aux[o + p * N:o + (p + 1) * N] = free[ci]
            aux[o + (P + p) * N:o + (P + p + 1) * N] = free[cj]
        out = _stereo_pairs_device(
            self.cameras, jnp.asarray(aux),
            stacked["xy"], stacked["signs"],
            pairs, cfg.matching_threshold, True,
        )
        return {"out": out, "pairs": pairs, "N": N}

    def _insert_static_stereo(self, estimator: Estimator, frames,
                              sid: int, pend, fetched):
        """Host half of static stereo: insert the fetched pair matches
        as new landmarks + observations. The keypoint-consumption dedup
        runs against the observations AS OF NOW, so matches that
        arrived between dispatch and this (possibly deferred) insertion
        can't double-host a keypoint."""
        stacked = frames[0]["stacked"]
        idx_b, hp_W, good, parallel = fetched
        pairs = pend["pairs"]
        used = {
            (c, kp) for (_l, c, kp) in estimator.obs_of_state(sid)
        }
        n_new = 0
        for p, (ci, cj) in enumerate(pairs):
            fa, fb = frames[ci], frames[cj]
            for a in np.nonzero(good[p])[0]:
                a = int(a)
                b = int(idx_b[p][a])
                # sequential-pair semantics: a keypoint consumed by an
                # earlier pair cannot seed another landmark
                if (ci, a) in used or (cj, b) in used:
                    continue
                used.add((ci, a))
                used.add((cj, b))
                lid = estimator.add_landmark(
                    hp_W[p][a], initialised=not parallel[p][a]
                )
                estimator.add_observation(
                    lid, sid, ci, a, fa["xy"][a], fa["size"][a]
                )
                estimator.add_observation(
                    lid, sid, cj, b, fb["xy"][b], fb["size"][b]
                )
                if "signs_np" in fa:
                    self._remember_descriptor(lid, fa["signs_np"][a])
                self.table.stage_descriptor(lid, ci, a)
                n_new += 1
        self.table.flush(stacked["signs"])
        return n_new

    # ------------------------------------------------------------------
    def match_motion_stereo(self, estimator: Estimator, frames, sid: int):
        """Temporal landmark initialisation against the last keyframe
        (matchMotionStereo, Frontend.cpp:1733-1978)."""
        cfg = self.cfg
        kf_id = self.last_keyframe_id
        if kf_id is None or kf_id == sid:
            return 0
        kf_frames = getattr(self, "_kf_frames", None)
        if kf_frames is None or self._kf_frames_id != kf_id:
            return 0
        rec_new = estimator.states[sid]
        rec_kf = estimator.states[kf_id]
        used_new = {
            (c, kp) for (_l, c, kp) in estimator.obs_of_state(sid)
        }
        used_kf = {
            (c, kp) for (_l, c, kp) in estimator.obs_of_state(kf_id)
        }
        n_new = 0
        for ci, cam in enumerate(self.cameras):
            fa = kf_frames[ci]
            fb = frames[ci]
            T_WA7 = se3_np.compose7(rec_kf.pose, self.T_SC_np[ci])
            T_WB7 = se3_np.compose7(rec_new.pose, self.T_SC_np[ci])
            baseline = np.linalg.norm(T_WB7[:3] - T_WA7[:3])
            if baseline < 0.02:  # no parallax yet
                continue
            free_a = fa["mask"].copy()
            for (c, kp) in used_kf:
                if c == ci and kp < len(free_a):
                    free_a[kp] = False
            free_b = fb["mask"].copy()
            for (c, kp) in used_new:
                if c == ci and kp < len(free_b):
                    free_b[kp] = False
            dtype = fb["stacked"]["signs"].dtype
            f0 = float(np.asarray(cam.focal).ravel()[0])
            # keyframe descriptors live in the OLD stacked arrays; pass
            # both frames' stacks? motion stereo matches old-frame cam ci
            # against new-frame cam ci: concatenate stacks would recompile
            # on the pair; instead index both from their own stacks
            idx_b, hp_W, good, parallel = _stereo_motion_device(
                cam,
                jnp.asarray(T_WA7, dtype), jnp.asarray(T_WB7, dtype),
                fa["stacked"]["xy"], fa["stacked"]["signs"],
                fb["stacked"]["xy"], fb["stacked"]["signs"],
                jnp.asarray(free_a), jnp.asarray(free_b),
                jnp.asarray(cfg.stereo_epipolar_gate / f0, dtype),
                jnp.asarray(cfg.min_depth, dtype),
                jnp.asarray(cfg.max_depth, dtype),
                ci, cfg.matching_threshold,
            )
            hp_W, good, idx_b = jax.device_get((hp_W, good, idx_b))
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
                self._remember_descriptor(lid, fb["signs_np"][b])
                self.table.stage_descriptor(lid, ci, b)
                n_new += 1
        if n_new:
            self.table.flush(frames[0]["stacked"]["signs"])
        return n_new

    def remember_keyframe_frames(self, sid: int, frames):
        """Store a keyframe's detection output (host xy/size/mask +
        device-resident stacked arrays) for motion-stereo matching; the
        store keeps every window keyframe so motion stereo can match the
        top-K by overlap, evicting frames that left the window."""
        store = getattr(self, "_kf_store", None)
        if store is None:
            store = {}
            self._kf_store = store
        store[sid] = frames
        # legacy single-keyframe attributes (non-fused path + tests)
        self._kf_frames = frames
        self._kf_frames_id = sid
        # evict beyond a small multiple of the match depth, oldest first
        cap = max(2 * self.cfg.motion_stereo_keyframes, 8)
        for old in sorted(store)[:-cap]:
            del store[old]

    def _rank_keyframes_by_overlap(
        self, estimator: Estimator, T_WS_pred7, sid: int,
        hp: np.ndarray, lm_mask: np.ndarray, top_k: int,
    ):
        """Rank stored keyframes by predicted view overlap with the
        current frame: the count of map landmarks inside BOTH cam0
        frusta (numpy proxy of the reference's projected-keypoint
        overlapFraction, ViSlamBackend.cpp:2341+). Returns up to top_k
        keyframe ids, best first."""
        store = getattr(self, "_kf_store", {})
        cand = [
            s for s in store
            if s != sid and s in estimator.states
        ]
        if not cand:
            return []
        pts = hp[:, :3][lm_mask]
        if len(pts) < 8:
            # too few map points to rank: fall back to most recent
            return sorted(cand)[-top_k:][::-1]
        cam0 = self.cameras[0]
        fx = float(np.asarray(cam0.focal).ravel()[0])
        half_w = (cam0.width * 0.5) / fx * 1.2
        half_h = (cam0.height * 0.5) / fx * 1.2

        def visible(pose7):
            T_WC = se3_np.compose7(pose7, self.T_SC_np[0])
            R = se3_np.quat_to_mat(T_WC[3:7])
            pc = (pts - T_WC[:3]) @ R  # world -> camera
            z = pc[:, 2]
            return (
                (z > 0.2)
                & (np.abs(pc[:, 0]) < half_w * z)
                & (np.abs(pc[:, 1]) < half_h * z)
            )

        cur = visible(np.asarray(T_WS_pred7))
        scored = sorted(
            (
                (int((visible(estimator.states[s].pose) & cur).sum()), s)
                for s in cand
            ),
            reverse=True,
        )
        top = [s for n, s in scored[:top_k] if n > 0]
        if not top:
            top = [max(cand)]
        return top

    # ------------------------------------------------------------------
    def _disk_offsets(self, r: int) -> np.ndarray:
        cache = getattr(self, "_disk_offs_cache", None)
        if cache is None:
            cache = {}
            self._disk_offs_cache = cache
        offs = cache.get(r)
        if offs is None:
            g = np.arange(-r, r + 1)
            dx, dy = np.meshgrid(g, g)
            m = dx * dx + dy * dy <= r * r
            offs = np.stack([dx[m], dy[m]], axis=-1)  # [(dx,dy)]
            cache[r] = offs
        return offs

    def _coverage_iou(self, ci: int, xy: np.ndarray, det_idx, match_idx):
        """Painted-disk coverage on a 1/10-scale mask: disks of radius
        0.09*min(rows,cols) stamped at keypoint/10 positions, then the
        IoU of the matched disks vs all detection disks — the
        cv::circle + bitwise_and/or scheme of doWeNeedANewKeyframe
        (Frontend.cpp:1072-1103). Returns (intersection, union) pixel
        counts."""
        cam = self.cameras[ci]
        rows, cols = max(cam.height // 10, 1), max(cam.width // 10, 1)
        offs = self._disk_offsets(max(int(min(rows, cols) * 0.09), 1))

        def paint(idx):
            mask = np.zeros((rows, cols), bool)
            idx = np.asarray(list(idx), np.int64)
            if len(idx) == 0:
                return mask
            c = (np.asarray(xy)[idx] * 0.1).astype(np.int64)  # [n,2] x,y
            pix = c[:, None, :] + offs[None]  # [n,D,2]
            x = np.clip(pix[..., 0], 0, cols - 1).ravel()
            y = np.clip(pix[..., 1], 0, rows - 1).ravel()
            mask[y, x] = True
            return mask

        det = paint(det_idx)
        mat = paint(match_idx)
        return int((mat & det).sum()), int((mat | det).sum())

    def need_new_keyframe(self, estimator: Estimator, frames, sid: int) -> bool:
        """Keyframe heuristic (doWeNeedANewKeyframe,
        Frontend.cpp:1057-1167): painted-disk coverage IoU of the
        matched keypoints vs ALL detections — for the current frame AND
        for every stored window keyframe (its keypoints hosting
        landmarks co-observed now, vs its detections); decide on the
        MIN of the two. A convex-hull area ratio is NOT a substitute:
        hulls span the holes, so a decaying match density kept
        reporting >0.6 'overlap' while the textured drive drifted 30
        frames without a keyframe (r4 regression). The matched/detected
        count ratio is kept as a safety net (round-2 lesson: coverage
        starvation on keypoint-sparse scenes)."""
        cfg = self.cfg
        if self.last_keyframe_id is None:
            return True
        obs_sid = list(estimator.obs_of_state(sid))
        cur_lids = {l for (l, _c, _k) in obs_sid}
        best_ratio = 0.0
        inter = union = 0
        n_kp_total = 0
        for ci, fr in enumerate(frames):
            det_idx = np.nonzero(np.asarray(fr["mask"], bool))[0]
            n_kp_total += len(det_idx)
            match_idx = [kp for (_l, c, kp) in obs_sid if c == ci]
            if len(det_idx):
                best_ratio = max(best_ratio,
                                 len(match_idx) / len(det_idx))
            i, u = self._coverage_iou(ci, fr["xy"], det_idx, match_idx)
            inter += i
            union += u
        overlap = inter / union if union else 0.0
        # ... and seen FROM the stored keyframes (how much of each
        # keyframe's view is still co-observed): moving away from every
        # keyframe shrinks this even while the current frame still
        # matches plenty (Frontend.cpp:1106-1156)
        store = getattr(self, "_kf_store", {})
        overlap_others = 0.0
        for s, kf_frames in store.items():
            if s == sid or s not in estimator.states:
                continue
            obs_k = list(estimator.obs_of_state(s))
            i_k = u_k = 0
            for ci, fr in enumerate(kf_frames):
                det_idx = np.nonzero(np.asarray(fr["mask"], bool))[0]
                match_idx = [kp for (l, c, kp) in obs_k
                             if c == ci and l in cur_lids]
                i, u = self._coverage_iou(ci, fr["xy"], det_idx,
                                          match_idx)
                i_k += i
                u_k += u
            if u_k:
                overlap_others = max(overlap_others, i_k / u_k)
        overlap = min(overlap, overlap_others)
        if n_kp_total < 7 * len(frames):
            return False  # a respectable keyframe needs detections
        return (overlap < cfg.keyframe_overlap_threshold
                or best_ratio < cfg.keyframe_matching_ratio)

    # ------------------------------------------------------------------
    def tracking_quality(self, estimator: Estimator, frames, sid: int) -> float:
        """Fraction of detection-covered cells with matches (trackingQuality
        analogue, ViSlamBackend.cpp:157-197)."""
        g = self.cfg.keyframe_grid
        total = 0
        matched_cells = set()
        obs_sid = estimator.obs_of_state(sid)
        for ci, fr in enumerate(frames):
            W, H = self.cameras[ci].width, self.cameras[ci].height
            matched = {kp for (_l, c, kp) in obs_sid if c == ci}
            for kp in matched:
                x, y = fr["xy"][kp]
                matched_cells.add((ci, int(x * g / W), int(y * g / H)))
            total += g * g
        return len(matched_cells) / max(total, 1)


@functools.partial(
    jax.jit, static_argnames=("ci", "max_distance")
)
def _stereo_motion_device(
    cam,
    T_WA7: jnp.ndarray,
    T_WB7: jnp.ndarray,
    xy_a_all: jnp.ndarray,  # [NC,N,2] OLD keyframe stack
    signs_a_all: jnp.ndarray,
    xy_b_all: jnp.ndarray,  # [NC,N,2] NEW frame stack
    signs_b_all: jnp.ndarray,
    free_a: jnp.ndarray,
    free_b: jnp.ndarray,
    epi_gate: jnp.ndarray,
    min_depth: jnp.ndarray,
    max_depth: jnp.ndarray,
    ci: int,
    max_distance: int,
):
    """Motion stereo: same camera across time (old keyframe vs now)."""
    xy_a, xy_b = xy_a_all[ci], xy_b_all[ci]
    signs_a, signs_b = signs_a_all[ci], signs_b_all[ci]
    T_WA = Transformation(r=T_WA7[:3], q=T_WA7[3:7])
    T_WB = Transformation(r=T_WB7[:3], q=T_WB7[3:7])
    rays_a = cam.back_project(xy_a)
    rays_b = cam.back_project(xy_b)
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
    good = m["valid"] & valid_t & ~parallel & depth_ok
    return m["idx_b"], hp_W, good, parallel


