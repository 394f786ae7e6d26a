"""Offline final bundle adjustment.

Covers okvis::ViSlamBackend::doFinalBa (reference: okvis_ceres/src/
ViSlamBackend.cpp:1759-1892): expand ALL pose-graph edges back into their
original reprojection observations (TwoPoseGraphError::
convertToReprojectionErrors — the edges stored them, PoseGraphEdge.
stored_obs), unfreeze every state, and solve the complete problem —
optionally sharded over a device mesh for large sessions
(parallel/sharded_ba.py), which is the multi-chip scaling story the
CPU reference cannot have.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.graph.estimator import Estimator
from okvis2_tpu.solver.gauss_newton import solve_window
from okvis2_tpu.solver.window_problem import SolverConfig, WindowProblem


def convert_edges_to_observations(estimator: Estimator):
    """Reverse marginalisation: re-insert the stored observations of every
    'marg' pose-graph edge and drop the edge
    (ViGraphEstimator::convertToObservations, ViGraphEstimator.cpp:758-835).
    Loop-closure edges are kept (they have no stored observations)."""
    kept = []
    n_restored = 0
    for e in estimator.pose_graph_edges:
        if e.kind == "marg" and e.stored_obs:
            for (lid, sid, ci, kp, u, v, size) in e.stored_obs:
                if lid in estimator.landmarks and sid in estimator.states:
                    estimator.landmarks[lid].obs[(sid, ci, kp)] = (u, v, size)
                    n_restored += 1
        else:
            kept.append(e)
    estimator.pose_graph_edges = kept
    estimator._obs_rev = getattr(estimator, "_obs_rev", 0) + 1
    return n_restored


def _pow2_at_least(n: int, floor: int) -> int:
    s = floor
    while s < n:
        s *= 2
    return s


def pack_full_ba_problem(
    estimator: Estimator,
    max_states: int = 0,
    max_landmarks: int = 8192,
    max_obs: int = 65536,
    rel_slots: int = 256,
):
    """Pack the entire session into one big problem: every state, every
    landmark with >=2 observations, all IMU chain links, remaining
    (loop-closure) relative edges. Everything unfrozen except the gauge
    prior on the first state. State capacity grows in powers of two with
    the session (no silent truncation — the reference's full graph is
    unbounded); `max_states` > 0 restores an explicit cap."""
    ids = [s for s in estimator.state_order if len(
        estimator.states[s].imu_dt) or s == estimator.state_order[0]]
    if max_states:
        if len(ids) > max_states:
            import warnings

            warnings.warn(
                f"final BA truncating {len(ids) - max_states} oldest "
                f"states (max_states={max_states})"
            )
        ids = ids[-max_states:]
        S = max_states
    else:
        S = _pow2_at_least(max(len(ids), 2), 32)
    slot_of = {s: i for i, s in enumerate(ids)}

    prob = WindowProblem.empty(
        S, max_landmarks, max_obs, len(estimator.cameras),
        estimator.cfg.imu_seg_capacity, num_rel=rel_slots,
    )
    pose = np.array(prob.pose)
    sb = np.array(prob.speed_bias)
    smask = np.zeros(S, bool)
    for s, i in slot_of.items():
        rec = estimator.states[s]
        pose[i] = rec.pose
        sb[i] = rec.speed_bias
        smask[i] = True

    # landmarks with >= 2 observations among packed states
    lm_ids = []
    for lid, lm in estimator.landmarks.items():
        n = sum(1 for (s, _, _) in lm.obs if s in slot_of)
        if n >= 2:
            lm_ids.append(lid)
    lm_ids = lm_ids[:max_landmarks]
    lm_slot = {lid: i for i, lid in enumerate(lm_ids)}
    lms = np.array(prob.landmarks)
    lmask = np.zeros(max_landmarks, bool)
    for lid, i in lm_slot.items():
        lms[i] = estimator.landmarks[lid].hp_W
        lmask[i] = True

    o_state = np.zeros(max_obs, np.int32)
    o_cam = np.zeros(max_obs, np.int32)
    o_lm = np.zeros(max_obs, np.int32)
    o_uv = np.zeros((max_obs, 2))
    o_w = np.ones(max_obs)
    o_mask = np.zeros(max_obs, bool)
    k = 0
    for lid in lm_ids:
        lm = estimator.landmarks[lid]
        w_scale = float(np.sqrt(lm.info_scale))
        for (sid, ci, _kp), (u, v, size) in lm.obs.items():
            if sid in slot_of and k < max_obs:
                o_state[k] = slot_of[sid]
                o_cam[k] = ci
                o_lm[k] = lm_slot[lid]
                o_uv[k] = (u, v)
                o_w[k] = 8.0 / size * w_scale
                o_mask[k] = True
                k += 1

    imu_pre = jax.tree_util.tree_map(np.array, prob.imu_pre)
    imu_mask = np.zeros(S - 1, bool)
    for i in range(len(ids) - 1):
        nxt = estimator.states[ids[i + 1]]
        # chain-adjacency check: the buffer on ids[i+1] must span exactly
        # ids[i] -> ids[i+1] (eliminated frames cleared their buffers, so
        # with intact chaining this always holds; a reinitialisation gap
        # is masked off instead of double-integrated)
        if len(nxt.imu_dt) and nxt.imu_from == ids[i]:
            pre = estimator._get_preintegrated(ids[i + 1])
            imu_pre = jax.tree_util.tree_map(
                lambda full, one: _set_row(full, i, one), imu_pre, pre
            )
            imu_mask[i] = True

    R = rel_slots
    r_i = np.zeros(R, np.int32)
    r_j = np.zeros(R, np.int32)
    r_T = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (R, 1))
    r_sq = np.zeros((R, 6, 6))
    r_m = np.zeros(R, bool)
    kk = 0
    for e in estimator.pose_graph_edges:
        if e.id_i in slot_of and e.id_j in slot_of and kk < R:
            r_i[kk] = slot_of[e.id_i]
            r_j[kk] = slot_of[e.id_j]
            r_T[kk] = e.T_ij
            r_sq[kk] = e.sqrt_info
            r_m[kk] = True
            kk += 1

    pp_T = np.array(prob.pose_prior)
    pp_sq = np.zeros((S, 6, 6))
    pp_m = np.zeros(S, bool)
    pp_T[0] = pose[0]
    pp_sq[0] = np.eye(6) * 1e4
    pp_m[0] = True

    prob = dataclasses.replace(
        prob,
        pose=jnp.asarray(pose),
        speed_bias=jnp.asarray(sb),
        extrinsics=jnp.asarray(np.stack(estimator.T_SC)),
        landmarks=jnp.asarray(lms),
        state_mask=jnp.asarray(smask),
        lm_mask=jnp.asarray(lmask),
        obs_state=jnp.asarray(o_state),
        obs_cam=jnp.asarray(o_cam),
        obs_lm=jnp.asarray(o_lm),
        obs_uv=jnp.asarray(o_uv),
        obs_sqrt_info=jnp.asarray(o_w),
        obs_mask=jnp.asarray(o_mask),
        imu_pre=jax.tree_util.tree_map(jnp.asarray, imu_pre),
        imu_mask=jnp.asarray(imu_mask),
        pose_prior=jnp.asarray(pp_T),
        pose_prior_sqrt=jnp.asarray(pp_sq),
        pose_prior_mask=jnp.asarray(pp_m),
        rel_i=jnp.asarray(r_i),
        rel_j=jnp.asarray(r_j),
        rel_T=jnp.asarray(r_T),
        rel_sqrt=jnp.asarray(r_sq),
        rel_mask=jnp.asarray(r_m),
    )
    return prob, ids, slot_of, lm_ids


def do_final_ba(
    estimator: Estimator,
    iterations: int = 30,
    mesh=None,
    max_states: int = 0,
    max_landmarks: int = 8192,
    max_obs: int = 65536,
):
    """Expand, unfreeze, solve, write back. With `mesh`, the solve runs
    landmark-sharded across devices. max_states=0 = grow with session."""
    n_restored = convert_edges_to_observations(estimator)
    prob, ids, slot_of, lm_ids = pack_full_ba_problem(
        estimator, max_states, max_landmarks, max_obs
    )
    cfg = SolverConfig(max_iterations=iterations)
    if mesh is not None:
        from okvis2_tpu.parallel.sharded_ba import (
            shard_problem_by_landmark,
            solve_full_graph_sharded,
        )

        n = mesh.devices.size
        sh = shard_problem_by_landmark(prob, n)
        solved = solve_full_graph_sharded(
            sh, estimator.cameras, estimator.imu_params, mesh, cfg,
            n_iterations=iterations,
        )
        # landmark rows were re-ordered only by padding (block order kept)
        pose = np.asarray(solved.pose)
        sb = np.asarray(solved.speed_bias)
        lms = np.asarray(solved.landmarks)[: len(lm_ids)]
    else:
        solved, stats = solve_window(
            prob, estimator.cameras, estimator.imu_params, cfg
        )
        pose = np.asarray(solved.pose)
        sb = np.asarray(solved.speed_bias)
        lms = np.asarray(solved.landmarks)

    for s, i in slot_of.items():
        estimator.states[s].pose = pose[i]
        estimator.states[s].speed_bias = sb[i]
    for i, lid in enumerate(lm_ids):
        estimator.landmarks[lid].hp_W = lms[i]
    estimator._pre_cache.clear()
    info = {"restored_observations": n_restored, "states": len(ids),
            "landmarks": len(lm_ids)}
    if mesh is None:
        info.update(final_ba_diagnostics(
            solved, estimator.cameras, pose, sb, slot_of
        ))
    return info


def final_ba_diagnostics(solved, cameras, pose, sb, slot_of, grid: int = 12):
    """Final-BA observability (reference ViSlamBackend.cpp:1810-1881):
    per-camera reprojection-error heatmaps over an image grid, overall
    reprojection RMS in pixels, and gyro/accel bias statistics across
    the session."""
    import jax

    from okvis2_tpu.solver.gauss_newton import _reproj_residuals

    r_obs, m_obs = jax.jit(
        lambda p: _reproj_residuals(p, cameras)
    )(solved)
    r_obs, m_obs = jax.device_get((r_obs, m_obs))
    w = np.asarray(solved.obs_sqrt_info)
    uv = np.asarray(solved.obs_uv)
    cam_of = np.asarray(solved.obs_cam)
    # unwhiten to pixels
    err_px = np.linalg.norm(r_obs, axis=-1) / np.maximum(w, 1e-9)
    sel = np.asarray(m_obs)
    rms = float(np.sqrt(np.mean(err_px[sel] ** 2))) if sel.any() else 0.0
    heatmaps = []
    for ci, cam in enumerate(cameras):
        W = float(np.asarray(cam.width))
        H = float(np.asarray(cam.height))
        hm = np.zeros((grid, grid))
        cnt = np.zeros((grid, grid))
        s = sel & (cam_of == ci)
        gx = np.clip((uv[s, 0] / W * grid).astype(int), 0, grid - 1)
        gy = np.clip((uv[s, 1] / H * grid).astype(int), 0, grid - 1)
        np.add.at(hm, (gy, gx), err_px[s])
        np.add.at(cnt, (gy, gx), 1.0)
        heatmaps.append(hm / np.maximum(cnt, 1.0))
    # bias statistics over the packed states
    idxs = sorted(slot_of.values())
    bg = sb[idxs, 3:6]
    ba = sb[idxs, 6:9]
    return {
        "reproj_rms_px": rms,
        "reproj_heatmaps": np.stack(heatmaps),
        "bias_gyro_mean": bg.mean(axis=0),
        "bias_gyro_std": bg.std(axis=0),
        "bias_accel_mean": ba.mean(axis=0),
        "bias_accel_std": ba.std(axis=0),
    }


def _set_row(full: np.ndarray, i: int, one) -> np.ndarray:
    full = np.array(full)
    full[i] = np.asarray(one)
    return full
