"""End-to-end VIO regression on the synthetic dataset.

The system-level test the reference lacks (SURVEY.md §4): full pipeline
(detect -> describe -> match -> RANSAC -> sliding-window BA ->
marginalisation) on rendered frames with exact IMU, ATE-checked against
ground truth. Kept small so the suite stays tractable on CPU.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_synthetic_vio_ate():
    from okvis2_tpu.pipeline.synthetic_run import run_synthetic_vio

    res = run_synthetic_vio(duration=2.0, frame_rate=4.0)
    assert res["frames"] == 8
    assert np.isfinite(res["ate_rmse"])
    # aligned ATE within 10 cm on the short synthetic sequence
    assert res["ate_rmse"] < 0.10, f"ATE {res['ate_rmse']}"
    # the pipeline must actually build a map
    assert len(res["slam"].estimator.landmarks) > 50


@pytest.mark.slow
def test_pipelined_loop_matches_synchronous():
    """Phase B: the one-frame-lagged pipelined loop (device-side
    observation append, zero blocking readbacks) must produce the same
    trajectory as the synchronous path — the lag changes WHEN host
    bookkeeping happens, not WHAT the estimator computes."""
    from okvis2_tpu.pipeline.synthetic_run import run_synthetic_vio

    res_s = run_synthetic_vio(duration=2.0, frame_rate=5.0)
    res_p = run_synthetic_vio(duration=2.0, frame_rate=5.0,
                              pipelined=True)
    assert res_p["frames"] == res_s["frames"]
    assert res_p["ate_rmse"] < 0.10, res_p["ate_rmse"]
    # same trajectory within noise of the (different) solve schedules
    assert abs(res_p["ate_rmse"] - res_s["ate_rmse"]) < 0.02, (
        res_s["ate_rmse"], res_p["ate_rmse"]
    )
    # the pipelined run builds a comparable map
    n_s = len(res_s["slam"].estimator.landmarks)
    n_p = len(res_p["slam"].estimator.landmarks)
    assert n_p > 0.5 * n_s, (n_s, n_p)


@pytest.mark.slow
def test_pipelined_deep_lag_multiset_append():
    """Adaptive lag: with TWO frames permanently in flight (the tunnel
    regime — each [solve|diag] sync costs ~45 ms of latency), every
    fused solve must append the match rows of BOTH in-flight frames
    plus the current one on device. Forced via the _force_min_pending
    test hook; the trajectory must stay close to the synchronous
    path's."""
    from okvis2_tpu.pipeline.synthetic_run import run_synthetic_vio

    res_s = run_synthetic_vio(duration=2.0, frame_rate=5.0)
    res_p = run_synthetic_vio(duration=2.0, frame_rate=5.0,
                              pipelined=True, force_min_pending=2)
    assert res_p["frames"] == res_s["frames"]
    assert res_p["ate_rmse"] < 0.10, res_p["ate_rmse"]
    assert abs(res_p["ate_rmse"] - res_s["ate_rmse"]) < 0.03, (
        res_s["ate_rmse"], res_p["ate_rmse"]
    )
    n_s = len(res_s["slam"].estimator.landmarks)
    n_p = len(res_p["slam"].estimator.landmarks)
    assert n_p > 0.5 * n_s, (n_s, n_p)


@pytest.mark.slow
def test_pipelined_parity_pose_by_pose():
    """Deterministic structural parity (not ATE-blurred): (a) two
    identical pipelined runs with forced deep lag must agree pose-by-
    pose to float determinism — catches fetch-thread ordering races;
    (b) after drain, forcing DEEP lag must track the natural-lag
    pipelined trajectory state-by-state within a tight bound — lag
    depth must change WHEN bookkeeping happens, not WHAT the estimator
    computes (the join discipline of ThreadedSlam.cpp:466-469). The
    sync loop is NOT the reference here: the pipelined loop runs
    genuinely different math (frame-to-frame continuity matching,
    lagged solve application) and measurably diverges from it pose-by-
    pose (~4 cm over this fixture, with BETTER ATE) even at natural
    lag; sync-vs-pipelined accuracy parity is covered statistically by
    test_pipelined_loop_matches_synchronous. (c) deep lag must build
    the same per-state observation counts as natural lag within a
    small delta (device-appended match rows all land after drain)."""
    from okvis2_tpu.pipeline.synthetic_run import run_synthetic_vio

    kw = dict(duration=2.0, frame_rate=5.0)
    res_p1 = run_synthetic_vio(pipelined=True, force_min_pending=2, **kw)
    res_p2 = run_synthetic_vio(pipelined=True, force_min_pending=2, **kw)
    tr1, tr2 = res_p1["est_traj"], res_p2["est_traj"]
    assert len(tr1) == len(tr2)
    for (t1, p1), (t2, p2) in zip(tr1, tr2):
        assert t1 == t2
        # identical inputs + identical schedule => identical math; the
        # background fetch threads must not change results
        assert np.allclose(p1, p2, atol=1e-12), (t1, p1 - p2)

    res_s = run_synthetic_vio(pipelined=True, **kw)
    tr_s = res_s["est_traj"]
    assert len(tr1) == len(tr_s)
    # split by state kind: DIRECTLY-estimated states (keyframes /
    # pose-graph / still-in-window) are bounded tightly — ordering bugs
    # move them an order of magnitude more than the measured ~2.3 cm
    # lag-rescheduling transient. ANCHORED history states (eliminated
    # IMU frames, recomposed through their keyframe anchor like
    # okvis::Trajectory) get a loose bound: lag depth legitimately
    # changes WHICH keyframe a state anchors to (keyframe selection
    # differs with lag), and the anchor difference compounds with the
    # startup transient on this tiny fixture (measured ~0.1 m).
    e1 = res_p1["slam"].estimator
    dps, dps_anch = [], []
    for s, (_t, p1), (_t2, ps) in zip(e1.state_order, tr1, tr_s):
        d = float(np.linalg.norm(p1[:3] - ps[:3]))
        if e1.states[s].anchor_id is not None:
            dps_anch.append(d)
        else:
            dps.append(d)
    assert max(dps) < 0.035, f"pose-by-pose divergence {max(dps)}"
    assert dps[-1] < 0.02, f"steady-state divergence {dps[-1]}"
    if dps_anch:
        assert max(dps_anch) < 0.2, (
            f"anchored-state divergence {max(dps_anch)}"
        )

    # observation volume: the device-appended match rows of every
    # in-flight frame must land as host observations after drain.
    # Compare CUMULATIVE INSERTIONS, not the surviving graph: lag depth
    # legitimately changes keyframe selection (stale-table recall is
    # lower, so coverage drops and more keyframes fire), and keyframe →
    # pose-graph conversion strips surviving obs — but a lost append
    # set removes whole frames' insertions (measured: 1700 vs 1667
    # inserted across lag depths, i.e. ~2%; one lost set would cost
    # ~8%+ of the total)
    est_p, est_s = res_p1["slam"].estimator, res_s["slam"].estimator
    assert est_p.n_obs_inserted > 0.9 * est_s.n_obs_inserted, (
        est_s.n_obs_inserted, est_p.n_obs_inserted
    )
    # and the keyframes both runs agree on must carry comparable obs —
    # excluding any converted to pose-graph frames (conversion strips
    # obs into two-pose edges, and conversion TIMING shifts with the
    # lag-dependent keyframe rate)
    kf_s = {s for s in est_s.states if est_s.states[s].is_keyframe
            and not est_s.states[s].is_pose_graph_frame}
    kf_p = {s for s in est_p.states if est_p.states[s].is_keyframe
            and not est_p.states[s].is_pose_graph_frame}
    for sid in kf_s & kf_p:
        n_s = len(list(est_s.obs_of_state(sid)))
        n_p = len(list(est_p.obs_of_state(sid)))
        assert n_p >= 0.5 * n_s - 5, (sid, n_s, n_p)
