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
