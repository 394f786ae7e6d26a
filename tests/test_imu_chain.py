"""IMU chain-adjacency invariants across elimination / window drops.

Reference semantics: ImuError::append merges exactly adjacent segments
(okvis_ceres/src/ViGraphEstimator.cpp:57-157); a factor built over a
non-adjacent span double-integrates the overlap. These tests drive the
estimator long enough to trigger IMU-frame elimination and window
shrinking, then assert that every IMU factor any packer would build
spans exactly its two endpoint states and that the union of final-BA
links covers the session once (no double counting).
"""

import numpy as np
import pytest

from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.utils import synthetic


def _make_estimator(**cfg_kwargs):
    cams, T_SC = synthetic.stereo_rig()
    imu_params = ImuParameters.create(g=9.81)
    cfg = EstimatorConfig(**cfg_kwargs)
    return Estimator(cams, T_SC, imu_params, cfg)


def _add_states(est, n, dt_frame=0.1, imu_rate=100.0):
    """Add n states with constant-rate IMU segments between them."""
    n_imu = int(round(dt_frame * imu_rate))
    for k in range(n):
        t = k * dt_frame
        if k == 0:
            w = np.zeros((0, 3))
            a = np.zeros((0, 3))
            dts = np.zeros((0,))
        else:
            w = np.zeros((n_imu, 3))
            a = np.tile([0.0, 0.0, 9.81], (n_imu, 1))
            dts = np.full(n_imu, 1.0 / imu_rate)
        est.add_state(t, w, a, dts)


def _chain_spans_ok(est, ids):
    """For consecutive packed ids, a link is valid iff imu_from matches;
    when valid, its buffer must span exactly the time gap."""
    total_linked = 0.0
    for i in range(len(ids) - 1):
        nxt = est.states[ids[i + 1]]
        if len(nxt.imu_dt) and nxt.imu_from == ids[i]:
            span = nxt.imu_dt.sum()
            gap = est.states[ids[i + 1]].t - est.states[ids[i]].t
            assert span == pytest.approx(gap, abs=1e-9), (
                f"link {ids[i]}->{ids[i+1]}: buffer spans {span}, "
                f"state gap {gap}"
            )
            total_linked += span
    return total_linked


def test_elimination_clears_buffers_and_keeps_chain():
    est = _make_estimator(num_keyframes=3, num_imu_frames=2)
    _add_states(est, 10)
    # mark every 3rd state a keyframe so elimination has work to do
    for sid in list(est.states)[::3]:
        est.set_keyframe(sid)
    est._eliminate_imu_frames()

    eliminated = [s for s in est.states if not est.states[s].in_window]
    assert eliminated, "scenario must eliminate at least one IMU frame"
    for sid in eliminated:
        rec = est.states[sid]
        assert len(rec.imu_dt) == 0, "eliminated state kept its IMU buffer"
        assert rec.imu_from is None

    # window chain spans exactly the inter-state gaps
    total = _chain_spans_ok(est, est.window)
    t0 = est.states[est.window[0]].t
    t1 = est.states[est.window[-1]].t
    assert total == pytest.approx(t1 - t0, abs=1e-9)


def test_final_ba_links_cover_session_once():
    """After elimination + shrink, final-BA packing must integrate each
    IMU interval exactly once (the round-1 double-count hazard)."""
    from okvis2_tpu.pipeline.final_ba import pack_full_ba_problem

    est = _make_estimator(num_keyframes=3, num_imu_frames=2,
                          window_slots=8, num_pose_graph_frames=2)
    _add_states(est, 20)
    for sid in list(est.states)[::2]:
        est.set_keyframe(sid)
    est.apply_marginalisation_strategy()

    prob, ids, slot_of, lm_ids = pack_full_ba_problem(est, max_states=32)
    imu_mask = np.asarray(prob.imu_pre.dt_total)[: len(ids) - 1]
    mask = np.asarray(prob.imu_mask)[: len(ids) - 1]
    # every active link's preintegrated dt equals the endpoint gap
    for i in range(len(ids) - 1):
        if mask[i]:
            gap = est.states[ids[i + 1]].t - est.states[ids[i]].t
            assert imu_mask[i] == pytest.approx(gap, abs=1e-9), (
                f"final-BA link {ids[i]}->{ids[i+1]} integrates "
                f"{imu_mask[i]} s over a {gap} s gap"
            )
    # total linked time == session length (full chain, counted once)
    linked = float(imu_mask[mask.astype(bool)].sum())
    session = est.states[ids[-1]].t - est.states[ids[0]].t
    assert linked == pytest.approx(session, abs=1e-9)


def test_window_drop_merges_imu_for_plain_states():
    est = _make_estimator(num_keyframes=2, num_imu_frames=2,
                          window_slots=6, num_pose_graph_frames=1)
    _add_states(est, 14)
    for sid in list(est.states)[::4]:
        est.set_keyframe(sid)
    for _ in range(3):
        est.apply_marginalisation_strategy()
    # whatever remains in the window must satisfy the span invariant
    _chain_spans_ok(est, est.window)
    # and no state anywhere may own a buffer not anchored to its imu_from
    for sid, rec in est.states.items():
        if len(rec.imu_dt):
            assert rec.imu_from is not None
            span = rec.imu_dt.sum()
            gap = rec.t - est.states[rec.imu_from].t
            assert span == pytest.approx(gap, abs=1e-9)
