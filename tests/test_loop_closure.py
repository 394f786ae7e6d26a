"""Loop-closure backend unit tests (compact: no full pipeline run).

The full circular-trajectory SLAM run (verified separately: the loop
fires at revisit and drops tracking error 0.31 m -> 0.04 m) takes ~20 min
on the CPU mesh; these tests cover the backend mechanics on constructed
fixtures instead.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig, PoseGraphEdge
from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.pipeline.full_graph import LoopClosureBackend, LoopClosureConfig
from okvis2_tpu.pipeline.synthetic_run import small_rig
from okvis2_tpu.pipeline.dataset import SyntheticDataset
from okvis2_tpu.pipeline.frontend_pipeline import Frontend, FrontendConfig
from okvis2_tpu.frontend.detection import DetectionConfig


@pytest.fixture(scope="module")
def rig():
    cams, exts = small_rig()
    return cams, exts, ImuParameters.create(g=9.81)


def _render_and_describe(cams, exts, imu_params, pose7, frontend):
    ds = SyntheticDataset(cams, exts, imu_params, n_stars=2500, seed=3)
    imgs = ds.render(np.asarray(pose7))
    return frontend.detect_and_describe(imgs)


def test_place_recognition_and_geometric_verify(rig):
    cams, exts, imu_params = rig
    fe = Frontend(cams, exts, FrontendConfig(
        detection=DetectionConfig(max_keypoints=256)))
    est = Estimator(cams, exts, imu_params, EstimatorConfig())
    lc = LoopClosureBackend(cams, exts, LoopClosureConfig(
        min_train_descriptors=400, exclude_recent=2, vocabulary_size=64,
    ))

    # visit A: state at pose A, landmarks initialised by stereo
    def add_visit(pose7, t):
        sid = est.add_state(t, np.zeros((5, 3)),
                            np.tile([0, 0, 9.81], (5, 1)), np.full(5, 0.02))
        est.states[sid].pose = np.asarray(pose7)
        est.set_keyframe(sid, True)
        frames = _render_and_describe(cams, exts, imu_params, pose7, fe)
        fe.match_stereo(est, frames, sid)
        lc.add_keyframe(est, sid, frames)
        return sid, frames

    pose_A = np.array([0.0, 0, 0, 0, 0, 0, 1.0])
    pose_B = np.array([0.8, 0.3, 0, 0, 0, 0, 1.0])
    pose_C = np.array([0.0, 0.9, 0, 0, 0, 0, 1.0])
    pose_E = np.array([-0.8, 0.4, 0, 0, 0, 0, 1.0])
    sid_A, _ = add_visit(pose_A, 0.0)
    sid_B, _ = add_visit(pose_B, 1.0)
    sid_C, _ = add_visit(pose_C, 2.0)
    add_visit(pose_E, 2.5)
    # revisit A (exactly) — db has A,B,C,E (>= exclude_recent+2);
    # exclude_recent=2 leaves A queryable
    sid_D = est.add_state(3.0, np.zeros((5, 3)),
                          np.tile([0, 0, 9.81], (5, 1)), np.full(5, 0.02))
    est.states[sid_D].pose = pose_A.copy()
    est.set_keyframe(sid_D, True)
    frames_D = _render_and_describe(cams, exts, imu_params, pose_A, fe)

    old = lc.detect_loop(est, sid_D, frames_D)
    assert old == sid_A, (old, lc.last_query_results, lc.last_verify_info)

    # close the loop: edge appears and full graph stays consistent
    ok = lc.close_loop(est, old, sid_D, frames_D)
    assert ok
    assert any(e.kind == "loop" for e in est.pose_graph_edges)
    assert lc.num_loop_closures == 1
    # poses remain finite after the inline full-graph solve
    for s in est.state_order:
        assert np.all(np.isfinite(est.states[s].pose))


def test_full_graph_pack_includes_edges(rig):
    cams, exts, imu_params = rig
    est = Estimator(cams, exts, imu_params, EstimatorConfig())
    sids = []
    for i in range(4):
        sid = est.add_state(i * 0.5, np.full((8, 3), 0.001),
                            np.tile([0, 0, 9.81], (8, 1)), np.full(8, 0.0625))
        est.set_keyframe(sid, True)
        sids.append(sid)
    est.pose_graph_edges.append(
        PoseGraphEdge(sids[0], sids[3],
                      np.array([0.1, 0, 0, 0, 0, 0, 1.0]),
                      np.eye(6) * 10, [], "loop")
    )
    lc = LoopClosureBackend(cams, exts, LoopClosureConfig())
    prob, ids, slot_of, lm_ids = lc.pack_full_problem(est)
    assert len(ids) == 4
    assert int(np.asarray(prob.rel_mask).sum()) == 1
    assert int(np.asarray(prob.imu_mask).sum()) == 3
    stats = lc.optimise_full_graph(est)
    assert np.isfinite(float(stats["final_cost"]))


def test_drift_budget_rejects_false_positive(rig):
    """attemptLoopClosure's error budget (ViSlamBackend.cpp:2131-2153):
    a place match implying a correction larger than accumulated odometry
    drift can explain must be rejected; a plausible one accepted."""
    cams, exts, imu_params = rig
    est = Estimator(cams, exts, imu_params, EstimatorConfig())
    sids = []
    for i in range(10):
        sid = est.add_state(i * 0.5, np.full((8, 3), 0.001),
                            np.tile([0, 0, 9.81], (8, 1)),
                            np.full(8, 0.0625))
        est.states[sid].pose = np.array(
            [0.3 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]
        )
        est.set_keyframe(sid, True)
        sids.append(sid)
    lc = LoopClosureBackend(cams, exts, LoopClosureConfig())
    chain = lc._loop_chain(est, sids[0], sids[-1])
    # path length = 2.7 m, 9 steps -> pos budget ~ 0.17 m
    # plausible correction: 5 cm off the estimate
    T_meas_good = est.states[sids[-1]].pose.copy()
    T_meas_good[0] += 0.05
    assert lc._drift_budget_ok(est, chain, T_meas_good, sids[-1])
    # false positive: implies a 2 m teleport
    T_meas_bad = est.states[sids[-1]].pose.copy()
    T_meas_bad[1] += 2.0
    assert not lc._drift_budget_ok(est, chain, T_meas_bad, sids[-1])
    # rotational false positive: ~0.5 rad twist
    T_meas_rot = est.states[sids[-1]].pose.copy()
    T_meas_rot[3:7] = np.array([0.247, 0, 0, 0.969])
    assert not lc._drift_budget_ok(est, chain, T_meas_rot, sids[-1])


def test_loop_reactivates_stored_observations(rig):
    """convertToObservations at loop closure (ViSlamBackend.cpp:1284-1409):
    marginalisation edges inside the loop span give their stored
    reprojection errors back to the live problem."""
    cams, exts, imu_params = rig
    est = Estimator(cams, exts, imu_params, EstimatorConfig())
    sids = []
    for i in range(4):
        sid = est.add_state(i * 0.5, np.full((8, 3), 0.001),
                            np.tile([0, 0, 9.81], (8, 1)),
                            np.full(8, 0.0625))
        est.set_keyframe(sid, True)
        sids.append(sid)
    lid = est.add_landmark(np.array([0.0, 0, 5.0, 1.0]), initialised=True)
    stored = [(lid, sids[1], 0, 7, 100.0, 120.0, 9.0)]
    est.pose_graph_edges.append(
        PoseGraphEdge(sids[0], sids[1],
                      np.array([0.1, 0, 0, 0, 0, 0, 1.0]),
                      np.eye(6) * 10, stored, "marg")
    )
    lc = LoopClosureBackend(cams, exts, LoopClosureConfig())
    n = lc._reactivate_loop_observations(est, sids)
    assert n == 1
    assert (sids[1], 0, 7) in est.landmarks[lid].obs
    assert not est.pose_graph_edges  # the converted edge is gone


def test_loop_states_rejoin_window(rig):
    """numLoopClosureFrames window composition: closing a loop re-admits
    the oldest loop states unfrozen (ViSlamBackend.cpp:1284-1409)."""
    cams, exts, imu_params = rig
    est = Estimator(cams, exts, imu_params,
                    EstimatorConfig(num_loop_closure_frames=2))
    sids = []
    for i in range(6):
        sid = est.add_state(i * 0.5, np.full((8, 3), 0.001),
                            np.tile([0, 0, 9.81], (8, 1)),
                            np.full(8, 0.0625))
        est.set_keyframe(sid, True)
        sids.append(sid)
    # simulate old states having left the window, frozen
    for sid in sids[:3]:
        est.states[sid].frozen = True
        est.states[sid].in_window = False
        est.window.remove(sid)
    added = est.reactivate_loop_states(sids)
    assert added == 2
    assert sids[0] in est.window and sids[1] in est.window
    assert not est.states[sids[0]].frozen
    # window stays time-ordered
    assert est.window == sorted(est.window)


def test_place_recognition_pruning(rig):
    """prunePlaceRecognitionFrames (ViSlamBackend.cpp:2276-2309):
    projected overlap-fraction semantics — a keyframe whose OBSERVED
    landmarks a stored PR frame already covers from essentially the
    same ray directions is not added to the database; a displaced
    frame (real parallax) or a rotated one (mostly new landmarks) is."""
    cams, exts, imu_params = rig
    est = Estimator(cams, exts, imu_params, EstimatorConfig())
    lc = LoopClosureBackend(cams, exts, LoopClosureConfig())

    # wall A straight ahead of the origin at z=5
    wall_a = [
        est.add_landmark([float(x), float(y), 5.0, 1.0],
                         initialised=True)
        for x in np.linspace(-2, 2, 5) for y in np.linspace(-1.5, 1.5, 3)
    ]
    # wall B along the rotated view direction, outside wall A's frustum
    wall_b = [
        est.add_landmark([3.5 + float(x), float(y), 4.0, 1.0],
                         initialised=True)
        for x in np.linspace(-0.5, 1.5, 5)
        for y in np.linspace(-1.5, 1.5, 3)
    ]

    def state(t, pose7, obs):
        sid = est.add_state(t, np.zeros((0, 3)), np.zeros((0, 3)),
                            np.zeros(0))
        est.states[sid].pose = np.asarray(pose7, np.float64)
        for kp, lid in enumerate(obs):
            est.add_observation(lid, sid, 0, kp, (100.0, 100.0), 9.0)
        return sid

    s0 = state(0.0, [0.0, 0, 0, 0, 0, 0, 1.0], wall_a)
    s1 = state(0.5, [0.02, 0.01, 0, 0, 0, 0, 1.0], wall_a)  # same view
    s2 = state(1.0, [1.0, 0, 0, 0, 0, 0, 1.0], wall_a)  # moved 1 m
    ang = 0.3  # rotated ~34 deg in place -> sees wall B
    s3 = state(1.5, [0.0, 0, 0, 0.0, np.sin(ang), 0.0, np.cos(ang)],
               wall_b)
    lc._pr_ids.append(s0)
    assert not lc._pr_eligible(est, s1)  # same place, same view
    assert lc._pr_eligible(est, s2)  # displaced: real parallax
    assert lc._pr_eligible(est, s3)  # rotated: new landmarks


def test_expand_keyframe_reactivates_pose_graph_frame(rig):
    """expandKeyframe (ViSlamBackend.cpp:357-406): when the current
    keyframe re-observes landmarks stored in a marginalisation edge, the
    pose-graph frame converts back into the window."""
    cams, exts, imu_params = rig
    est = Estimator(cams, exts, imu_params, EstimatorConfig())
    s_old = est.add_state(0.0, np.zeros((0, 3)), np.zeros((0, 3)),
                          np.zeros(0))
    s_anchor = est.add_state(0.5, np.full((8, 3), 0.001),
                             np.tile([0, 0, 9.81], (8, 1)),
                             np.full(8, 0.0625))
    s_now = est.add_state(1.0, np.full((8, 3), 0.001),
                          np.tile([0, 0, 9.81], (8, 1)),
                          np.full(8, 0.0625))
    lids = []
    for k in range(15):
        lid = est.add_landmark([0.1 * k, 0, 5, 1], initialised=True)
        est.add_observation(lid, s_now, 0, k, (10 * k, 20))
        lids.append(lid)
    stored = [(lid, s_old, 0, k, 10.0 * k, 30.0, 9.0)
              for k, lid in enumerate(lids)]
    est.pose_graph_edges.append(
        PoseGraphEdge(s_anchor, s_old,
                      np.array([0.1, 0, 0, 0, 0, 0, 1.0]),
                      np.eye(6) * 10, stored, "marg")
    )
    est.states[s_old].is_pose_graph_frame = True
    est.states[s_old].frozen = True
    est.states[s_old].in_window = False
    est.window.remove(s_old)

    assert est.expand_keyframe(s_now)
    assert s_old in est.window
    assert not est.states[s_old].frozen
    assert not est.states[s_old].is_pose_graph_frame
    assert not est.pose_graph_edges
    # the stored observations are live again
    assert (s_old, 0, 0) in est.landmarks[lids[0]].obs


def test_loop_inserts_observations_of_old_landmarks(rig):
    """Frontend.cpp:853-879: a verified loop pair whose current keypoint
    hosts NO landmark becomes a fresh observation of the old-map
    landmark (not a silent no-op), so old-map points constrain the loop
    BA even where tracking never picked them up."""
    cams, exts, imu_params = rig
    est = Estimator(cams, exts, imu_params, EstimatorConfig())
    fe = Frontend(cams, exts, FrontendConfig(
        detection=DetectionConfig(max_keypoints=64)))
    sid = est.add_state(0.0, np.zeros((0, 3)), np.zeros((0, 3)),
                        np.zeros(0))
    lid_old = est.add_landmark(np.array([0.0, 0, 5.0, 1.0]),
                               initialised=True)
    # a second pair that should MERGE (kp 3 already hosts a landmark)
    lid_old2 = est.add_landmark(np.array([1.0, 0, 5.0, 1.0]),
                                initialised=True)
    lid_live = est.add_landmark(np.array([1.01, 0, 5.0, 1.0]),
                                initialised=True)
    est.add_observation(lid_live, sid, 0, 3, (30.0, 40.0), 9.0)

    N = 64
    frames = [{
        "xy": np.tile(np.array([[10.0, 20.0]]), (N, 1)),
        "size": np.full(N, 9.0),
        "mask": np.ones(N, bool),
    }]
    lc = LoopClosureBackend(cams, exts, LoopClosureConfig())
    pairs = [(lid_old, 0, 7), (lid_old2, 0, 3)]
    n_merged = lc._merge_loop_landmarks(est, sid, pairs, frames, fe)
    # kp 7 hosted nothing -> new observation of lid_old
    assert (sid, 0, 7) in est.landmarks[lid_old].obs
    assert lc.num_loop_observations == 1
    # kp 3 hosted lid_live -> merged into lid_old2
    assert n_merged == 1
    assert lid_live not in est.landmarks
    assert (sid, 0, 3) in est.landmarks[lid_old2].obs


def test_pr_database_growth_bounded_on_revisit():
    """prunePlaceRecognitionFrames parity (ViSlamBackend.cpp:2276-2309):
    a long trajectory hovering over the SAME view must not grow the PR
    database (projected overlap-fraction pruning against ALL stored PR
    frames), while genuinely new views keep being added."""
    import numpy as np

    from okvis2_tpu.frontend.descriptor import DESCRIPTOR_BITS
    from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
    from okvis2_tpu.imu.preintegration import ImuParameters
    from okvis2_tpu.pipeline.full_graph import (
        LoopClosureBackend,
        LoopClosureConfig,
    )
    from okvis2_tpu.pipeline.synthetic_run import small_rig

    cams, exts = small_rig()
    imu = ImuParameters.create(g=9.81)
    est = Estimator(cams, exts, imu, EstimatorConfig())
    lc = LoopClosureBackend(cams, exts, LoopClosureConfig())
    rng = np.random.default_rng(3)

    # a wall of landmarks in front of the origin
    lids = [
        est.add_landmark(
            [float(x), float(y), 5.0, 1.0], initialised=True
        )
        for x in np.linspace(-2, 2, 6)
        for y in np.linspace(-1.5, 1.5, 4)
    ]

    def fake_frames(n=48):
        fr = []
        for _ci in range(len(cams)):
            signs = rng.choice(
                [-1.0, 1.0], (n, DESCRIPTOR_BITS)
            ).astype(np.float32)
            fr.append({
                "signs_np": signs,
                "mask": np.ones(n, bool),
                "xy": rng.uniform(10, 230, (n, 2)).astype(np.float32),
            })
        return fr

    def keyframe(pose7, t, obs_lids):
        sid = est.add_state(
            t, np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0)
        )
        est.states[sid].pose = np.asarray(pose7, np.float64)
        for kp, lid in enumerate(obs_lids):
            est.add_observation(lid, sid, 0, kp, (100.0, 100.0), 9.0)
        lc.add_keyframe(est, sid, fake_frames())
        return sid

    # 30 keyframes jittering around the SAME viewpoint, observing the
    # same wall: the database must stay tiny
    for k in range(30):
        jit = rng.uniform(-0.05, 0.05, 3)
        keyframe([jit[0], jit[1], jit[2], 0, 0, 0, 1.0], 0.1 * k, lids)
    n_same_view = len(lc._pr_ids)
    assert n_same_view <= 3, (
        f"revisit PR growth unbounded: {n_same_view} frames stored"
    )

    # genuinely new views (new landmark walls further along x, camera
    # rotated to face them) keep being added — pruning must not starve
    # the database
    before = len(lc._pr_ids)
    ang = np.pi / 2  # optical axis along +x, away from the old wall
    q = [0.0, np.sin(ang / 2), 0.0, np.cos(ang / 2)]
    for k in range(5):
        x0 = 10.0 + 8.0 * k
        new_lids = [
            est.add_landmark(
                [x0 + 5.0, float(y), float(z), 1.0], initialised=True
            )
            for y in np.linspace(-1.5, 1.5, 4)
            for z in np.linspace(-2, 2, 6)
        ]
        keyframe([x0, 0.0, 0.0] + q, 10.0 + 0.1 * k, new_lids)
    assert len(lc._pr_ids) >= before + 4, lc._pr_ids


def test_predicted_shape_bounds_packed_shape(rig):
    """prewarm_predicted must compile the SAME (or a strictly covering)
    pow2 shape the real pack will use, from cheap host counts only —
    otherwise the first loop closure pays a ~80 s foreground compile
    (r4 textured drive, frame 293). Reference analogue: the background
    thread owns optimiseFullGraph (ViSlamBackend.cpp:1726-1757), so a
    loop-closure frame never blocks on this work."""
    cams, exts, imu_params = rig
    est = Estimator(cams, exts, imu_params, EstimatorConfig())
    sids = []
    for i in range(5):
        sid = est.add_state(i * 0.5, np.full((8, 3), 0.001),
                            np.tile([0, 0, 9.81], (8, 1)), np.full(8, 0.0625))
        est.set_keyframe(sid, True)
        sids.append(sid)
    rng = np.random.default_rng(3)
    for k in range(90):
        lid = est.add_landmark(
            [rng.uniform(-2, 2), rng.uniform(-2, 2), 4.0, 1.0],
            initialised=True,
        )
        # between 1 and 4 observing states: single-obs landmarks must
        # NOT count toward the packed shape
        for j, s in enumerate(sids[: 1 + k % 4]):
            est.add_observation(lid, s, 0, k, (10.0 + k, 20.0 + j))
    est.pose_graph_edges.append(
        PoseGraphEdge(sids[0], sids[4],
                      np.array([0.1, 0, 0, 0, 0, 0, 1.0]),
                      np.eye(6) * 10, [], "loop")
    )
    lc = LoopClosureBackend(cams, exts, LoopClosureConfig())
    caps, used = lc.predicted_full_graph_shape(est)
    prob, ids, slot_of, lm_ids = lc.pack_full_problem(est)
    packed = (
        prob.pose.shape[0], prob.landmarks.shape[0],
        prob.obs_mask.shape[0], prob.rel_mask.shape[0],
    )
    # prediction covers the real pack in every dimension, and is exact
    # here (all predicted landmarks/obs survive the pack's slot filter)
    assert tuple(packed) == tuple(caps), (packed, caps)
    assert used[0] == len(ids)
    assert used[1] >= len(lm_ids)
    # prewarm dedups: the same predicted shape only ever compiles once
    lc.prewarm_predicted(est)
    n_warmed = len(lc._warmed_shapes)
    lc.prewarm_predicted(est)
    assert len(lc._warmed_shapes) == n_warmed
