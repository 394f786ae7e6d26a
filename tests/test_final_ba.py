"""Final bundle adjustment + marginalisation reversal tests."""

import numpy as np
import pytest


@pytest.mark.slow
def test_final_ba_improves_or_holds():
    """Run a short VIO session, marginalise (pose-graph edges form), then
    final-BA: edges convert back to observations and the global solve
    must not degrade the trajectory (doFinalBa,
    ViSlamBackend.cpp:1759-1892)."""
    from okvis2_tpu.pipeline.synthetic_run import run_synthetic_vio
    from okvis2_tpu.pipeline.final_ba import do_final_ba
    from okvis2_tpu.pipeline.trajectory import ate_rmse

    res = run_synthetic_vio(duration=2.0, frame_rate=4.0)
    slam = res["slam"]
    ate_before = res["ate_rmse"]
    stats = do_final_ba(
        slam.estimator, iterations=15,
        max_states=32, max_landmarks=1024, max_obs=8192,
    )
    assert stats["states"] > 4
    assert stats["landmarks"] > 50
    traj = slam.trajectory()
    ate_after = ate_rmse(traj, res["gt_traj"])
    assert np.isfinite(ate_after)
    # final BA over exact measurements must not be worse than online
    assert ate_after < ate_before * 1.5 + 1e-3, (ate_before, ate_after)
    # diagnostics (reference ViSlamBackend.cpp:1810-1881): reprojection
    # RMS + per-camera heatmaps + bias statistics
    assert stats["reproj_rms_px"] < 3.0, stats["reproj_rms_px"]
    assert stats["reproj_heatmaps"].shape[0] == 2
    assert np.all(np.isfinite(stats["bias_gyro_mean"]))
    # overhead debug image renders
    from okvis2_tpu.pipeline.visualizer import draw_overhead_image

    img = draw_overhead_image(slam.estimator, size=128)
    assert img.shape == (128, 128) and img.max() == 1.0


@pytest.mark.slow
def test_final_ba_sharded_real_session():
    """Multi-chip final BA on a REAL session graph (VERDICT r4 #6: the
    sharded solver was only ever proven on a 4-state toy): run a short
    VIO drive, snapshot the estimator, final-BA it unsharded AND
    landmark-sharded over the 8-device CPU mesh (pack ->
    shard_problem_by_landmark -> shard_map solve -> write-back), and
    require the sharded result's ATE to match the unsharded one.
    Reference analogue: doFinalBa (ViSlamBackend.cpp:1759-1892) as the
    multi-chip scaling story (SURVEY.md §5)."""
    import jax

    from okvis2_tpu.parallel.sharded_ba import make_mesh
    from okvis2_tpu.pipeline.final_ba import do_final_ba
    from okvis2_tpu.pipeline.synthetic_run import run_synthetic_vio
    from okvis2_tpu.pipeline.trajectory import ate_rmse

    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    res = run_synthetic_vio(duration=2.0, frame_rate=4.0)
    slam = res["slam"]
    est = slam.estimator

    snap_states = {
        s: (r.pose.copy(), r.speed_bias.copy())
        for s, r in est.states.items()
    }
    snap_lms = {lid: lm.hp_W.copy() for lid, lm in est.landmarks.items()}

    kw = dict(iterations=15, max_states=32, max_landmarks=1024,
              max_obs=8192)
    do_final_ba(est, **kw)
    ate_unsharded = ate_rmse(slam.trajectory(), res["gt_traj"])

    for s, (p, sb) in snap_states.items():
        est.states[s].pose = p
        est.states[s].speed_bias = sb
    for lid, hp in snap_lms.items():
        est.landmarks[lid].hp_W = hp
    est._pre_cache.clear()

    stats = do_final_ba(est, mesh=make_mesh(8), **kw)
    assert stats["states"] > 4 and stats["landmarks"] > 50
    ate_sharded = ate_rmse(slam.trajectory(), res["gt_traj"])
    assert np.isfinite(ate_sharded)
    # the sharded solve optimises the same objective: its ATE must not
    # degrade vs the single-device final BA
    assert ate_sharded < ate_unsharded * 1.1 + 1e-3, (
        ate_unsharded, ate_sharded
    )


def test_convert_edges_restores_observations():
    from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig, PoseGraphEdge
    from okvis2_tpu.imu.preintegration import ImuParameters
    from okvis2_tpu.pipeline.final_ba import convert_edges_to_observations
    from okvis2_tpu.utils.synthetic import stereo_rig

    cams, exts = stereo_rig()
    est = Estimator(cams, exts, ImuParameters.create(), EstimatorConfig())
    s0 = est.add_state(0.0, np.zeros((5, 3)), np.tile([0, 0, 9.81], (5, 1)),
                       np.full(5, 0.01))
    lid = est.add_landmark([1, 2, 5, 1.0], initialised=True)
    stored = [(lid, s0, 0, 7, 100.0, 110.0, 9.0)]
    est.pose_graph_edges.append(
        PoseGraphEdge(s0, s0, np.array([0, 0, 0, 0, 0, 0, 1.0]),
                      np.eye(6), stored, "marg")
    )
    # also a loop edge that must survive
    est.pose_graph_edges.append(
        PoseGraphEdge(s0, s0, np.array([0, 0, 0, 0, 0, 0, 1.0]),
                      np.eye(6), [], "loop")
    )
    n = convert_edges_to_observations(est)
    assert n == 1
    assert (s0, 0, 7) in est.landmarks[lid].obs
    assert len(est.pose_graph_edges) == 1
    assert est.pose_graph_edges[0].kind == "loop"
