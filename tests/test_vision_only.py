"""Vision-only (no-IMU) estimator mode — PseudoImuError equivalent."""

import dataclasses

import numpy as np
import pytest


@pytest.mark.slow
def test_vision_only_vio():
    from okvis2_tpu.graph.estimator import EstimatorConfig
    from okvis2_tpu.pipeline.synthetic_run import run_synthetic_vio

    cfg = EstimatorConfig(
        window_slots=10,
        landmark_slots=384,
        obs_slots=2048,
        imu_seg_capacity=16,
        use_imu=False,
    )
    res = run_synthetic_vio(
        duration=1.5, frame_rate=4.0, estimator_config=cfg
    )
    assert res["frames"] == 6
    assert np.isfinite(res["ate_rmse"])
    # vision-only drifts more (no inertial constraint, coarser
    # prediction) but must stay bounded on a short sequence
    assert res["ate_rmse"] < 0.25, f"ATE {res['ate_rmse']}"
    assert len(res["slam"].estimator.landmarks) > 50
