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
