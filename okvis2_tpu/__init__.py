"""okvis2_tpu — a TPU-native visual-inertial SLAM framework.

A from-scratch re-design of the capabilities of OKVIS2
(smartroboticslab/okvis2) for TPU hardware: the frontend (keypoint
detection, binary descriptors, Hamming matching, RANSAC) and the backend
(IMU preintegration + reprojection factor graph solved by a fixed-sparsity
batched Gauss-Newton/Levenberg-Marquardt optimiser with explicit Schur
complement over landmarks) run as jitted XLA/Pallas programs; the
orchestration (sliding window bookkeeping, marginalisation decisions,
loop closure state machine, dataset IO) runs on the host.

Layer map (mirrors the reference's module split, reference SURVEY.md §1):

- ``core``      — SE(3)/SO(3) math, time, timing registry
                  (ref: okvis_kinematics, okvis_time, okvis_timing)
- ``cameras``   — pinhole projection + distortion models, camera rigs
                  (ref: okvis_cv)
- ``imu``       — IMU preintegration and propagation (ref: ceres/ImuError)
- ``factors``   — residual/Jacobian definitions for all factor types
                  (ref: okvis_ceres error terms)
- ``solver``    — batched Gauss-Newton / LM with Schur complement
                  (ref: Ceres solver usage)
- ``frontend``  — detection, description, matching, RANSAC, triangulation
                  (ref: okvis_frontend + BRISK + OpenGV)
- ``graph``     — factor-graph window state + estimator
                  (ref: ViGraph/ViGraphEstimator/ViSlamBackend)
- ``pipeline``  — dataset readers, realtime orchestration, outputs
                  (ref: okvis_multisensor_processing)
- ``config``    — YAML calibration/config parsing (ref: okvis_common)
- ``parallel``  — device mesh / sharding utilities for multi-chip BA
"""

__version__ = "0.1.0"

# TPU matmuls default to bf16 multiplication passes, which destroys the
# solver's normal equations and the IMU covariance propagation in f32
# (measured: stable tracking on CPU f32, linear divergence on TPU until
# this flag). Estimation is precision-critical; set full-f32 matmuls
# globally. Throughput-critical frontend matmuls that are exact in bf16
# (the ±1 Hamming product accumulates in f32 on the MXU) opt back down
# locally with jax.default_matmul_precision("default").
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
