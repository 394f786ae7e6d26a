"""Per-stage device cost of one LM iteration, measured INSIDE one jit.

Each stage is wrapped in a lax.scan of length N with a data dependency
threaded through (so XLA cannot hoist or DCE it); the (N=12 - N=2)/10
slope is the stage's true per-iteration device cost, free of dispatch
overhead. Usage (TPU env intact): python tools/profile_ablate2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[ablate2] {m}", file=sys.stderr, flush=True)


def main():
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    import bench
    from okvis2_tpu.solver import gauss_newton as gn
    from okvis2_tpu.solver.window_problem import SolverConfig, WindowProblem

    log(f"devices: {jax.devices()}")
    cams, _exts, imu_params = bench._build_rig()
    S, L, O, NC = 12, 512, 4096, 2
    rng = np.random.default_rng(0)
    p = WindowProblem.empty(S, L, O, NC, 64)
    p = dataclasses.replace(
        p,
        state_mask=jnp.arange(S) < 6,
        lm_mask=jnp.arange(L) < 427,
        obs_mask=jnp.arange(O) < 2100,
        obs_state=jnp.asarray(rng.integers(0, 6, O), jnp.int32),
        obs_cam=jnp.asarray(rng.integers(0, NC, O), jnp.int32),
        obs_lm=jnp.asarray(rng.integers(0, 427, O), jnp.int32),
        obs_uv=jnp.asarray(rng.random((O, 2)) * 400, p.obs_uv.dtype),
        landmarks=jnp.asarray(
            np.concatenate([rng.random((L, 3)) * 4 - 2 + [[0, 0, 5]],
                            np.ones((L, 1))], 1), p.landmarks.dtype),
        imu_mask=jnp.arange(S - 1) < 5,
    )
    jax.block_until_ready(p.pose)
    cfg = SolverConfig()
    dtype = p.pose.dtype

    def scan_time(make_body, n):
        """Time a jitted scan of `n` stage evaluations, chained."""
        @jax.jit
        def run(pr, eps):
            def body(carry, _):
                out = make_body(pr, carry)
                return out, None
            out, _ = jax.lax.scan(body, eps, None, length=n)
            return out

        eps = jnp.asarray(0.0, dtype)
        jax.block_until_ready(run(p, eps))
        t0 = time.perf_counter()
        outs = [run(p, eps) for _ in range(20)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / 20

    def slope(make_body, name):
        t2 = scan_time(make_body, 2)
        t12 = scan_time(make_body, 12)
        log(f"{name}: {(t12-t2)/10*1e3:.3f} ms/iter "
            f"(t2={t2*1e3:.2f} t12={t12*1e3:.2f})")

    def perturb(pr, eps):
        return dataclasses.replace(pr, pose=pr.pose + eps * 1e-20)

    # full linearize
    def s_lin(pr, eps):
        pr = perturb(pr, eps)
        Hxx, bx, Hll, bl, W, free_x = gn._linearize(pr, cams, imu_params,
                                                    cfg)
        return bx[0] + jnp.sum(W[0, 0]) + bl[0, 0] + Hxx[0, 0] + Hll[0, 0, 0]

    slope(s_lin, "_linearize full")

    # cost
    def s_cost(pr, eps):
        pr = perturb(pr, eps)
        return gn.problem_cost(pr, cams, imu_params, cfg)

    slope(s_cost, "problem_cost")

    # schur solve (linearize ONCE outside the scan)
    lin = jax.jit(lambda pr: gn._linearize(pr, cams, imu_params, cfg))
    Hxx, bx, Hll, bl, W, free_x = jax.block_until_ready(lin(p))

    def s_schur(pr, eps):
        lam = jnp.asarray(1e-4, dtype) + eps * 1e-20
        dx, dl = gn._schur_solve(Hxx, bx, Hll, bl, W, free_x, pr.lm_mask,
                                 lam, cfg)
        return dx[0] + dl[0, 0]

    slope(s_schur, "_schur_solve")

    # apply deltas
    dx0 = jnp.zeros_like(bx)
    dl0 = jnp.zeros((L, 3), dtype)

    def s_apply(pr, eps):
        out = gn._apply_deltas(perturb(pr, eps), dx0, dl0)
        return out.pose[0, 0] + out.landmarks[0, 0]

    slope(s_apply, "_apply_deltas")

    # reprojection val+jac alone
    stacked = gn._stack_cameras(cams)

    def s_reproj(pr, eps):
        pr = perturb(pr, eps)
        cam_o = jax.tree_util.tree_map(lambda x: x[pr.obs_cam], stacked)
        pose_o = pr.pose[pr.obs_state]
        hp_o = pr.landmarks[pr.obs_lm]
        ext_o = pr.extrinsics[pr.obs_cam]
        z6 = jnp.zeros(6, dtype)
        z3 = jnp.zeros(3, dtype)

        def vj(cam, p7, e7, hp, uv, w):
            def f(dp, de, dl_):
                T_WS = gn._T(gn._oplus_pose(p7, dp))
                T_SC = gn._T(gn._oplus_pose(e7, de))
                hp_p = gn._oplus_hp(hp, dl_)
                hp_C = (T_WS @ T_SC).inverse().apply_homogeneous(hp_p)
                uv_hat, valid = cam.project_homogeneous(hp_C)
                return jnp.where(valid, (uv_hat - uv) * w, 0.0), valid
            r, valid = f(z6, z6, z3)
            jp, je, jl = jax.jacfwd(lambda a, b, c: f(a, b, c)[0],
                                    argnums=(0, 1, 2))(z6, z6, z3)
            return r, jp, je, jl

        r, jp, je, jl = jax.vmap(vj)(cam_o, pose_o, ext_o, hp_o,
                                     pr.obs_uv, pr.obs_sqrt_info)
        return jnp.sum(r[0]) + jnp.sum(jp[0]) + jnp.sum(je[0]) \
            + jnp.sum(jl[0])

    slope(s_reproj, "reproj val+jac")

    # IMU linearize alone
    z6 = jnp.zeros(6, dtype)
    z9 = jnp.zeros(9, dtype)

    def s_imu(pr, eps):
        pr = perturb(pr, eps)

        def ivj(pre, p0, sb0, p1, sb1):
            f = lambda d0, ds0, d1, ds1: gn.imu_residual(
                imu_params, pre, gn._T(gn._oplus_pose(p0, d0)), sb0 + ds0,
                gn._T(gn._oplus_pose(p1, d1)), sb1 + ds1)
            r = f(z6, z9, z6, z9)
            j = jax.jacfwd(f, argnums=(0, 1, 2, 3))(z6, z9, z6, z9)
            return r, j

        r, j = jax.vmap(ivj)(
            pr.imu_pre, pr.pose[pr.imu_i], pr.speed_bias[pr.imu_i],
            pr.pose[pr.imu_j], pr.speed_bias[pr.imu_j])
        return jnp.sum(r) + jnp.sum(j[0])

    slope(s_imu, "imu val+jac")

    # dense assembly + landmark blocks (given fixed J's)
    rj = jax.jit(lambda pr: s_reproj(pr, jnp.asarray(0.0, dtype)))
    del rj


if __name__ == "__main__":
    main()
