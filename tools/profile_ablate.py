"""Ablate the realtime solve's per-iteration device cost (VERDICT r4 #1).

Times each stage of one LM iteration as a separate jitted program on a
WindowProblem at bench capacities (S=12, L=512, O=4096, NC=2). Shapes,
not values, determine XLA cost, so a mask-populated empty problem is
representative.

Usage (TPU env intact):  python tools/profile_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[ablate] {m}", file=sys.stderr, flush=True)


def timed(fn, *args, n=50):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


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

    lin = jax.jit(lambda pr: gn._linearize(pr, cams, imu_params, cfg))
    dt = timed(lin, p)
    log(f"_linearize (full): {dt*1e3:.3f} ms")
    Hxx, bx, Hll, bl, Wp, We, free_x = jax.block_until_ready(lin(p))

    cost = jax.jit(lambda pr: gn.problem_cost(pr, cams, imu_params, cfg))
    log(f"problem_cost: {timed(cost, p)*1e3:.3f} ms")

    lam = jnp.asarray(1e-4, p.pose.dtype)
    schur = jax.jit(lambda *a: gn._schur_solve(*a, cfg))
    dt = timed(schur, Hxx, bx, Hll, bl, Wp, We, free_x, p.lm_mask, lam)
    log(f"_schur_solve: {dt*1e3:.3f} ms")
    dx, dl = jax.block_until_ready(schur(Hxx, bx, Hll, bl, Wp, We,
                                         free_x, p.lm_mask, lam))

    apply_ = jax.jit(gn._apply_deltas)
    log(f"_apply_deltas: {timed(apply_, p, dx, dl)*1e3:.3f} ms")

    # --- linearize sub-stages -----------------------------------------
    def reproj_only(pr):
        # mirror _linearize's reprojection stage incl. dense assembly
        stacked = gn._stack_cameras(cams)
        cam_o = jax.tree_util.tree_map(lambda x: x[pr.obs_cam], stacked)
        pose_o = pr.pose[pr.obs_state]
        hp_o = pr.landmarks[pr.obs_lm]
        ext_o = pr.extrinsics[pr.obs_cam]
        dtype = pr.pose.dtype
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
            return r, valid, jp, je, jl

        return jax.vmap(vj)(cam_o, pose_o, ext_o, hp_o, pr.obs_uv,
                            pr.obs_sqrt_info)

    rj = jax.jit(reproj_only)
    log(f"reproj val+jac (vmapped jacfwd): {timed(rj, p)*1e3:.3f} ms")
    r0, valid, Jp, Je, Jl = jax.block_until_ready(rj(p))

    D = S * 15 + NC * 6
    dtype = p.pose.dtype

    def assemble(pr, Jp, Je, Jl, r0):
        O_, = pr.obs_mask.shape
        oh_s = jax.nn.one_hot(pr.obs_state, S, dtype=dtype)
        oh_c = jax.nn.one_hot(pr.obs_cam, NC, dtype=dtype)
        Jx_pose = jnp.einsum("oij,os->oisj", Jp, oh_s).reshape(O_, 2, S * 6)
        Jx_ext = jnp.einsum("oij,oc->oicj", Je, oh_c).reshape(O_, 2, NC * 6)
        Jx = jnp.concatenate(
            [Jx_pose, jnp.zeros((O_, 2, S * 9), dtype), Jx_ext], axis=-1)
        Hxx = jnp.einsum("oid,oie->de", Jx, Jx)
        bx = -jnp.einsum("oid,oi->d", Jx, r0)
        return Hxx, bx, Jx

    asm = jax.jit(assemble)
    log(f"dense Hxx/bx assembly: {timed(asm, p, Jp, Je, Jl, r0)*1e3:.3f} ms")
    Hxx2, bx2, Jx = jax.block_until_ready(asm(p, Jp, Je, Jl, r0))

    def lm_blocks_segsum(pr, Jx, Jl, r0):
        Hll = jax.ops.segment_sum(
            jnp.einsum("oid,oie->ode", Jl, Jl), pr.obs_lm, num_segments=L)
        bl = jax.ops.segment_sum(
            -jnp.einsum("oid,oi->od", Jl, r0), pr.obs_lm, num_segments=L)
        W = jax.ops.segment_sum(
            jnp.einsum("oid,oie->ode", Jx, Jl), pr.obs_lm, num_segments=L)
        return Hll, bl, W

    seg = jax.jit(lm_blocks_segsum)
    log(f"landmark blocks (segment_sum): "
        f"{timed(seg, p, Jx, Jl, r0)*1e3:.3f} ms")

    def lm_blocks_onehot(pr, Jx, Jl, r0):
        oh_l = jax.nn.one_hot(pr.obs_lm, L, dtype=dtype)  # [O,L]
        Hll = jnp.einsum("ol,ode->lde",
                         oh_l, jnp.einsum("oid,oie->ode", Jl, Jl))
        bl = jnp.einsum("ol,od->ld",
                        oh_l, -jnp.einsum("oid,oi->od", Jl, r0))
        W = jnp.einsum("ol,ode->lde",
                       oh_l, jnp.einsum("oid,oie->ode", Jx, Jl))
        return Hll, bl, W

    oh = jax.jit(lm_blocks_onehot)
    log(f"landmark blocks (one-hot matmul): "
        f"{timed(oh, p, Jx, Jl, r0)*1e3:.3f} ms")

    # --- full solves at several iteration caps ------------------------
    for mi in (1, 3, 10):
        c = dataclasses.replace(cfg, max_iterations=mi)
        sv = jax.jit(lambda pr, c=c: gn.solve_window_impl(
            pr, cams, imu_params, c)[0].pose)
        log(f"solve_window max_iter={mi}: {timed(sv, p, n=20)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
