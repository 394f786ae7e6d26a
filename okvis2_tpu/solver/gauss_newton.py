"""Batched Levenberg-Marquardt with Schur complement over landmarks.

This replaces Ceres (the reference's okvis_ceres/src/ViGraph.cpp:47-62
SPARSE_NORMAL_CHOLESKY/DOGLEG and ViSlamBackend.cpp:774 DENSE_SCHUR) with a
single fixed-shape XLA program:

- residuals/Jacobians for every factor type are evaluated with vmapped
  autodiff against minimal-coordinate perturbations (6 for poses, 9 for
  speed/bias, 3 for homogeneous landmarks) — the autodiff equivalent of the
  reference's EvaluateWithMinimalJacobians.
- the state part of the normal equations is assembled DENSE over
  D = S*6 + S*9 + NC*6 dims (a window is <= ~200 dims — exactly why the
  reference also chooses DENSE_SCHUR for the realtime graph), using one-hot
  scatter + einsum so the assembly runs on the MXU.
- landmarks are eliminated by an explicit block-Schur complement with
  batched 3x3 inverses, mirroring Ceres' Schur elimination.
- the LM trust-region loop is a lax.while_loop with masked freezing
  (frozen blocks get identity rows, reproducing SetParameterBlockConstant).
- Cauchy-robustified reprojection terms enter via IRLS sqrt-weights.

Everything is pure: `solve_window(problem, cameras, imu_params) -> problem'`.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.factors.imu_factor import imu_residual
from okvis2_tpu.factors.priors import (
    pose_prior_residual,
    relative_pose_residual,
    speed_bias_prior_residual,
)
from okvis2_tpu.factors.reprojection import cauchy_weight
from okvis2_tpu.imu.preintegration import ImuParameters, Preintegrated
from okvis2_tpu.solver.window_problem import SolverConfig, WindowProblem


# ---------------------------------------------------------------------------
# parameter perturbation
# ---------------------------------------------------------------------------

def _oplus_pose(pose7: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """pose [...,7] boxplus minimal [...,6] (translation + left quat)."""
    r = pose7[..., :3] + d[..., :3]
    dq = so3.delta_q(d[..., 3:6])
    q = so3.quat_normalize(so3.quat_multiply(dq, pose7[..., 3:7]))
    return jnp.concatenate([r, q], axis=-1)


def _oplus_hp(hp: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """homogeneous point [...,4] boxplus [...,3] (xyz shift, w fixed)."""
    return jnp.concatenate([hp[..., :3] + d, hp[..., 3:4]], axis=-1)


def _T(pose7: jnp.ndarray) -> Transformation:
    return Transformation(r=pose7[..., :3], q=pose7[..., 3:7])


# ---------------------------------------------------------------------------
# residual evaluation (no Jacobians) — used for cost
# ---------------------------------------------------------------------------

def _reproj_residuals(problem: WindowProblem, cameras) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All reprojection residuals [O,2] (whitened, unrobustified) + weights."""
    pose_o = problem.pose[problem.obs_state]  # [O,7]
    hp_o = problem.landmarks[problem.obs_lm]  # [O,4]
    ext_o = problem.extrinsics[problem.obs_cam]  # [O,7]
    mask = (
        problem.obs_mask
        & problem.state_mask[problem.obs_state]
        & problem.lm_mask[problem.obs_lm]
    )

    def one_cam(ci, camera):
        T_WS = _T(pose_o)
        T_SC = _T(ext_o)
        T_CW = (T_WS @ T_SC).inverse()
        hp_C = T_CW.apply_homogeneous(hp_o)
        uv_hat, valid = camera.project_homogeneous(hp_C)
        r = (uv_hat - problem.obs_uv) * problem.obs_sqrt_info[..., None]
        sel = mask & (problem.obs_cam == ci) & valid
        return jnp.where(sel[..., None], r, 0.0), sel

    r_total = jnp.zeros_like(problem.obs_uv)
    m_total = jnp.zeros(problem.O, bool)
    for ci, cam in enumerate(cameras):
        r, sel = one_cam(ci, cam)
        r_total = r_total + r
        m_total = m_total | sel
    return r_total, m_total


def _other_residuals(problem: WindowProblem, imu_params: ImuParameters):
    """IMU-link, prior and relative-pose residuals, stacked per group."""
    S = problem.S

    # IMU links imu_i[k] -> imu_j[k]
    def imu_one(pre, p0, sb0, p1, sb1, m):
        r = imu_residual(imu_params, pre, _T(p0), sb0, _T(p1), sb1)
        return jnp.where(m, r, 0.0)

    r_imu = jax.vmap(imu_one)(
        problem.imu_pre,
        problem.pose[problem.imu_i],
        problem.speed_bias[problem.imu_i],
        problem.pose[problem.imu_j],
        problem.speed_bias[problem.imu_j],
        problem.imu_mask
        & problem.state_mask[problem.imu_i]
        & problem.state_mask[problem.imu_j],
    )  # [S-1,15]

    def pp_one(p, prior, sq, m):
        r = pose_prior_residual(_T(p), _T(prior), sq)
        return jnp.where(m, r, 0.0)

    r_pp = jax.vmap(pp_one)(
        problem.pose,
        problem.pose_prior,
        problem.pose_prior_sqrt,
        problem.pose_prior_mask & problem.state_mask,
    )  # [S,6]

    def sbp_one(sb, prior, sq, m):
        return jnp.where(m, speed_bias_prior_residual(sb, prior, sq), 0.0)

    r_sbp = jax.vmap(sbp_one)(
        problem.speed_bias,
        problem.sb_prior,
        problem.sb_prior_sqrt,
        problem.sb_prior_mask & problem.state_mask,
    )  # [S,9]

    def rel_one(pi, pj, Tm, sq, m):
        r = relative_pose_residual(_T(pi), _T(pj), _T(Tm), sq)
        return jnp.where(m, r, 0.0)

    r_rel = jax.vmap(rel_one)(
        problem.pose[problem.rel_i],
        problem.pose[problem.rel_j],
        problem.rel_T,
        problem.rel_sqrt,
        problem.rel_mask
        & problem.state_mask[problem.rel_i]
        & problem.state_mask[problem.rel_j],
    )  # [R,6]

    # extrinsics priors (online calibration: PoseError on T_SC)
    r_extp = jax.vmap(pp_one)(
        problem.extrinsics,
        problem.ext_prior,
        problem.ext_prior_sqrt,
        problem.ext_prior_mask,
    )  # [NC,6]

    return r_imu, r_pp, r_sbp, r_rel, r_extp


def problem_cost(
    problem: WindowProblem,
    cameras,
    imu_params: ImuParameters,
    config: SolverConfig = SolverConfig(),
    axis_name=None,
) -> jnp.ndarray:
    """Total robustified cost 0.5 * sum(rho(|r|^2)).

    With `axis_name`, observations are assumed sharded over that mesh axis
    (their partial cost is psum'd); the other factor groups are assumed
    replicated.
    """
    r_obs, _ = _reproj_residuals(problem, cameras)
    s = jnp.sum(r_obs * r_obs, axis=-1)
    c2 = config.cauchy_scale**2
    cost_obs = 0.5 * jnp.sum(c2 * jnp.log1p(s / c2))
    if axis_name is not None:
        cost_obs = jax.lax.psum(cost_obs, axis_name)
    r_imu, r_pp, r_sbp, r_rel, r_extp = _other_residuals(problem, imu_params)
    # landmark priors (HomogeneousPointError): sharded with the landmarks
    m_lp = problem.lm_prior_mask & problem.lm_mask
    d_lp = (problem.landmarks[:, :3] - problem.lm_prior[:, :3]) \
        * problem.lm_prior_sqrt[:, None]
    cost_lp = 0.5 * jnp.sum(
        jnp.where(m_lp[:, None], d_lp * d_lp, 0.0)
    )
    if axis_name is not None:
        cost_lp = jax.lax.psum(cost_lp, axis_name)
    return (
        cost_obs
        + cost_lp
        + 0.5 * jnp.sum(r_imu * r_imu)
        + 0.5 * jnp.sum(r_pp * r_pp)
        + 0.5 * jnp.sum(r_sbp * r_sbp)
        + 0.5 * jnp.sum(r_rel * r_rel)
        + 0.5 * jnp.sum(r_extp * r_extp)
    )


# ---------------------------------------------------------------------------
# linearisation
# ---------------------------------------------------------------------------

def _linearize(problem: WindowProblem, cameras, imu_params, config,
               axis_name=None):
    """Build the Schur-reduced normal equations at the current estimate.

    Returns (Hxx [D,D], bx [D], Hll [L,3,3], bl [L,3], W [L,D,3], free_x [D]).

    With `axis_name`, observation/landmark arrays are assumed sharded over
    that mesh axis: the dense observation contributions to (Hxx, bx) are
    psum'd to replicated; the landmark blocks (Hll, bl, W) stay local.
    """
    S, L, NC, O = problem.S, problem.L, problem.NC, problem.O
    dtype = problem.pose.dtype
    D = S * 6 + S * 9 + NC * 6

    # ---- reprojection terms ------------------------------------------
    pose_o = problem.pose[problem.obs_state]
    hp_o = problem.landmarks[problem.obs_lm]
    ext_o = problem.extrinsics[problem.obs_cam]
    base_mask = (
        problem.obs_mask
        & problem.state_mask[problem.obs_state]
        & problem.lm_mask[problem.obs_lm]
    )

    z6 = jnp.zeros(6, dtype)
    z3 = jnp.zeros(3, dtype)

    Jp = jnp.zeros((O, 2, 6), dtype)
    Je = jnp.zeros((O, 2, 6), dtype)
    Jl = jnp.zeros((O, 2, 3), dtype)
    r0 = jnp.zeros((O, 2), dtype)
    valid_any = jnp.zeros((O,), bool)

    for ci, cam in enumerate(cameras):
        def res_fn(dp, de, dl, p7, e7, hp, uv, w):
            T_WS = _T(_oplus_pose(p7, dp))
            T_SC = _T(_oplus_pose(e7, de))
            hp_p = _oplus_hp(hp, dl)
            T_CW = (T_WS @ T_SC).inverse()
            hp_C = T_CW.apply_homogeneous(hp_p)
            uv_hat, valid = cam.project_homogeneous(hp_C)
            r = (uv_hat - uv) * w
            return jnp.where(valid, r, 0.0), valid

        def val_and_jac(p7, e7, hp, uv, w):
            f = lambda dp, de, dl: res_fn(dp, de, dl, p7, e7, hp, uv, w)[0]
            r = f(z6, z6, z3)
            valid = res_fn(z6, z6, z3, p7, e7, hp, uv, w)[1]
            jp, je, jl = jax.jacfwd(f, argnums=(0, 1, 2))(z6, z6, z3)
            return r, valid, jp, je, jl

        r_c, valid_c, jp_c, je_c, jl_c = jax.vmap(val_and_jac)(
            pose_o, ext_o, hp_o, problem.obs_uv, problem.obs_sqrt_info
        )
        sel = (base_mask & (problem.obs_cam == ci) & valid_c)
        f1 = sel[:, None].astype(dtype)
        f2 = sel[:, None, None].astype(dtype)
        r0 = r0 + r_c * f1
        Jp = Jp + jp_c * f2
        Je = Je + je_c * f2
        Jl = Jl + jl_c * f2
        valid_any = valid_any | sel

    # Cauchy IRLS weights
    w_rob = cauchy_weight(jnp.sum(r0 * r0, axis=-1), config.cauchy_scale)
    w_rob = jnp.where(valid_any, w_rob, 0.0)
    r0 = r0 * w_rob[:, None]
    Jp = Jp * w_rob[:, None, None]
    Je = Je * w_rob[:, None, None]
    Jl = Jl * w_rob[:, None, None]

    # dense state Jacobian [O, 2, D] via one-hot scatter (MXU-friendly)
    oh_s = jax.nn.one_hot(problem.obs_state, S, dtype=dtype)  # [O,S]
    oh_c = jax.nn.one_hot(problem.obs_cam, NC, dtype=dtype)  # [O,NC]
    Jx_pose = jnp.einsum("oij,os->oisj", Jp, oh_s).reshape(O, 2, S * 6)
    Jx_ext = jnp.einsum("oij,oc->oicj", Je, oh_c).reshape(O, 2, NC * 6)
    Jx = jnp.concatenate(
        [Jx_pose, jnp.zeros((O, 2, S * 9), dtype), Jx_ext], axis=-1
    )  # [O,2,D]

    Hxx = jnp.einsum("oid,oie->de", Jx, Jx)
    bx = -jnp.einsum("oid,oi->d", Jx, r0)
    if axis_name is not None:
        # observations are sharded; their dense contribution must be
        # all-reduced before the replicated factors are added
        Hxx = jax.lax.psum(Hxx, axis_name)
        bx = jax.lax.psum(bx, axis_name)

    # landmark blocks via segment-sum over landmark index
    Hll = jax.ops.segment_sum(
        jnp.einsum("oid,oie->ode", Jl, Jl), problem.obs_lm, num_segments=L
    )  # [L,3,3]
    bl = jax.ops.segment_sum(
        -jnp.einsum("oid,oi->od", Jl, r0), problem.obs_lm, num_segments=L
    )  # [L,3]
    # landmark priors: isotropic diagonal block + rhs
    m_lp = (problem.lm_prior_mask & problem.lm_mask).astype(dtype)
    w_lp = (problem.lm_prior_sqrt**2) * m_lp  # [L]
    Hll = Hll + jnp.eye(3, dtype=dtype)[None] * w_lp[:, None, None]
    bl = bl - w_lp[:, None] * (
        problem.landmarks[:, :3] - problem.lm_prior[:, :3]
    )
    W = jax.ops.segment_sum(
        jnp.einsum("oid,oie->ode", Jx, Jl), problem.obs_lm, num_segments=L
    )  # [L,D,3]

    # ---- IMU links ----------------------------------------------------
    z9 = jnp.zeros(9, dtype)

    def imu_val_jac(pre, p0, sb0, p1, sb1):
        f = lambda d0, ds0, d1, ds1: imu_residual(
            imu_params, pre, _T(_oplus_pose(p0, d0)), sb0 + ds0,
            _T(_oplus_pose(p1, d1)), sb1 + ds1,
        )
        r = f(z6, z9, z6, z9)
        j = jax.jacfwd(f, argnums=(0, 1, 2, 3))(z6, z9, z6, z9)
        return r, j

    r_imu, (Ji_p0, Ji_s0, Ji_p1, Ji_s1) = jax.vmap(imu_val_jac)(
        problem.imu_pre,
        problem.pose[problem.imu_i], problem.speed_bias[problem.imu_i],
        problem.pose[problem.imu_j], problem.speed_bias[problem.imu_j],
    )
    m_imu = (
        problem.imu_mask
        & problem.state_mask[problem.imu_i]
        & problem.state_mask[problem.imu_j]
    )
    fi = m_imu[:, None].astype(dtype)
    r_imu = r_imu * fi
    fim = m_imu[:, None, None].astype(dtype)

    oh0 = jax.nn.one_hot(problem.imu_i, S, dtype=dtype)  # [S-1,S]
    oh1 = jax.nn.one_hot(problem.imu_j, S, dtype=dtype)
    Jx_imu = jnp.concatenate(
        [
            (jnp.einsum("kij,ks->kisj", Ji_p0 * fim, oh0)
             + jnp.einsum("kij,ks->kisj", Ji_p1 * fim, oh1)).reshape(S - 1, 15, S * 6),
            (jnp.einsum("kij,ks->kisj", Ji_s0 * fim, oh0)
             + jnp.einsum("kij,ks->kisj", Ji_s1 * fim, oh1)).reshape(S - 1, 15, S * 9),
            jnp.zeros((S - 1, 15, NC * 6), dtype),
        ],
        axis=-1,
    )  # [S-1,15,D]
    Hxx = Hxx + jnp.einsum("kid,kie->de", Jx_imu, Jx_imu)
    bx = bx - jnp.einsum("kid,ki->d", Jx_imu, r_imu)

    # ---- pose priors (block-diagonal, no cross terms) ----------------
    def pp_val_jac(p, prior, sq):
        f = lambda d: pose_prior_residual(_T(_oplus_pose(p, d)), _T(prior), sq)
        return f(z6), jax.jacfwd(f)(z6)

    r_pp, J_pp = jax.vmap(pp_val_jac)(
        problem.pose, problem.pose_prior, problem.pose_prior_sqrt
    )
    m_pp = problem.pose_prior_mask & problem.state_mask
    r_pp = r_pp * m_pp[:, None].astype(dtype)
    J_pp = J_pp * m_pp[:, None, None].astype(dtype)
    # scatter into dense H: per-state 6x6 block on the pose diagonal
    HP = jnp.einsum("sij,sik->sjk", J_pp, J_pp)  # [S,6,6]
    bP = -jnp.einsum("sij,si->sj", J_pp, r_pp)  # [S,6]
    pose_sl = jnp.arange(S * 6).reshape(S, 6)
    Hxx = Hxx.at[pose_sl[:, :, None], pose_sl[:, None, :]].add(HP)
    bx = bx.at[pose_sl].add(bP)

    # ---- speed/bias priors (diagonal whitening) ----------------------
    m_sbp = problem.sb_prior_mask & problem.state_mask
    sqd = problem.sb_prior_sqrt * m_sbp[:, None].astype(dtype)  # [S,9]
    r_sbp = sqd * (problem.speed_bias - problem.sb_prior)
    sb_sl = S * 6 + jnp.arange(S * 9).reshape(S, 9)
    Hxx = Hxx.at[sb_sl.reshape(-1), sb_sl.reshape(-1)].add(
        (sqd * sqd).reshape(-1)
    )
    bx = bx.at[sb_sl].add(-sqd * r_sbp)

    # ---- extrinsics priors (online calibration) -----------------------
    r_ep, J_ep = jax.vmap(pp_val_jac)(
        problem.extrinsics, problem.ext_prior, problem.ext_prior_sqrt
    )
    m_ep = problem.ext_prior_mask
    r_ep = r_ep * m_ep[:, None].astype(dtype)
    J_ep = J_ep * m_ep[:, None, None].astype(dtype)
    HE = jnp.einsum("cij,cik->cjk", J_ep, J_ep)  # [NC,6,6]
    bE = -jnp.einsum("cij,ci->cj", J_ep, r_ep)  # [NC,6]
    ext_sl = S * 15 + jnp.arange(NC * 6).reshape(NC, 6)
    Hxx = Hxx.at[ext_sl[:, :, None], ext_sl[:, None, :]].add(HE)
    bx = bx.at[ext_sl].add(bE)

    # ---- relative pose factors ---------------------------------------
    R = problem.rel_i.shape[0]

    def rel_val_jac(pi, pj, Tm, sq):
        f = lambda di, dj: relative_pose_residual(
            _T(_oplus_pose(pi, di)), _T(_oplus_pose(pj, dj)), _T(Tm), sq
        )
        r = f(z6, z6)
        ji, jj = jax.jacfwd(f, argnums=(0, 1))(z6, z6)
        return r, ji, jj

    r_rel, Jr_i, Jr_j = jax.vmap(rel_val_jac)(
        problem.pose[problem.rel_i],
        problem.pose[problem.rel_j],
        problem.rel_T,
        problem.rel_sqrt,
    )
    m_rel = (
        problem.rel_mask
        & problem.state_mask[problem.rel_i]
        & problem.state_mask[problem.rel_j]
    )
    frel = m_rel[:, None, None].astype(dtype)
    r_rel = r_rel * m_rel[:, None].astype(dtype)
    oh_i = jax.nn.one_hot(problem.rel_i, S, dtype=dtype)
    oh_j = jax.nn.one_hot(problem.rel_j, S, dtype=dtype)
    Jx_rel = jnp.concatenate(
        [
            (jnp.einsum("kij,ks->kisj", Jr_i * frel, oh_i)
             + jnp.einsum("kij,ks->kisj", Jr_j * frel, oh_j)).reshape(R, 6, S * 6),
            jnp.zeros((R, 6, S * 9 + NC * 6), dtype),
        ],
        axis=-1,
    )
    Hxx = Hxx + jnp.einsum("kid,kie->de", Jx_rel, Jx_rel)
    bx = bx - jnp.einsum("kid,ki->d", Jx_rel, r_rel)

    # ---- freeze masks -------------------------------------------------
    free_pose = problem.state_mask & ~problem.pose_frozen
    free_sb = problem.state_mask & ~problem.sb_frozen
    free_ext = ~problem.ext_frozen
    free_x = jnp.concatenate(
        [
            jnp.repeat(free_pose, 6),
            jnp.repeat(free_sb, 9),
            jnp.repeat(free_ext, 6),
        ]
    ).astype(dtype)  # [D]
    Hxx = Hxx * free_x[:, None] * free_x[None, :]
    bx = bx * free_x
    W = W * free_x[None, :, None]

    return Hxx, bx, Hll, bl, W, free_x


def _schur_solve(Hxx, bx, Hll, bl, W, free_x, lm_mask, lam, config,
                 axis_name=None):
    """Damped Schur-complement solve. Returns (dx [D], dl [L,3]).

    With `axis_name`, the landmark blocks are assumed sharded over that
    mesh axis: the reduced system is formed with one psum over the
    Schur contributions (the only collective in the solve — the
    multi-chip full-graph BA design, SURVEY.md §5), the dense solve is
    replicated, and the landmark back-substitution stays local.
    """
    dtype = Hxx.dtype
    D = Hxx.shape[0]
    L = Hll.shape[0]
    eye3 = jnp.eye(3, dtype=dtype)

    # damp landmarks (Marquardt scaling + small absolute floor), mask empties
    diag_ll = jnp.diagonal(Hll, axis1=-2, axis2=-1)  # [L,3]
    has_obs = jnp.sum(diag_ll, axis=-1) > 0.0
    active = lm_mask & has_obs
    damp = lam * diag_ll + config.landmark_damping
    Hll_d = Hll + jnp.eye(3, dtype=dtype) * damp[..., None, :]
    Hll_d = jnp.where(active[:, None, None], Hll_d, eye3)
    bl_m = jnp.where(active[:, None], bl, 0.0)
    from okvis2_tpu.ops.linalg import inv3x3

    Hll_inv = inv3x3(Hll_d)

    # reduced system
    WHinv = jnp.einsum("lds,lst->ldt", W, Hll_inv)  # [L,D,3]
    schur_H = jnp.einsum("ldt,let->de", WHinv, W)
    schur_b = jnp.einsum("ldt,lt->d", WHinv, bl_m)
    if axis_name is not None:
        schur_H = jax.lax.psum(schur_H, axis_name)
        schur_b = jax.lax.psum(schur_b, axis_name)
    S_red = Hxx - schur_H
    b_red = bx - schur_b

    # damp states; pin frozen dims
    diag_xx = jnp.diagonal(Hxx)
    S_red = S_red + jnp.diag(lam * diag_xx + 1e-12)
    S_red = S_red + jnp.diag(1.0 - free_x)

    from okvis2_tpu.ops.linalg import spd_solve

    # Jacobi preconditioning: IMU-bias rows carry information ~1e10 while
    # vision rows are ~1e4; rescaling to unit diagonal keeps the Cholesky
    # stable in float32 on TPU (float64 barely notices)
    d_pre = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S_red), 1e-30))
    S_pre = S_red * d_pre[:, None] * d_pre[None, :]
    dx = d_pre * spd_solve(S_pre, d_pre * b_red)
    dx = dx * free_x

    # back-substitute landmarks
    rhs = bl_m - jnp.einsum("lds,d->ls", W, dx)
    dl = jnp.einsum("lst,lt->ls", Hll_inv, rhs)
    dl = jnp.where(active[:, None], dl, 0.0)
    return dx, dl


def _apply_deltas(problem: WindowProblem, dx, dl) -> WindowProblem:
    S, NC = problem.S, problem.NC
    d_pose = dx[: S * 6].reshape(S, 6)
    d_sb = dx[S * 6 : S * 15].reshape(S, 9)
    d_ext = dx[S * 15 :].reshape(NC, 6)
    return dataclasses_replace(
        problem,
        pose=_oplus_pose(problem.pose, d_pose),
        speed_bias=problem.speed_bias + d_sb,
        extrinsics=_oplus_pose(problem.extrinsics, d_ext),
        landmarks=_oplus_hp(problem.landmarks, dl),
    )


def dataclasses_replace(problem: WindowProblem, **kw) -> WindowProblem:
    import dataclasses

    return dataclasses.replace(problem, **kw)


def solve_window_impl(
    problem: WindowProblem,
    cameras,
    imu_params: ImuParameters,
    config: SolverConfig = SolverConfig(),
    axis_name=None,
):
    """Unjitted LM loop body (jit via `solve_window`, or embed in a larger
    jitted program — including shard_map'd with `axis_name` for the
    landmark-sharded multi-chip full-graph solve). Returns
    (problem', stats dict)."""
    cost0 = problem_cost(problem, cameras, imu_params, config, axis_name)

    def body(carry):
        prob, lam, cost, it, stall = carry
        Hxx, bx, Hll, bl, W, free_x = _linearize(
            prob, cameras, imu_params, config, axis_name
        )
        dx, dl = _schur_solve(
            Hxx, bx, Hll, bl, W, free_x, prob.lm_mask, lam, config,
            axis_name=axis_name,
        )
        cand = _apply_deltas(prob, dx, dl)
        new_cost = problem_cost(cand, cameras, imu_params, config, axis_name)
        accept = new_cost < cost
        prob = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, prob
        )
        lam = jnp.where(
            accept, lam * config.lambda_down, lam * config.lambda_up
        )
        lam = jnp.clip(lam, 1e-12, 1e8)
        rel_dec = (cost - new_cost) / jnp.maximum(cost, 1e-12)
        # stall: accepted-but-negligible decreases; rejects are handled by
        # growing lambda (terminate only when lambda explodes)
        stall = jnp.where(
            accept,
            jnp.where(rel_dec < config.min_cost_decrease, stall + 1, 0),
            stall,
        )
        cost = jnp.where(accept, new_cost, cost)
        return prob, lam, cost, it + 1, stall

    def cond(carry):
        _, lam, _, it, stall = carry
        return (it < config.max_iterations) & (stall < 2) & (lam < 1e7)

    lam0 = jnp.asarray(config.initial_lambda, problem.pose.dtype)
    prob, lam, cost, it, _ = jax.lax.while_loop(
        cond, body, (problem, lam0, cost0, jnp.int32(0), jnp.int32(0))
    )
    stats = {"initial_cost": cost0, "final_cost": cost, "iterations": it,
             "lambda": lam}
    return prob, stats


solve_window = jax.jit(solve_window_impl, static_argnums=(3,))
