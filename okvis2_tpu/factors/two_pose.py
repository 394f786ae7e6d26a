"""Two-pose marginalisation factor construction.

Covers okvis::ceres::TwoPoseGraphError (reference:
okvis_ceres/src/TwoPoseGraphError.cpp:146-387 compute(), :388+
convertToReprojectionErrors) — the heart of OKVIS2's "lossless-ish"
marginalisation: when a keyframe leaves the optimisation window, the
reprojection factors between it and its strongest covisible keyframe are
collapsed into a single 6-DoF relative-pose factor whose information is the
Schur complement of the landmark blocks, linearised **in the reference
pose's frame** so the factor can be relocated rigidly (e.g. by loop
closures).

TPU-native formulation: the whole computation — per-observation Jacobians
(autodiff), landmark Schur complement, eigen-clipped 6x6 sqrt information —
is one jitted program over fixed-shape observation buffers. Reversibility
(convert back to observations on loop closure / final BA) is handled by the
host estimator, which keeps the original observations alongside the factor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation
from okvis2_tpu.factors.reprojection import cauchy_weight


def _T(p7):
    return Transformation(r=p7[..., :3], q=p7[..., 3:7])


def _oplus_pose(pose7, d):
    r = pose7[..., :3] + d[..., :3]
    dq = so3.delta_q(d[..., 3:6])
    q = so3.quat_normalize(so3.quat_multiply(dq, pose7[..., 3:7]))
    return jnp.concatenate([r, q], axis=-1)


@functools.partial(jax.jit, static_argnames=("cauchy_scale",))
def compute_two_pose_factor(
    pose_i7: jnp.ndarray,  # [7] reference keyframe pose T_WSi
    pose_j7: jnp.ndarray,  # [7] marginalised keyframe pose T_WSj
    ext7: jnp.ndarray,  # [NCmax,7] extrinsics
    hp_W: jnp.ndarray,  # [Lc,4] landmarks observed by BOTH frames
    obs: jnp.ndarray,  # [Oc, 6]: (frame(0/1), cam, lm_idx, u, v, sqrt_info)
    obs_mask: jnp.ndarray,  # [Oc]
    lm_mask: jnp.ndarray,  # [Lc]
    cameras: tuple,  # tuple of PinholeCamera (pytree; tuple len is static)
    cauchy_scale: float = 1.0,
):
    """Marginalise the landmarks of a two-frame sub-problem into a 6x6
    sqrt information on the relative pose T_SiSj.

    Returns dict(T_ij [7], sqrt_info [6,6], num_kept) where sqrt_info is
    eigen-clipped PSD (rank <= 6; pure-translation-scale or low-parallax
    directions get small/zero information, like the reference's
    eigendecomposition in TwoPoseGraphError.cpp:334-364).
    """
    dtype = pose_i7.dtype
    Lc = hp_W.shape[0]
    T_Wi = _T(pose_i7)
    T_iW = T_Wi.inverse()
    # landmarks in frame i (the factor's anchor frame)
    hp_i = jax.vmap(T_iW.apply_homogeneous)(hp_W)
    T_ij0 = jnp.concatenate(
        [(T_iW @ _T(pose_j7)).r, (T_iW @ _T(pose_j7)).q]
    )

    z6 = jnp.zeros(6, dtype)
    z3 = jnp.zeros(3, dtype)

    frame_sel = obs[:, 0].astype(jnp.int32)  # 0 = frame i, 1 = frame j
    cam_sel = obs[:, 1].astype(jnp.int32)
    lm_sel = obs[:, 2].astype(jnp.int32)
    uv = obs[:, 3:5]
    w_obs = obs[:, 5]

    Jr = jnp.zeros((obs.shape[0], 2, 6), dtype)
    Jl = jnp.zeros((obs.shape[0], 2, 3), dtype)
    r0 = jnp.zeros((obs.shape[0], 2), dtype)
    valid = jnp.zeros((obs.shape[0],), bool)

    for ci, cam in enumerate(cameras):
        def res(d_ij, d_l, fsel, hp_il, uvm, wm):
            # pose of the observing camera in frame i coords:
            # frame 0 observations: camera at extrinsics only
            # frame 1 observations: at T_ij (perturbed) * extrinsics
            T_ij = _T(_oplus_pose(T_ij0, d_ij))
            hp = jnp.concatenate([hp_il[:3] + d_l, hp_il[3:4]])
            T_ic = _T(ext7[ci])
            # select the transform chain by frame
            T_cam_i_frame0 = T_ic
            T_cam_i_frame1 = T_ij @ T_ic
            r_sel = jnp.where(
                fsel == 0, T_cam_i_frame0.r, T_cam_i_frame1.r
            )
            q_sel = jnp.where(
                fsel == 0, T_cam_i_frame0.q, T_cam_i_frame1.q
            )
            T_cam = Transformation(r=r_sel, q=q_sel).inverse()
            hp_C = T_cam.apply_homogeneous(hp)
            uv_hat, ok = cam.project_homogeneous(hp_C)
            rr = (uv_hat - uvm) * wm
            return jnp.where(ok, rr, 0.0), ok

        def val_jac(fsel, hp_il, uvm, wm):
            f = lambda d_ij, d_l: res(d_ij, d_l, fsel, hp_il, uvm, wm)[0]
            rr = f(z6, z3)
            ok = res(z6, z3, fsel, hp_il, uvm, wm)[1]
            jij, jl = jax.jacfwd(f, argnums=(0, 1))(z6, z3)
            return rr, ok, jij, jl

        r_c, ok_c, jij_c, jl_c = jax.vmap(val_jac)(
            frame_sel, hp_i[lm_sel], uv, w_obs
        )
        sel = obs_mask & (cam_sel == ci) & ok_c & lm_mask[lm_sel]
        f1 = sel[:, None].astype(dtype)
        f2 = sel[:, None, None].astype(dtype)
        r0 = r0 + r_c * f1
        Jr = Jr + jij_c * f2
        Jl = Jl + jl_c * f2
        valid = valid | sel

    # robust (Cauchy) reweighting as in the reference's Triggs correction
    w_rob = cauchy_weight(jnp.sum(r0 * r0, axis=-1), cauchy_scale)
    w_rob = jnp.where(valid, w_rob, 0.0)
    r0 = r0 * w_rob[:, None]
    Jr = Jr * w_rob[:, None, None]
    Jl = Jl * w_rob[:, None, None]

    # normal equation blocks
    Hrr = jnp.einsum("oid,oie->de", Jr, Jr)  # [6,6]
    Hll = jax.ops.segment_sum(
        jnp.einsum("oid,oie->ode", Jl, Jl), lm_sel, num_segments=Lc
    )
    W = jax.ops.segment_sum(
        jnp.einsum("oid,oie->ode", Jr, Jl), lm_sel, num_segments=Lc
    )  # [Lc,6,3]

    from okvis2_tpu.ops.linalg import inv3x3

    eye3 = jnp.eye(3, dtype=dtype)
    diag_ll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
    active = lm_mask & (jnp.sum(diag_ll, axis=-1) > 0)
    Hll_d = jnp.where(
        active[:, None, None], Hll + eye3 * 1e-9, eye3
    )
    Hll_inv = inv3x3(Hll_d)
    H_marg = Hrr - jnp.einsum("lds,lst,let->de", W, Hll_inv, W)
    H_marg = 0.5 * (H_marg + H_marg.T)

    # eigen clip -> PSD sqrt information (reference uses
    # SelfAdjointEigenSolver the same way)
    evals, evecs = jnp.linalg.eigh(H_marg)
    evals = jnp.where(evals > 1e-8, evals, 0.0)
    sqrt_info = jnp.diag(jnp.sqrt(evals)) @ evecs.T

    return {
        "T_ij": T_ij0,
        "sqrt_info": sqrt_info,
        "num_obs": jnp.sum(valid),
        "evals": evals,
    }
