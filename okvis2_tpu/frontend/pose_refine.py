"""Small fixed-iteration pose-only GN refine + 6x6 Hessian.

The reference refines a recognised place's pose with a mini ceres solve
over the inlier reprojection errors and derives the loop-closure edge's
information from the resulting 6x6 Hessian
(okvis_frontend/src/Frontend.cpp:440-530). This is the TPU-native
equivalent: a fixed-count Gauss-Newton loop on angular residuals between
measured bearings and predicted directions, vmappable and LU-free
(6x6 solve via Cholesky).

Used for loop-closure verification (full_graph.py) so the edge carries
measured information instead of a guessed diagonal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation


def _residuals(T_SW7, pts_W, rays_C, R_cs, t_cs, weights):
    """Tangent-plane angular residuals [N,2] of predicted directions vs
    measured bearings, whitened by `weights` (≈ 1/sigma_angle)."""
    T = Transformation(r=T_SW7[:3], q=T_SW7[3:7])
    p_S = jax.vmap(T.apply)(pts_W)
    p_C = jnp.einsum("nij,nj->ni", R_cs, p_S) + t_cs
    p_n = p_C / (jnp.linalg.norm(p_C, axis=-1, keepdims=True) + 1e-12)
    # tangent basis of each measured ray
    a = jnp.where(
        jnp.abs(rays_C[:, 0:1]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0], rays_C.dtype),
        jnp.asarray([0.0, 1.0, 0.0], rays_C.dtype),
    )
    e1 = jnp.cross(rays_C, a)
    e1 = e1 / (jnp.linalg.norm(e1, axis=-1, keepdims=True) + 1e-12)
    e2 = jnp.cross(rays_C, e1)
    r = jnp.stack(
        [jnp.sum(p_n * e1, -1), jnp.sum(p_n * e2, -1)], axis=-1
    )  # [N,2] ~ 0 at alignment
    return r * weights[:, None]


@functools.partial(jax.jit, static_argnames=("n_iter",))
def refine_pose_hessian(
    T_SW7_init: jnp.ndarray,  # [7] body-from-world initial guess
    pts_W: jnp.ndarray,  # [N,3]
    rays_C: jnp.ndarray,  # [N,3] measured unit bearings (own camera)
    cam_idx: jnp.ndarray,  # [N]
    mask: jnp.ndarray,  # [N]
    T_SC7: jnp.ndarray,  # [NC,7]
    angle_sigma: float = 0.002,  # ~1px at f=460
    n_iter: int = 5,
):
    """GN-refine T_SW on the inlier set; returns (T_SW7, H [6,6],
    sqrt_info [6,6]). H is the Gauss-Newton Hessian in the minimal
    [dr, dtheta] parametrisation — the edge information the reference
    extracts from its mini ceres solve."""
    dtype = pts_W.dtype
    R_sc = so3.quat_to_matrix(T_SC7[:, 3:7])
    R_cs_all = jnp.swapaxes(R_sc, -1, -2)
    t_cs_all = -jnp.einsum("cij,cj->ci", R_cs_all, T_SC7[:, :3])
    R_cs = R_cs_all[cam_idx]
    t_cs = t_cs_all[cam_idx]
    w = mask.astype(dtype) / angle_sigma

    def oplus(T7, d):
        r = T7[:3] + d[:3]
        dq = so3.delta_q(d[3:6])
        q = so3.quat_normalize(so3.quat_multiply(dq, T7[3:7]))
        return jnp.concatenate([r, q])

    def step(T7, _):
        f = lambda d: _residuals(
            oplus(T7, d), pts_W, rays_C, R_cs, t_cs, w
        ).ravel()
        z = jnp.zeros(6, dtype)
        r = f(z)
        J = jax.jacfwd(f)(z)  # [2N,6]
        H = J.T @ J
        g = J.T @ r
        Hd = H + 1e-8 * jnp.eye(6, dtype=dtype) * (1.0 + jnp.diag(H))
        L = jnp.linalg.cholesky(Hd)
        d = -jax.scipy.linalg.cho_solve((L, True), g)
        return oplus(T7, d), H

    T7, _ = jax.lax.scan(step, T_SW7_init.astype(dtype), None, length=n_iter)
    # the scan's last Hessian is evaluated at the SECOND-TO-LAST iterate
    # (each step computes J before applying its update); the edge
    # information must match the returned refined pose, so evaluate
    # J^T J once more at the final pose
    f_final = lambda d: _residuals(
        oplus(T7, d), pts_W, rays_C, R_cs, t_cs, w
    ).ravel()
    J = jax.jacfwd(f_final)(jnp.zeros(6, dtype))
    H = J.T @ J
    # sqrt-information via Cholesky of H (already PSD)
    Hd = H + 1e-10 * jnp.eye(6, dtype=dtype)
    sqrt_info = jnp.linalg.cholesky(Hd).T  # upper-triangular factor
    return T7, H, sqrt_info
