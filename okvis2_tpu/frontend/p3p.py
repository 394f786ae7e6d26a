"""Closed-form P3P (Lambda-Twist) and rig absolute-pose RANSAC.

The reference solves absolute pose with opengv's GP3P inside a sequential
RANSAC loop over the whole camera rig (FrameNoncentralAbsoluteAdapter,
okvis_frontend/src/FrameNoncentralAbsoluteAdapter.cpp; RANSAC loop
Frontend.cpp:2208-2278, 50 iterations, threshold 16 px^2).

TPU-native formulation:
- minimal solver: Lambda-Twist P3P (Persson & Nordberg, ECCV 2018) in
  closed form — a single real cubic root by the trigonometric method, a
  rank-2 symmetric 3x3 eigendecomposition via cross products, and a
  3-point Procrustes. No SVD, no LU, no iteration: everything vmaps over
  hundreds of hypotheses in one XLA program (256 hypotheses cost about
  what 1 costs).
- rig handling: each hypothesis samples its 3 correspondences from ONE
  camera (bearings must be central for P3P) with hypothesis slots
  round-robined over cameras, but every hypothesis is scored against the
  correspondences of ALL cameras jointly in the body frame — so the
  accepted model and its inlier set are rig-consistent like the
  reference's GP3P, while the minimal solve stays closed-form.

Sample size 3 (vs the previous DLT-6pt) more than squares the all-inlier
probability per hypothesis and replaces the batched 12x12 normal-matrix
Cholesky chain with a handful of scalar ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation


def _cubic_real_root(c2, c1, c0):
    """One real root of x^3 + c2 x^2 + c1 x + c0 (trigonometric /
    hyperbolic-free Cardano; branch-free for jit)."""
    p = c1 - c2 * c2 / 3.0
    q = 2.0 * c2**3 / 27.0 - c2 * c1 / 3.0 + c0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    sq = jnp.sqrt(jnp.abs(disc))
    # disc > 0: one real root via Cardano with cube roots
    u3 = -q / 2.0 + sq
    v3 = -q / 2.0 - sq
    cbrt = lambda x: jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)
    root_pos = cbrt(u3) + cbrt(v3)
    # disc <= 0: three real roots; take the one via cos branch
    # cos(3t) = 3q / (2p) * sqrt(-3/p)
    safe_p = jnp.where(p < -1e-30, p, -1e-30)
    arg = jnp.clip(
        3.0 * q / (2.0 * safe_p) * jnp.sqrt(-3.0 / safe_p), -1.0, 1.0
    )
    t = jnp.arccos(arg) / 3.0
    root_neg = 2.0 * jnp.sqrt(-safe_p / 3.0) * jnp.cos(t)
    root = jnp.where(disc > 0, root_pos, root_neg)
    return root - c2 / 3.0


def _eig_rank2_sym3(D):
    """Eigendecomposition of a symmetric 3x3 with det ~ 0 (rank <= 2).

    Returns (sigma1, sigma2, u1, u2, u3) with sigma1 >= sigma2 the two
    possibly-nonzero eigenvalues and u3 the (approximate) null vector.
    Closed form: null vector from row cross products, the 2x2 block in
    the orthogonal complement by the quadratic formula.
    """
    dtype = D.dtype
    # null vector: the largest cross product of two rows
    c01 = jnp.cross(D[0], D[1])
    c02 = jnp.cross(D[0], D[2])
    c12 = jnp.cross(D[1], D[2])
    cands = jnp.stack([c01, c02, c12])
    norms = jnp.linalg.norm(cands, axis=-1)
    u3 = cands[jnp.argmax(norms)]
    u3 = u3 / (jnp.linalg.norm(u3) + 1e-30)
    # orthonormal basis of the complement
    a = jnp.where(
        jnp.abs(u3[0]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0], dtype),
        jnp.asarray([0.0, 1.0, 0.0], dtype),
    )
    e1 = jnp.cross(u3, a)
    e1 = e1 / (jnp.linalg.norm(e1) + 1e-30)
    e2 = jnp.cross(u3, e1)
    E = jnp.stack([e1, e2], axis=1)  # [3,2]
    B = E.T @ D @ E  # [2,2] symmetric
    tr = B[0, 0] + B[1, 1]
    dt = B[0, 0] * B[1, 1] - B[0, 1] * B[1, 0]
    s = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - dt, 0.0))
    s1 = tr / 2.0 + s
    s2 = tr / 2.0 - s
    # eigenvector of B for s1: (B - s2 I) column with larger norm
    M1 = B - s2 * jnp.eye(2, dtype=dtype)
    v1 = jnp.where(
        jnp.linalg.norm(M1[:, 0]) > jnp.linalg.norm(M1[:, 1]),
        M1[:, 0], M1[:, 1],
    )
    v1 = v1 / (jnp.linalg.norm(v1) + 1e-30)
    v2 = jnp.asarray([-v1[1], v1[0]], dtype)
    u1 = E @ v1
    u2 = E @ v2
    return s1, s2, u1, u2, u3


def _procrustes_3pt(X_W, Y_C):
    """R, t with Y_C ~= R X_W + t from exactly 3 correspondences, via
    orthonormal triads of the centred difference vectors (closed form,
    no SVD)."""
    def triad(P):
        d1 = P[1] - P[0]
        d2 = P[2] - P[0]
        e1 = d1 / (jnp.linalg.norm(d1) + 1e-30)
        e3 = jnp.cross(d1, d2)
        e3 = e3 / (jnp.linalg.norm(e3) + 1e-30)
        e2 = jnp.cross(e3, e1)
        return jnp.stack([e1, e2, e3], axis=1)  # [3,3] columns

    Bw = triad(X_W)
    Bc = triad(Y_C)
    R = Bc @ Bw.T
    t = jnp.mean(Y_C, axis=0) - R @ jnp.mean(X_W, axis=0)
    return R, t


def p3p_lambda_twist(x_W: jnp.ndarray, y_C: jnp.ndarray):
    """Up to 4 camera poses from 3 world points + 3 unit bearings.

    x_W [3,3] world points, y_C [3,3] unit bearing vectors (camera frame).
    Returns (R [4,3,3], t [4,3], valid [4]) with y ~ normalize(R x + t).
    """
    dtype = x_W.dtype
    a12 = jnp.sum((x_W[0] - x_W[1]) ** 2)
    a13 = jnp.sum((x_W[0] - x_W[2]) ** 2)
    a23 = jnp.sum((x_W[1] - x_W[2]) ** 2)
    b12 = jnp.dot(y_C[0], y_C[1])
    b13 = jnp.dot(y_C[0], y_C[2])
    b23 = jnp.dot(y_C[1], y_C[2])

    z = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    M12 = jnp.asarray([[one, -b12, z], [-b12, one, z], [z, z, z]])
    M13 = jnp.asarray([[one, z, -b13], [z, z, z], [-b13, z, one]])
    M23 = jnp.asarray([[z, z, z], [z, one, -b23], [z, -b23, one]])

    # homogeneous quadrics: lam^T D lam = 0
    D1 = M12 * a23 - M23 * a12
    D2 = M13 * a23 - M23 * a13

    # det(D1 + g D2) = 0: cubic c3 g^3 + ... + c0
    def detm(A):
        return jnp.linalg.det(A)

    c3 = detm(D2)
    c0 = detm(D1)
    # middle coefficients by row-multilinearity of det: gamma^1 collects
    # the terms with exactly ONE row taken from D2, gamma^2 with two
    c1 = (detm(jnp.stack([D2[0], D1[1], D1[2]]))
          + detm(jnp.stack([D1[0], D2[1], D1[2]]))
          + detm(jnp.stack([D1[0], D1[1], D2[2]])))
    c2 = (detm(jnp.stack([D1[0], D2[1], D2[2]]))
          + detm(jnp.stack([D2[0], D1[1], D2[2]]))
          + detm(jnp.stack([D2[0], D2[1], D1[2]])))
    safe_c3 = jnp.where(jnp.abs(c3) > 1e-20, c3, 1e-20)
    gamma = _cubic_real_root(c2 / safe_c3, c1 / safe_c3, c0 / safe_c3)
    D0 = D1 + gamma * D2  # rank 2, signature (+,-,0)

    s1, s2, u1, u2, u3 = _eig_rank2_sym3(D0)
    # lam^T D0 lam = s1 (u1.lam)^2 + s2 (u2.lam)^2 = 0
    # => u1.lam = +/- tau u2.lam, tau = sqrt(-s2/s1)
    tau = jnp.sqrt(jnp.maximum(-s2 / jnp.where(jnp.abs(s1) > 1e-30, s1, 1e-30), 0.0))

    def branch(sgn):
        # direction d in the plane {(u1 - sgn*tau*u2).lam = 0} intersected
        # with null space: lam = alpha * v + beta * u3 won't hold in
        # general; instead parametrise lam on the 2D subspace orthogonal
        # to w = u1 - sgn*tau*u2
        w = u1 - sgn * tau * u2
        # basis of w's orthogonal complement
        aa = jnp.where(
            jnp.abs(w[0]) < 0.9,
            jnp.asarray([1.0, 0.0, 0.0], dtype),
            jnp.asarray([0.0, 1.0, 0.0], dtype),
        )
        wn = w / (jnp.linalg.norm(w) + 1e-30)
        p1 = jnp.cross(wn, aa)
        p1 = p1 / (jnp.linalg.norm(p1) + 1e-30)
        p2 = jnp.cross(wn, p1)
        # lam = a (p1 + r p2) in the plane. On this plane lam^T D0 lam = 0
        # holds by construction; enforcing lam^T D1 lam = 0 (quadratic in
        # r) makes D2 = 0 follow, and the scale a comes from the one
        # inhomogeneous constraint lam^T M23 lam = a23.
        A1 = p1 @ D1 @ p1
        B1 = p1 @ D1 @ p2
        C1 = p2 @ D1 @ p2
        disc = B1 * B1 - A1 * C1
        ok_r = disc >= 0
        sqd = jnp.sqrt(jnp.maximum(disc, 0.0))
        safe_C1 = jnp.where(jnp.abs(C1) > 1e-20, C1, 1e-20)
        roots = jnp.stack(
            [(-B1 + sqd) / safe_C1, (-B1 - sqd) / safe_C1]
        )

        def lam_of(r):
            d = p1 + r * p2
            denom = d @ M23 @ d
            a2 = a23 / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
            ok = (a2 > 0) & (denom > 1e-20)
            a = jnp.sqrt(jnp.maximum(a2, 0.0))
            lam = a * d
            # depths must be positive; flip overall sign if negative
            lam = jnp.where(jnp.sum(lam) < 0, -lam, lam)
            ok = ok & jnp.all(lam > 0)
            return lam, ok

        lams, oks = jax.vmap(lam_of)(roots)
        return lams, oks & ok_r

    lams_p, ok_p = branch(jnp.asarray(1.0, dtype))
    lams_m, ok_m = branch(jnp.asarray(-1.0, dtype))
    lams = jnp.concatenate([lams_p, lams_m])  # [4,3]
    oks = jnp.concatenate([ok_p, ok_m])

    def pose_of(lam, ok):
        Y = lam[:, None] * y_C  # points in camera frame
        R, t = _procrustes_3pt(x_W, Y)
        return R, t, ok

    Rs, ts, valid = jax.vmap(pose_of)(lams, oks)
    return Rs, ts, valid


def ransac_rig_pose_impl(
    key,
    pts_W: jnp.ndarray,  # [N,3] landmark positions
    rays_C: jnp.ndarray,  # [N,3] unit bearings in each obs's OWN camera
    cam_idx: jnp.ndarray,  # [N] int32 camera of each correspondence
    mask: jnp.ndarray,  # [N] bool
    T_SC: jnp.ndarray,  # [NC,7] rig extrinsics
    threshold_deg: float = 0.6,
    n_hyp: int = 128,
    min_inliers: int = 10,
):
    """Rig-consistent absolute-pose RANSAC (runRansac3d2d role,
    Frontend.cpp:2208-2278; non-central like the reference's GP3P in
    scoring, central per-camera in hypothesis generation — see module
    docstring). Returns T_SW (body-from-world) + joint inlier set."""
    N = pts_W.shape[0]
    NC = T_SC.shape[0]
    dtype = pts_W.dtype

    # per-camera sampling weights: hypothesis h samples from camera h % NC
    keys = jax.random.split(key, n_hyp)
    cam_of_hyp = jnp.arange(n_hyp, dtype=jnp.int32) % NC

    def sample_one(k, cam):
        w = (mask & (cam_idx == cam)).astype(dtype)
        g = jax.random.gumbel(k, (N,)) + jnp.log(w + 1e-30)
        return jax.lax.top_k(g, 3)[1]

    idx = jax.vmap(sample_one)(keys, cam_of_hyp)  # [H,3]

    def solve_one(ii, cam):
        Rs, ts, valid = p3p_lambda_twist(pts_W[ii], rays_C[ii])
        # camera pose -> body pose: T_SW = T_SC @ T_CW
        T_sc = Transformation(r=T_SC[cam, :3], q=T_SC[cam, 3:7])
        R_sc = so3.quat_to_matrix(T_sc.q)

        def to_body(R_cw, t_cw):
            R_sw = R_sc @ R_cw
            t_sw = R_sc @ t_cw + T_sc.r
            return R_sw, t_sw

        R_sw, t_sw = jax.vmap(to_body)(Rs, ts)
        return R_sw, t_sw, valid

    Rs, ts, valid = jax.vmap(solve_one)(idx, cam_of_hyp)
    H4 = n_hyp * 4
    Rs = Rs.reshape(H4, 3, 3)
    ts = ts.reshape(H4, 3)
    valid = valid.reshape(H4)

    # score every candidate against ALL correspondences (rig-joint):
    # p_C = R_CS (R_SW p_W + t_SW) + t_CS per row's own camera
    R_sc_all = so3.quat_to_matrix(T_SC[:, 3:7])  # [NC,3,3]
    R_cs = jnp.swapaxes(R_sc_all, -1, -2)
    t_cs = -jnp.einsum("cij,cj->ci", R_cs, T_SC[:, :3])
    R_cs_o = R_cs[cam_idx]  # [N,3,3]
    t_cs_o = t_cs[cam_idx]  # [N,3]

    p_S = jnp.einsum("hij,nj->hni", Rs, pts_W) + ts[:, None, :]  # [H4,N,3]
    p_C = jnp.einsum("nij,hnj->hni", R_cs_o, p_S) + t_cs_o[None]
    p_n = p_C / (jnp.linalg.norm(p_C, axis=-1, keepdims=True) + 1e-12)
    cosang = jnp.einsum("hni,ni->hn", p_n, rays_C)
    cos_th = jnp.cos(jnp.deg2rad(jnp.asarray(threshold_deg, dtype)))
    inl = (cosang > cos_th) & mask[None, :]
    scores = jnp.where(valid, jnp.sum(inl, axis=1), -1)
    best = jnp.argmax(scores)
    n_in = scores[best]
    R_b, t_b = Rs[best], ts[best]
    # T_SW -> T_WS for the caller
    R_ws = R_b.T
    t_ws = -R_ws @ t_b
    return {
        "T_WS": Transformation(r=t_ws, q=so3.matrix_to_quat(R_ws)),
        "inliers": inl[best],
        "num_inliers": n_in,
        "ok": n_in >= min_inliers,
    }


ransac_rig_pose = jax.jit(
    ransac_rig_pose_impl, static_argnames=("n_hyp", "min_inliers")
)
