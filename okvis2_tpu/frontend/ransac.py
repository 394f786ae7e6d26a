"""Batched-hypothesis RANSAC in JAX.

Replaces the reference's sequential opengv RANSAC loops (GP3P absolute
pose, Stewenius 5-pt relative, 2-pt rotation-only — okvis_frontend/src/
Frontend.cpp:2208-2334) with the TPU-native formulation: sample ALL
hypotheses up front, solve every minimal problem with one vmapped SVD
batch, score all hypotheses against all correspondences with one einsum,
and take the argmax. 256 hypotheses cost about what 1 costs on device, so
we use sample sizes larger than minimal (DLT-6pt instead of P3P) and win
back robustness with hypothesis count (reference: 50 iterations,
threshold 16 px^2 — Frontend.cpp:2235-2236).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation


def _sample_indices(key, n_hyp, sample_size, n, weights):
    """[n_hyp, sample_size] indices drawn per hypothesis (with replacement
    across hypotheses, approximately without replacement within one)."""
    keys = jax.random.split(key, n_hyp)

    def one(k):
        # Gumbel top-k trick: distinct indices, probability ~ weights
        g = jax.random.gumbel(k, (n,)) + jnp.log(weights + 1e-30)
        return jax.lax.top_k(g, sample_size)[1]

    return jax.vmap(one)(keys)


def _null_vector(M: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of a small PSD matrix by
    inverse iteration (Cholesky solves) — both eigh and SVD are slow
    iterative lowerings on TPU; 4 inverse iterations resolve the null
    direction of a RANSAC normal matrix to working precision."""
    import jax.scipy.linalg as jsl

    d = M.shape[0]
    eps = 1e-9 * jnp.trace(M) + 1e-30
    L = jnp.linalg.cholesky(M + eps * jnp.eye(d, dtype=M.dtype))
    x = jnp.ones((d,), M.dtype)
    for _ in range(4):
        x = jsl.cho_solve((L, True), x)
        x = x / (jnp.linalg.norm(x) + 1e-30)
    return x


def _dlt_pose(points_W: jnp.ndarray, rays_C: jnp.ndarray):
    """Absolute pose from >=6 3D-ray correspondences by DLT + procrustes.

    points_W [K,3], rays_C [K,3] (unit bearing vectors in camera frame).
    Returns (R_CW [3,3], t_CW [3]).
    """
    K = points_W.shape[0]
    # DLT on the projective equations: ray x (R p + t) = 0 (cross product)
    # rows: [p^T kron [rx]_x | [rx]_x] . vec([R|t]) = 0
    rx = so3.cross_mx(rays_C)  # [K,3,3]
    # unknown vector m = [r11..r13, r21..r23, r31..r33, t1..t3] (12)
    A_R = jnp.einsum("kij,kl->kijl", rx, points_W).reshape(K, 3, 9)
    A = jnp.concatenate([A_R, rx], axis=-1).reshape(K * 3, 12)
    # null vector = eigenvector of A^T A with the smallest eigenvalue
    m = _null_vector(A.T @ A)
    R_raw = m[:9].reshape(3, 3)
    t_raw = m[9:12]
    # project to SO(3) via Newton polar decomposition (closed-form 3x3
    # adjugate inverses; batched 3x3 SVD is a slow iterative lowering on
    # TPU): first fix the sign so det > 0, normalise scale, then iterate
    # X <- (X + X^-T)/2 which converges quadratically to the orthogonal
    # polar factor
    from okvis2_tpu.ops.linalg import inv3x3

    det_raw = jnp.linalg.det(R_raw)
    sign = jnp.where(det_raw < 0, -1.0, 1.0)
    scale = sign * jnp.abs(det_raw) ** (1.0 / 3.0)
    safe_scale = jnp.where(jnp.abs(scale) > 1e-12, scale, 1e-12)
    X = R_raw / safe_scale
    for _ in range(5):
        X = 0.5 * (X + inv3x3(X).T)
    R = X
    t = t_raw / safe_scale
    # NOTE: after det-normalising R there is no remaining sign freedom
    # (the null vector's global sign flips R and t together, and the
    # sign of det fixes it), so no cheirality flip is applied here —
    # behind-camera hypotheses simply score zero inliers in the RANSAC
    # (angular scoring) and are rejected.
    z = (points_W @ R.T + t)[:, 2]
    in_front = jnp.sum(jnp.sign(z)) >= 0
    return R, t, ~in_front


@functools.partial(jax.jit, static_argnames=("n_hyp", "sample_size"))
def ransac_absolute_pose(
    key,
    points_W: jnp.ndarray,  # [N,3] landmark positions
    rays_C: jnp.ndarray,  # [N,3] unit bearings in camera frame
    mask: jnp.ndarray,  # [N] bool valid correspondences
    threshold_deg: float = 0.6,  # angular inlier threshold (~4px at f=460)
    n_hyp: int = 256,
    sample_size: int = 6,
):
    """Central absolute-pose RANSAC (reference runRansac3d2d,
    Frontend.cpp:2208-2278). Returns dict with T_CW, inliers [N], ok."""
    N = points_W.shape[0]
    w = mask.astype(points_W.dtype)
    idx = _sample_indices(key, n_hyp, sample_size, N, w)  # [H,ss]

    def solve_one(ii):
        R, t, _ = _dlt_pose(points_W[ii], rays_C[ii])
        return R, t

    Rs, ts = jax.vmap(solve_one)(idx)  # [H,3,3], [H,3]

    # score: angular error between measured ray and predicted direction
    pred = jnp.einsum("hij,nj->hni", Rs, points_W) + ts[:, None, :]
    pred_n = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-12)
    cosang = jnp.einsum("hni,ni->hn", pred_n, rays_C)
    cos_th = jnp.cos(jnp.deg2rad(threshold_deg))
    inl = (cosang > cos_th) & mask[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    R_best, t_best = Rs[best], ts[best]
    inliers = inl[best]
    n_in = scores[best]
    T_CW = Transformation(
        r=t_best, q=so3.matrix_to_quat(R_best)
    )
    return {
        "T_CW": T_CW,
        "inliers": inliers,
        "num_inliers": n_in,
        "ok": n_in >= 10,
    }


def _rotation_from_pairs(d1: jnp.ndarray, d2: jnp.ndarray):
    """Wahba/procrustes rotation R with d2 ~= R d1. d1,d2 [K,3] unit."""
    B = jnp.einsum("ki,kj->ij", d2, d1)
    u, _, vt = jnp.linalg.svd(B)
    det = jnp.linalg.det(u @ vt)
    d = jnp.asarray([1.0, 1.0, 0.0], B.dtype) + jnp.asarray(
        [0.0, 0.0, 1.0], B.dtype
    ) * det
    return u @ jnp.diag(d) @ vt


@functools.partial(jax.jit, static_argnames=("n_hyp", "sample_size"))
def ransac_rotation_only(
    key,
    rays_A: jnp.ndarray,  # [N,3] unit bearings in frame A
    rays_B: jnp.ndarray,  # [N,3] matching bearings in frame B
    mask: jnp.ndarray,
    threshold_deg: float = 0.5,
    n_hyp: int = 128,
    sample_size: int = 2,
):
    """2-pt rotation-only RANSAC (reference rotation-only 2D2D,
    Frontend.cpp:2311-2334) — used to detect pure-rotation motion."""
    N = rays_A.shape[0]
    w = mask.astype(rays_A.dtype)
    idx = _sample_indices(key, n_hyp, sample_size, N, w)
    Rs = jax.vmap(lambda ii: _rotation_from_pairs(rays_A[ii], rays_B[ii]))(idx)
    pred = jnp.einsum("hij,nj->hni", Rs, rays_A)
    cosang = jnp.einsum("hni,ni->hn", pred, rays_B)
    inl = (cosang > jnp.cos(jnp.deg2rad(threshold_deg))) & mask[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    return {
        "R_BA": Rs[best],
        "inliers": inl[best],
        "num_inliers": scores[best],
    }


def _essential_8pt(rays_A: jnp.ndarray, rays_B: jnp.ndarray):
    """Essential matrix from >=8 bearing pairs (8-point directly on UNIT
    bearings: b^T E a = 0 without plane normalisation, so rays with
    z <= 0 — in-FOV for >180 deg fisheye rigs like tumvi equidistant —
    stay well-conditioned, matching opengv's bearing formulation)."""
    a = rays_A
    b = rays_B
    # row = kron(b, a)
    A = jnp.einsum("ki,kj->kij", b, a).reshape(-1, 9)  # [K,9]
    E = _null_vector(A.T @ A).reshape(3, 3)
    # enforce rank-2 with equal singular values
    u, s, vt2 = jnp.linalg.svd(E)
    E = u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ vt2
    return E


@functools.partial(jax.jit, static_argnames=("n_hyp", "sample_size"))
def ransac_relative_pose(
    key,
    rays_A: jnp.ndarray,
    rays_B: jnp.ndarray,
    mask: jnp.ndarray,
    threshold: float = 2e-3,  # angular epipolar residual [rad] (~1px@f500)
    n_hyp: int = 256,
    sample_size: int = 8,
):
    """Relative-pose (essential-matrix) RANSAC — stands in for the
    reference's Stewenius 5-pt (Frontend.cpp:2311-2330); the 8-pt solver
    batches as one SVD and the extra 3 samples are covered by hypothesis
    count. Residuals are ANGULAR (sine of the bearing's angle out of the
    epipolar plane), valid for any FOV. Returns the best essential
    matrix + inliers; callers decompose E and triangulate."""
    N = rays_A.shape[0]
    w = mask.astype(rays_A.dtype)
    idx = _sample_indices(key, n_hyp, sample_size, N, w)
    Es = jax.vmap(lambda ii: _essential_8pt(rays_A[ii], rays_B[ii]))(idx)

    Ea = jnp.einsum("hij,nj->hni", Es, rays_A)
    Etb = jnp.einsum("hji,nj->hni", Es, rays_B)
    num = jnp.einsum("ni,hni->hn", rays_B, Ea) ** 2
    den = (
        jnp.sum(Ea * Ea, -1) + jnp.sum(Etb * Etb, -1)
    )
    sampson = num / (den + 1e-18)
    inl = (sampson < threshold * threshold) & mask[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    return {
        "E": Es[best],
        "inliers": inl[best],
        "num_inliers": scores[best],
    }


def decompose_essential(E: jnp.ndarray, ray_A: jnp.ndarray, ray_B: jnp.ndarray):
    """Decompose E into the (R_BA, t_BA) candidate with positive depths
    for the given sample correspondence (cheirality check)."""
    u, _, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]

    def depth_ok(R, t):
        # triangulate single pair: z-depths in both frames positive?
        e1 = ray_A
        e2 = R.T @ ray_B  # direction of B-ray in A frame
        b_ = -R.T @ t
        a11 = jnp.dot(e1, e1)
        a12 = -jnp.dot(e1, e2)
        a22 = jnp.dot(e2, e2)
        b1 = jnp.dot(b_, e1)
        b2 = -jnp.dot(b_, e2)
        det = a11 * a22 - a12 * a12
        l1 = (a22 * b1 - a12 * b2) / det
        l2 = (a11 * b2 - a12 * b1) / det
        return (l1 > 0) & (l2 > 0)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    oks = jnp.stack([depth_ok(R, tt) for R, tt in cands])
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    best = jnp.argmax(oks)
    return Rs[best], ts[best]
