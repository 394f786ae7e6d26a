"""Small dense linear-algebra helpers.

All solves in this framework are SPD (normal equations, covariances), so we
route everything through Cholesky/adjugate forms. This is both the right
numerical choice and a practical necessity: LU-based lowerings
(jnp.linalg.inv/solve) are avoided entirely.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of [..., 3, 3] matrices.

    Used for the batched landmark-block inverses in the Schur complement
    (the blocks are damped SPD, so the determinant is bounded away from 0).
    """
    a = A[..., 0, 0]; b = A[..., 0, 1]; c = A[..., 0, 2]
    d = A[..., 1, 0]; e = A[..., 1, 1]; f = A[..., 1, 2]
    g = A[..., 2, 0]; h = A[..., 2, 1]; i = A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    safe_det = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj / safe_det[..., None, None]


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for SPD A via Cholesky."""
    L = jnp.linalg.cholesky(A)
    return jsl.cho_solve((L, True), b)


def spd_inverse_sqrt(P: jnp.ndarray) -> jnp.ndarray:
    """U with U^T U = P^{-1} (whitening matrix) for SPD P, via U = L^{-1}.

    The reference obtains the same object with an eigendecomposition or LLT
    of the information matrix (ImuError.cpp:478-487); inverting the
    covariance Cholesky factor is cheaper and equally valid:
    ||L^{-1} r||^2 = r^T P^{-1} r.
    """
    L = jnp.linalg.cholesky(P)
    eye = jnp.broadcast_to(jnp.eye(P.shape[-1], dtype=P.dtype), P.shape)
    return jsl.solve_triangular(L, eye, lower=True)
