"""Descriptor matching as MXU matmuls.

Replaces the reference's multithreaded SSE Hamming-popcount matching
(brisk::Hamming::PopcntofXORed over 48-byte descriptors, sharded over
`num_matching_threads` — okvis_frontend/src/Frontend.cpp:1362-1385,
1515-1719) with a single matrix multiply: for sign vectors a,b in {-1,+1}^B,

    hamming(a, b) = (B - a.b) / 2

so an [N,B] x [B,M] matmul computes the full distance matrix on the MXU —
the TPU-native form of "compare all descriptors against all descriptors".
Gating (mask, image-space radius, epipolar distance) is applied as masks on
the distance matrix, and mutual-best + threshold selection replaces the
reference's per-keypoint loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from okvis2_tpu.frontend.descriptor import DESCRIPTOR_BITS


def hamming_distance_matrix(
    signs_a: jnp.ndarray,  # [N,B] ±1 (0 rows = invalid)
    signs_b: jnp.ndarray,  # [M,B]
) -> jnp.ndarray:
    """[N,M] Hamming distances (float). Invalid rows give distance B/2."""
    # ±1 inputs are exact in bf16 and the MXU accumulates in f32, so this
    # matmul may run at fast (default) precision despite the framework's
    # global 'highest' setting
    with jax.default_matmul_precision("default"):
        dot = jnp.einsum(
            "nb,mb->nm", signs_a, signs_b,
            preferred_element_type=signs_a.dtype,
        )
    return 0.5 * (DESCRIPTOR_BITS - dot)


@functools.partial(jax.jit, static_argnames=("max_distance",))
def match_descriptors(
    signs_a: jnp.ndarray,
    mask_a: jnp.ndarray,  # [N] bool
    signs_b: jnp.ndarray,
    mask_b: jnp.ndarray,  # [M] bool
    max_distance: int = 60,  # matching threshold (config/euroc.yaml:65)
    gate: jnp.ndarray | None = None,  # [N,M] bool extra gating (epipolar etc.)
):
    """Mutual-nearest matching with a Hamming threshold.

    Returns dict:
      idx_b  [N] int32: best match in b for each a (or -1)
      dist   [N] float: its distance
      valid  [N] bool
    """
    BIG = jnp.asarray(1e9, signs_a.dtype)
    d = hamming_distance_matrix(signs_a, signs_b)
    m = mask_a[:, None] & mask_b[None, :]
    if gate is not None:
        m = m & gate
    d = jnp.where(m, d, BIG)

    best_b = jnp.argmin(d, axis=1)  # [N]
    best_d = jnp.min(d, axis=1)
    best_a_of_b = jnp.argmin(d, axis=0)  # [M]
    mutual = best_a_of_b[best_b] == jnp.arange(d.shape[0])
    valid = mutual & (best_d <= max_distance) & mask_a
    return {
        "idx_b": jnp.where(valid, best_b, -1).astype(jnp.int32),
        "dist": best_d,
        "valid": valid,
    }
