"""Oriented binary pattern descriptor ("TBRISK"), TPU-native.

Replaces the reference's camera-aware BRISK 2 descriptor extraction
(external/brisk BriskDescriptorExtractor, used at
okvis_frontend/src/Frontend.cpp:2410-2417) with a dense batched design:

- a BRISK-style radial sampling pattern (concentric rings, ring-radius-
  proportional smoothing) is precomputed as constants,
- ring smoothing comes from a small stack of box-blurred images (one blur
  per ring) instead of per-sample Gaussian integration,
- orientation is estimated from long-distance pair gradients (as BRISK
  does) and the whole pattern is rotated per keypoint; callers can instead
  pass gravity-aligned extraction directions like the reference's
  `extractionDirection` (Frontend.cpp:231-251) for viewpoint invariance,
- all N keypoints x P pattern points are sampled with one bilinear gather,
  and the 512 comparison pairs become a [N,512] bit tensor.

Descriptors are returned both bit-packed (uint32[16], for host storage /
map serialisation parity with the reference's 48-byte BRISK) and as
"sign" vectors (float ±1 [N,512]) whose Hamming distance is computed by
an MXU matmul in matching.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DESCRIPTOR_BITS = 512


def _build_pattern():
    """BRISK-like pattern: rings of sample points + comparison pairs."""
    ring_r = [0.0, 2.9, 4.9, 7.4, 10.8]
    ring_n = [1, 10, 14, 15, 20]
    pts = []
    ring_id = []
    for ri, (r, n) in enumerate(zip(ring_r, ring_n)):
        for i in range(n):
            a = 2.0 * np.pi * i / n + (0.5 * np.pi * ri / len(ring_r))
            pts.append([r * np.cos(a), r * np.sin(a)])
            ring_id.append(ri)
    pts = np.asarray(pts, np.float64)  # [60,2]
    ring_id = np.asarray(ring_id, np.int32)

    # short-distance pairs -> descriptor bits; long-distance -> orientation
    P = len(pts)
    pairs = []
    dists = []
    long_pairs = []
    for i in range(P):
        for j in range(i + 1, P):
            d = np.linalg.norm(pts[i] - pts[j])
            if d < 9.75:
                pairs.append((i, j))
                dists.append(d)
            elif d > 13.67:
                long_pairs.append((i, j))
    order = np.argsort(dists)
    pairs = np.asarray(pairs, np.int32)[order][:DESCRIPTOR_BITS]
    if len(pairs) < DESCRIPTOR_BITS:
        raise AssertionError(
            f"pattern yields only {len(pairs)} short pairs (<{DESCRIPTOR_BITS})"
        )
    long_pairs = np.asarray(long_pairs, np.int32)
    return pts, ring_id, pairs, long_pairs


_PATTERN, _RING_ID, _PAIRS, _LONG_PAIRS = _build_pattern()
_NUM_RINGS = int(_RING_ID.max()) + 1
# static per-ring point index lists (grouped sampling: each point is
# sampled ONLY from its own ring's blurred image — 5x fewer gathers than
# sample-all-rings-and-select)
_RING_MEMBERS = [
    np.nonzero(_RING_ID == r)[0] for r in range(_NUM_RINGS)
]


def _box_blur(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable box blur of odd width k over [H,W] as shift-adds
    (single-channel convs can't use the MXU; rolls compile to cheap VPU
    ops — the wrap artefact stays inside the detector border margin)."""
    if k <= 1:
        return img
    r = k // 2
    acc = img
    for d in range(1, r + 1):
        acc = acc + jnp.roll(img, d, 0) + jnp.roll(img, -d, 0)
    acc = acc / k
    out = acc
    for d in range(1, r + 1):
        out = out + jnp.roll(acc, d, 1) + jnp.roll(acc, -d, 1)
    return out / k


def nearest_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour sample of [H,W] at xy [...,2] (clamped).

    Used for the outer (box-blurred) descriptor rings: the smoothing
    radius exceeds half a pixel, so nearest sampling loses almost no
    signal but costs 1 gather instead of 4 — the descriptor's dominant
    cost on TPU is gather count.
    """
    H, W = img.shape
    x = jnp.clip(jnp.round(xy[..., 0]), 0.0, W - 1.0).astype(jnp.int32)
    y = jnp.clip(jnp.round(xy[..., 1]), 0.0, H - 1.0).astype(jnp.int32)
    return img[y, x]


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample [H,W] image at xy [...,2] (x right, y down) with clamping."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


@functools.partial(jax.jit, static_argnames=("use_orientation",))
def describe_keypoints(
    image: jnp.ndarray,  # [H,W] float
    xy: jnp.ndarray,  # [N,2]
    size: jnp.ndarray,  # [N] keypoint diameter (scales the pattern)
    mask: jnp.ndarray,  # [N] bool
    extraction_direction: jnp.ndarray | None = None,  # [N] radians, optional
    use_orientation: bool = True,
):
    """Compute binary descriptors.

    Returns dict:
      signs  [N,512] float (+1/-1; 0 rows for invalid keypoints)
      packed [N,16] uint32 bit-packed
      angle  [N] the orientation used
    """
    dtype = image.dtype
    N = xy.shape[0]
    pattern = jnp.asarray(_PATTERN, dtype)  # [P,2]
    ring_id = jnp.asarray(_RING_ID)
    pairs = jnp.asarray(_PAIRS)
    long_pairs = jnp.asarray(_LONG_PAIRS)

    # ring-dependent smoothing stack
    blurred = [_box_blur(image, 2 * r + 1) for r in range(_NUM_RINGS)]

    scale = (size / 9.0)[:, None, None]  # pattern defined for size 9

    def sample_at(angle):
        ca, sa = jnp.cos(angle), jnp.sin(angle)  # [N]
        rot = jnp.stack(
            [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], -2
        )  # [N,2,2]
        pts = jnp.einsum("nij,pj->npi", rot, pattern) * scale + xy[:, None, :]
        # grouped sampling: each ring's member points from its own blur;
        # bilinear only for the sharp centre ring, nearest elsewhere
        vals = jnp.zeros(pts.shape[:2], dtype)
        for r, members in enumerate(_RING_MEMBERS):
            sampler = bilinear_sample if r == 0 else nearest_sample
            v = sampler(blurred[r], pts[:, members, :])
            vals = vals.at[:, members].set(v)
        return vals  # [N,P]

    if use_orientation and extraction_direction is None:
        # orientation from the smoothed image gradient at the keypoint
        # (one N-point gather instead of a full N x P sampling pass; the
        # reference's long-pair gradient estimate needs the latter)
        g_img = blurred[2]
        gx_map = 0.5 * (jnp.roll(g_img, -1, 1) - jnp.roll(g_img, 1, 1))
        gy_map = 0.5 * (jnp.roll(g_img, -1, 0) - jnp.roll(g_img, 1, 0))
        gx = bilinear_sample(gx_map, xy)
        gy = bilinear_sample(gy_map, xy)
        angle = jnp.arctan2(gy, gx)
    elif extraction_direction is not None:
        angle = extraction_direction.astype(dtype)
    else:
        angle = jnp.zeros((N,), dtype)

    vals = sample_at(angle)
    bits = vals[:, pairs[:, 0]] < vals[:, pairs[:, 1]]  # [N,512] bool
    signs = jnp.where(bits, 1.0, -1.0).astype(dtype)
    signs = signs * mask[:, None].astype(dtype)

    # pack into uint32[16]
    b = bits.reshape(N, DESCRIPTOR_BITS // 32, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)

    return {"signs": signs, "packed": packed, "angle": angle}
