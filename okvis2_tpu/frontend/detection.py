"""Multi-scale Harris keypoint detection, TPU-native.

Replaces the reference's BRISK scale-space AGAST/Harris detector
(external/brisk, used via brisk::ScaleSpaceFeatureDetector<
HarrisScoreCalculator>, okvis_frontend/src/Frontend.cpp:2398-2417) with a
dense XLA formulation that maps onto conv/VPU hardware:

- image pyramid by 2x2 average-pool octaves (detection_octaves,
  config/euroc.yaml:66),
- Harris corner response per octave from Sobel gradients + box-filtered
  structure tensor (pure convs — XLA fuses the whole chain),
- 3x3 non-max suppression (max-pool equality) instead of AGAST's
  sequential suppression,
- spatial uniformity via per-grid-cell top-k then global top-k, the
  fixed-shape analogue of BRISK's uniformity-radius suppression
  (detection_threshold ~ radius, config/euroc.yaml:63),
- absolute response threshold (absolute_threshold, euroc.yaml:64) applied
  as a validity mask — output shapes are static [N_max].

Everything runs batched over images: detect_keypoints works on [H,W] or
[B,H,W] (vmapped), so a multi-camera rig is one device call — the
TPU equivalent of the reference's thread-per-camera parallel detection
(ThreadedSlam.cpp:360-384).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    max_keypoints: int = 512  # per image (<=700 EuRoC, euroc.yaml:67)
    octaves: int = 1  # detection_octaves (0 in EuRoC config == 1 level here)
    cell_size: int = 32  # uniformity grid cell (px)
    per_cell: int = 8  # max keypoints per cell before global top-k
    absolute_threshold: float = 1e-4  # on normalised Harris response
    harris_k: float = 0.04
    border: int = 16  # reject keypoints near the border (descriptor support)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Cyclic shift — single-channel 3x3 stencils compile to cheap VPU
    shift-adds this way, several times faster on TPU than the general
    conv lowering (1-channel convs can't use the MXU). The 1-px wrap
    artefact at the border is inside the detector's `border` margin."""
    return jnp.roll(img, (dy, dx), axis=(0, 1))


def _box3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 box filter as separable shift-adds."""
    row = _shift(img, 0, -1) + img + _shift(img, 0, 1)
    return (_shift(row, -1, 0) + row + _shift(row, 1, 0)) * (1.0 / 9.0)


def harris_response(img: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Harris corner response map for [H,W] image in [0,1].

    Sobel gradients + box-filtered structure tensor, all as shift-adds.
    """
    # Sobel x: smooth vertically [1,2,1], diff horizontally [-1,0,1] (/8)
    sm_v = _shift(img, -1, 0) + 2.0 * img + _shift(img, 1, 0)
    ix = (_shift(sm_v, 0, -1) - _shift(sm_v, 0, 1)) * (1.0 / 8.0)
    sm_h = _shift(img, 0, -1) + 2.0 * img + _shift(img, 0, 1)
    iy = (_shift(sm_h, -1, 0) - _shift(sm_h, 1, 0)) * (1.0 / 8.0)
    ixx = _box3(ix * ix)
    iyy = _box3(iy * iy)
    ixy = _box3(ix * iy)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression as 8 shifted maxima."""
    m = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, _shift(score, dy, dx))
    return jnp.where(score >= m, score, -jnp.inf)


def _subpixel_offsets(score: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel quadratic-fit offsets (dx, dy) from a score map."""
    sl = jnp.roll(score, 1, axis=1)
    sr = jnp.roll(score, -1, axis=1)
    st = jnp.roll(score, 1, axis=0)
    sb = jnp.roll(score, -1, axis=0)
    denx = sl - 2.0 * score + sr
    deny = st - 2.0 * score + sb
    dx = jnp.where(jnp.abs(denx) > 1e-12, 0.5 * (sl - sr) / denx, 0.0)
    dy = jnp.where(jnp.abs(deny) > 1e-12, 0.5 * (st - sb) / deny, 0.0)
    return jnp.clip(dx, -0.5, 0.5), jnp.clip(dy, -0.5, 0.5)


def _grid_topk(
    score: jnp.ndarray, cfg: DetectionConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cell top-k then global top-k. Returns (flat_idx [N], score [N])."""
    H, W = score.shape
    cs = cfg.cell_size
    gh, gw = H // cs, W // cs
    # crop to a multiple of cell size, reshape into cells
    s = score[: gh * cs, : gw * cs]
    cells = s.reshape(gh, cs, gw, cs).transpose(0, 2, 1, 3).reshape(gh * gw, cs * cs)
    kc = min(cfg.per_cell, cs * cs)
    cell_scores, cell_idx = jax.lax.top_k(cells, kc)  # [ncells, kc]
    # convert intra-cell index back to flat image index
    ci = jnp.arange(gh * gw)
    cy, cx = ci // gw, ci % gw
    iy = cell_idx // cs + (cy * cs)[:, None]
    ix = cell_idx % cs + (cx * cs)[:, None]
    flat = (iy * W + ix).reshape(-1)
    scores = cell_scores.reshape(-1)
    n = min(cfg.max_keypoints, flat.shape[0])
    top_scores, top_i = jax.lax.top_k(scores, n)
    return flat[top_i], top_scores


@functools.partial(jax.jit, static_argnums=(1,))
def detect_keypoints(image: jnp.ndarray, cfg: DetectionConfig = DetectionConfig()):
    """Detect up to cfg.max_keypoints corners in [H,W] image (float, [0,1]).

    Returns dict with fixed shapes:
      xy      [N,2] subpixel positions (x, y) at full resolution
      score   [N]
      octave  [N] int32
      size    [N] keypoint diameter in px (octave-scaled, drives the
              reprojection whitening 8/size like the reference)
      mask    [N] bool validity
    """
    N = cfg.max_keypoints
    dtype = image.dtype
    per_oct = []
    img = image
    for o in range(max(cfg.octaves, 1)):
        resp = harris_response(img, cfg.harris_k)
        # normalise response scale so thresholds are image-independent
        resp = resp / (jnp.std(resp) + 1e-12)
        nms = _nms3(resp)
        dx, dy = _subpixel_offsets(resp)
        flat_idx, scores = _grid_topk(nms, cfg)
        H, W = img.shape
        ys = (flat_idx // W).astype(dtype)
        xs = (flat_idx % W).astype(dtype)
        xs = xs + dx.reshape(-1)[flat_idx]
        ys = ys + dy.reshape(-1)[flat_idx]
        scale = 2.0**o
        xy = jnp.stack([xs, ys], axis=-1) * scale
        valid = (
            (scores > cfg.absolute_threshold)
            & (xs > cfg.border) & (xs < W - cfg.border)
            & (ys > cfg.border) & (ys < H - cfg.border)
        )
        per_oct.append(
            (
                xy,
                jnp.where(valid, scores, -jnp.inf),
                jnp.full(xy.shape[:1], o, jnp.int32),
                jnp.full(xy.shape[:1], 9.0 * scale, dtype),
            )
        )
        if o + 1 < cfg.octaves:
            Hc, Wc = (H // 2) * 2, (W // 2) * 2
            img = img[:Hc, :Wc].reshape(Hc // 2, 2, Wc // 2, 2).mean(axis=(1, 3))

    xy = jnp.concatenate([p[0] for p in per_oct])
    score = jnp.concatenate([p[1] for p in per_oct])
    octv = jnp.concatenate([p[2] for p in per_oct])
    size = jnp.concatenate([p[3] for p in per_oct])

    top_scores, ti = jax.lax.top_k(score, N)
    out = {
        "xy": xy[ti],
        "score": top_scores,
        "octave": octv[ti],
        "size": size[ti],
        "mask": jnp.isfinite(top_scores) & (top_scores > cfg.absolute_threshold),
    }
    return out
