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


def harris_nms(img: jnp.ndarray, k: float = 0.04):
    """Fused Harris response + 3x3 NMS, returning (response, nms).

    Accepts [H,W] or a camera stack [C,H,W]. On TPU with f32 input,
    dispatches to the Pallas band kernel (ops/harris_pallas.py: one HBM
    read per tile instead of ~26 elementwise passes; the camera dim is
    part of the kernel grid); otherwise the XLA shift-add path. Results
    are numerically identical (verified to 1e-9)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    C, H, W = img.shape
    # The Pallas kernel wins in isolation (~15%) but loses inside the
    # fused frontend program: pallas_call materialises resp/nms to HBM
    # and blocks XLA from fusing the Harris chain with selection
    # (measured: 314 fps XLA vs 203 fps Pallas for the full hot path).
    # Keep it opt-in for standalone use / future multi-kernel pipelines.
    import os

    use_pallas = (
        os.environ.get("OKVIS2_USE_PALLAS_HARRIS") == "1"
        and jax.default_backend() == "tpu"
        and img.dtype == jnp.float32
    )
    if use_pallas:
        from okvis2_tpu.ops.harris_pallas import harris_nms_pallas

        band = 8
        while H % (band * 2) == 0 and band < 128:
            band *= 2
        Wp = ((W + 127) // 128) * 128
        Hp = ((H + band - 1) // band) * band
        if Hp % band == 0 and Hp >= band + 16:
            if Wp != W or Hp != H:
                imgp = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W)))
            else:
                imgp = img
            resp, nms = harris_nms_pallas(imgp, k=k, band=band)
            resp, nms = resp[:, :H, :W], nms[:, :H, :W]
            return (resp[0], nms[0]) if squeeze else (resp, nms)
    resp = jax.vmap(lambda x: harris_response(x, k))(img)
    nms = jax.vmap(_nms3)(resp)
    return (resp[0], nms[0]) if squeeze else (resp, nms)


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


def _select_from_maps(resp, nms, octave: int, cfg: DetectionConfig):
    """Per-image keypoint selection from (response, nms) maps (vmappable)."""
    dtype = resp.dtype
    H, W = resp.shape
    scale_n = 1.0 / (jnp.std(resp) + 1e-12)
    resp = resp * scale_n
    nms = nms * scale_n
    dx, dy = _subpixel_offsets(resp)
    flat_idx, scores = _grid_topk(nms, cfg)
    ys = (flat_idx // W).astype(dtype)
    xs = (flat_idx % W).astype(dtype)
    xs = xs + dx.reshape(-1)[flat_idx]
    ys = ys + dy.reshape(-1)[flat_idx]
    scale = 2.0**octave
    xy = jnp.stack([xs, ys], axis=-1) * scale
    valid = (
        (scores > cfg.absolute_threshold)
        & (xs > cfg.border) & (xs < W - cfg.border)
        & (ys > cfg.border) & (ys < H - cfg.border)
    )
    return (
        xy,
        jnp.where(valid, scores, -jnp.inf),
        jnp.full(xy.shape[:1], octave, jnp.int32),
        jnp.full(xy.shape[:1], 9.0 * scale, dtype),
    )


@functools.partial(jax.jit, static_argnums=(1,))
def detect_keypoints_batch(
    images: jnp.ndarray, cfg: DetectionConfig = DetectionConfig()
):
    """Detect up to cfg.max_keypoints corners per image in a camera stack
    [C,H,W] (float, [0,1]). The response/NMS maps come from ONE batched
    (Pallas on TPU) call; selection is vmapped per camera. This is the
    whole-rig replacement for the reference's thread-per-camera detection
    (ThreadedSlam.cpp:360-384).

    Returns dict with fixed shapes, all leading dim C:
      xy [C,N,2], score [C,N], octave [C,N], size [C,N], mask [C,N]
    """
    N = cfg.max_keypoints
    per_oct = []
    img = images
    for o in range(max(cfg.octaves, 1)):
        resp, nms = harris_nms(img, cfg.harris_k)
        out_o = jax.vmap(
            lambda r, n: _select_from_maps(r, n, o, cfg)
        )(resp, nms)
        per_oct.append(out_o)
        if o + 1 < cfg.octaves:
            C, H, W = img.shape
            Hc, Wc = (H // 2) * 2, (W // 2) * 2
            img = img[:, :Hc, :Wc].reshape(
                C, Hc // 2, 2, Wc // 2, 2
            ).mean(axis=(2, 4))

    xy = jnp.concatenate([p[0] for p in per_oct], axis=1)
    score = jnp.concatenate([p[1] for p in per_oct], axis=1)
    octv = jnp.concatenate([p[2] for p in per_oct], axis=1)
    size = jnp.concatenate([p[3] for p in per_oct], axis=1)

    top_scores, ti = jax.lax.top_k(score, N)
    take = jax.vmap(lambda a, i: a[i])
    return {
        "xy": take(xy, ti),
        "score": top_scores,
        "octave": take(octv, ti),
        "size": take(size, ti),
        "mask": jnp.isfinite(top_scores) & (top_scores > cfg.absolute_threshold),
    }


@functools.partial(jax.jit, static_argnums=(1,))
def detect_keypoints(image: jnp.ndarray, cfg: DetectionConfig = DetectionConfig()):
    """Single-image variant of detect_keypoints_batch ([H,W] in).

    Returns dict with fixed shapes:
      xy [N,2], score [N], octave [N], size [N], mask [N]
    """
    out = detect_keypoints_batch(image[None], cfg)
    return {k: v[0] for k, v in out.items()}
