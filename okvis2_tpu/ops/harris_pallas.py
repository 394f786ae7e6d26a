"""Fused Harris + NMS Pallas kernel.

The XLA shift-add formulation of Harris scoring (frontend/detection.py)
makes ~26 elementwise passes over the image — each reading/writing HBM.
This kernel processes the image in row-band tiles: one DMA brings a band
(+3-row halo) into VMEM, the whole chain (Sobel -> structure tensor ->
box filter -> response -> 3x3 NMS) runs on the VPU from VMEM, and one
store writes the band's suppressed response. HBM traffic drops from ~26x
to ~2x the image size.

Requires the image width padded to a multiple of 128 lanes (the detection
wrapper pads/crops); row bands are 8-sublane aligned. Falls back to the
XLA path automatically if the kernel can't be used (see
detection.harris_nms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8  # compute needs 3 (sobel+box+nms); 8 keeps DMA slices
# 8-sublane aligned as Mosaic requires


def _band_kernel(img_hbm, resp_ref, nms_ref, scratch, sem, *, th: int, k: float):
    c = pl.program_id(0)  # camera / batch index
    i = pl.program_id(1)  # row band index
    n = pl.num_programs(1)
    H = img_hbm.shape[1]

    # clamped halo start: duplicate edge rows at the image boundary by
    # shifting the window inward (the detector ignores a 16px border)
    start = i * th - HALO
    start = jnp.clip(start, 0, H - (th + 2 * HALO))
    # all clamp outcomes are multiples of 8 (th, H, HALO are); Mosaic
    # needs the proof hint for the dynamic DMA offset
    start = pl.multiple_of(start, 8)

    copy = pltpu.make_async_copy(
        img_hbm.at[c, pl.ds(start, th + 2 * HALO), :], scratch, sem
    )
    copy.start()
    copy.wait()

    img = scratch[:]  # [th+2H, W]

    def sh(a, dy, dx):
        # pltpu.roll needs non-negative shifts; rolls are cyclic so use
        # the modular equivalent
        out = a
        r0 = (-dy) % a.shape[0]
        if r0:
            out = pltpu.roll(out, r0, 0)
        r1 = (-dx) % a.shape[1]
        if r1:
            out = pltpu.roll(out, r1, 1)
        return out

    # Sobel gradients (shift-adds on the VPU)
    sm_v = sh(img, -1, 0) + 2.0 * img + sh(img, 1, 0)
    ix = (sh(sm_v, 0, 1) - sh(sm_v, 0, -1)) * (1.0 / 8.0)
    sm_h = sh(img, 0, -1) + 2.0 * img + sh(img, 0, 1)
    iy = (sh(sm_h, 1, 0) - sh(sm_h, -1, 0)) * (1.0 / 8.0)

    def box3(a):
        row = sh(a, 0, -1) + a + sh(a, 0, 1)
        return (sh(row, -1, 0) + row + sh(row, 1, 0)) * (1.0 / 9.0)

    ixx = box3(ix * ix)
    iyy = box3(iy * iy)
    ixy = box3(ix * iy)
    resp = (ixx * iyy - ixy * ixy) - k * (ixx + iyy) * (ixx + iyy)

    # 3x3 NMS
    m = resp
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, sh(resp, dy, dx))
    nms = jnp.where(resp >= m, resp, -jnp.inf)

    # the in-scratch offset of the band is static per case: 0 for the
    # first band, HALO for interior bands, 2*HALO for the last (clamped)
    # band — write with static slices under predicates (dynamic_slice is
    # not lowerable in Pallas TPU)

    @pl.when(i == n - 1)
    def _():
        resp_ref[0] = resp[2 * HALO : 2 * HALO + th, :]
        nms_ref[0] = nms[2 * HALO : 2 * HALO + th, :]

    @pl.when((i > 0) & (i < n - 1))
    def _():
        resp_ref[0] = resp[HALO : HALO + th, :]
        nms_ref[0] = nms[HALO : HALO + th, :]

    @pl.when(i == 0)
    def _():
        resp_ref[0] = resp[0:th, :]
        nms_ref[0] = nms[0:th, :]


@functools.partial(jax.jit, static_argnames=("k", "band"))
def harris_nms_pallas(img: jnp.ndarray, k: float = 0.04, band: int = 120):
    """[C,H,W] image stack -> (response, NMS'd response), both [C,H,W].
    W must be a multiple of 128 and H a multiple of `band` (the wrapper
    pads). The batch (camera) dimension is part of the kernel grid — no
    vmap needed (Pallas ANY-space operands don't support vmap batching)."""
    C, H, W = img.shape
    assert W % 128 == 0 and H % band == 0, (H, W, band)
    spec = pl.BlockSpec(
        (1, band, W), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_band_kernel, th=band, k=k),
        grid=(C, H // band),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((C, H, W), img.dtype),
            jax.ShapeDtypeStruct((C, H, W), img.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((band + 2 * HALO, W), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(img)
