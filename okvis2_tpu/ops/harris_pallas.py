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

HALO = 3  # sobel(1) + box(1) + nms(1)


def _band_kernel(img_hbm, out_ref, scratch, sem, *, th: int, k: float):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    H = img_hbm.shape[0]

    # clamped halo start: duplicate edge rows at the image boundary by
    # shifting the window inward (the detector ignores a 16px border)
    start = i * th - HALO
    start = jnp.clip(start, 0, H - (th + 2 * HALO))
    off = i * th - start  # where the band's first row sits in scratch

    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(start, th + 2 * HALO), :], scratch, sem
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
    del off

    @pl.when(i == n - 1)
    def _():
        out_ref[:] = nms[2 * HALO : 2 * HALO + th, :]

    @pl.when((i > 0) & (i < n - 1))
    def _():
        out_ref[:] = nms[HALO : HALO + th, :]

    @pl.when(i == 0)
    def _():
        out_ref[:] = nms[0:th, :]


@functools.partial(jax.jit, static_argnames=("k", "band"))
def harris_nms_pallas(img: jnp.ndarray, k: float = 0.04, band: int = 120):
    """[H,W] image -> NMS'd Harris response. W must be a multiple of 128
    and H a multiple of `band` (the wrapper pads)."""
    H, W = img.shape
    assert W % 128 == 0 and H % band == 0, (H, W, band)
    grid = H // band
    return pl.pallas_call(
        functools.partial(_band_kernel, th=band, k=k),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (band, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, W), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((band + 2 * HALO, W), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(img)
