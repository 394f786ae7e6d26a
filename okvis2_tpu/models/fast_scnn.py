"""Fast-SCNN semantic segmentation in Flax.

Covers the reference's LibTorch fast-scnn integration (okvis_cv
Network wrapper okvis_cv/include/okvis/internal/Network.hpp:50-60, used
by Frame::computeClassifications okvis_cv/src/Frame.cpp:46-147, exported
by cnn/demo.py): 19-class cityscapes segmentation whose sky (10) and
person (11) classes suppress keypoints/landmarks
(Frontend.cpp:969-1011, information x 1e-4).

Architecture follows the public Fast-SCNN paper (Poudel et al., BMVC'19)
with the exact module structure of the PyTorch implementation the
reference's demo.py consumes (`get_fast_scnn('citys', pretrained=True)`):
learning-to-downsample -> global feature extractor (inverted residual
bottlenecks + pyramid pooling) -> feature fusion (depthwise + pointwise
branches) -> classifier. Submodules are NAMED to mirror that checkpoint
layout one-to-one, so `models/import_torch_fast_scnn.py` can convert a
cityscapes-pretrained state_dict into these params mechanically (this
environment has no network access to download the weights themselves;
the converter + architecture-parity test make the import path real).
Bilinear resizes use align_corners=True like the torch model.

Runs as one XLA program (bf16-friendly) instead of a LibTorch
subprocess; the reference resizes inputs to multiples of 64
(Frame.cpp:64-ish) and so do we. Weights load from an .npz checkpoint
(`load_params`); without a checkpoint the model runs with random
weights — useful only for benchmarking throughput, not for actual
suppression.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 19  # cityscapes
SKY_CLASS = 10
PERSON_CLASS = 11


def resize_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with torch align_corners=True semantics
    (x_in = x_out * (in-1)/(out-1)); jax.image.resize only implements
    half-pixel centres, which would break output parity with the
    reference's F.interpolate(..., align_corners=True) calls."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    scale_h = (H - 1) / (Ho - 1) if Ho > 1 else 0.0
    scale_w = (W - 1) / (Wo - 1) if Wo > 1 else 0.0
    yi = jnp.arange(Ho) * scale_h
    xi = jnp.arange(Wo) * scale_w
    y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, max(H - 2, 0))
    x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, max(W - 2, 0))
    wy = (yi - y0).astype(x.dtype)
    wx = (xi - x0).astype(x.dtype)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    # gather rows then columns (broadcast over leading batch dims)
    r0 = jnp.take(x, y0, axis=-3)
    r1 = jnp.take(x, y1, axis=-3)
    r = r0 + (r1 - r0) * wy[:, None, None]
    c0 = jnp.take(r, x0, axis=-2)
    c1 = jnp.take(r, x1, axis=-2)
    return c0 + (c1 - c0) * wx[:, None]


def _adaptive_avg_pool(x: jnp.ndarray, bins: int) -> jnp.ndarray:
    """torch adaptive_avg_pool2d for NHWC x (window edges
    floor(i*H/bins)..ceil((i+1)*H/bins)); bins is tiny and static, so
    the python loops unroll into a handful of static slices."""
    H, W = x.shape[-3], x.shape[-2]
    rows = []
    for i in range(bins):
        h0, h1 = (i * H) // bins, -((-(i + 1) * H) // bins)
        cols = []
        for j in range(bins):
            w0, w1 = (j * W) // bins, -((-(j + 1) * W) // bins)
            cols.append(x[..., h0:h1, w0:w1, :].mean(axis=(-3, -2)))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def _pad_of(kernel: Tuple[int, int]):
    """torch Conv2d padding=(k-1)//2 as explicit (low, high) pairs:
    flax 'SAME' puts stride-2 asymmetric padding on the RIGHT, torch
    pads symmetrically — the one-pixel shift would break checkpoint
    output parity."""
    return tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel)


class ConvBNReLU(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, (self.strides, self.strides),
                    padding=_pad_of(self.kernel), use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class DSConv(nn.Module):
    """Depthwise-separable conv (_DSConv: dw 3x3 + BN + relu, pw 1x1 +
    BN + relu)."""

    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(x.shape[-1], (3, 3), (self.strides, self.strides),
                    padding=_pad_of((3, 3)),
                    feature_group_count=x.shape[-1], use_bias=False,
                    name="dw")(x)
        x = nn.BatchNorm(use_running_average=not train, name="dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, name="pw_bn")(x)
        return nn.relu(x)


class Bottleneck(nn.Module):
    """Inverted residual bottleneck (LinearBottleneck: expand 1x1,
    depthwise 3x3, linear project 1x1; shortcut when shape-preserving)."""

    features: int
    expansion: int = 6
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        h = ConvBNReLU(inp * self.expansion, (1, 1), name="expand")(x, train)
        h = nn.Conv(inp * self.expansion, (3, 3),
                    (self.strides, self.strides), padding=_pad_of((3, 3)),
                    feature_group_count=inp * self.expansion,
                    use_bias=False, name="dw")(h)
        h = nn.BatchNorm(use_running_average=not train, name="dw_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    name="project")(h)
        h = nn.BatchNorm(use_running_average=not train, name="project_bn")(h)
        if self.strides == 1 and inp == self.features:
            h = h + x
        return h


class PyramidPooling(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W, C = x.shape[-3:]
        outs = [x]
        for k, bins in enumerate((1, 2, 3, 6)):
            p = _adaptive_avg_pool(x, bins)
            p = ConvBNReLU(C // 4, (1, 1), name=f"conv{k + 1}")(p, train)
            p = resize_align_corners(p, (H, W))
            outs.append(p)
        x = jnp.concatenate(outs, axis=-1)
        return ConvBNReLU(self.features, (1, 1), name="out")(x, train)


class FastSCNN(nn.Module):
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [H, W, 3] or [B, H, W, 3], H/W multiples of 64
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        # learning to downsample (1/8)
        d = ConvBNReLU(32, strides=2, name="ltd_conv")(x, train)
        d = DSConv(48, strides=2, name="ltd_dsconv1")(d, train)
        d = DSConv(64, strides=2, name="ltd_dsconv2")(d, train)
        # global feature extractor (1/32)
        g = d
        for i, (s, f) in enumerate(((2, 64), (1, 64), (1, 64))):
            g = Bottleneck(f, strides=s, name=f"gfe_bottleneck1_{i}")(g, train)
        for i, (s, f) in enumerate(((2, 96), (1, 96), (1, 96))):
            g = Bottleneck(f, strides=s, name=f"gfe_bottleneck2_{i}")(g, train)
        for i, f in enumerate((128, 128, 128)):
            g = Bottleneck(f, name=f"gfe_bottleneck3_{i}")(g, train)
        g = PyramidPooling(128, name="gfe_ppm")(g, train)
        # feature fusion (FeatureFusionModule: upsampled low-res branch
        # through depthwise 3x3 + pointwise 1x1, high-res through 1x1)
        g_up = resize_align_corners(g, (d.shape[-3], d.shape[-2]))
        g_up = nn.Conv(128, (3, 3), padding=_pad_of((3, 3)),
                       feature_group_count=128,
                       use_bias=False, name="ffm_dw")(g_up)
        g_up = nn.BatchNorm(use_running_average=not train,
                            name="ffm_dw_bn")(g_up)
        g_up = nn.relu(g_up)
        g_up = nn.Conv(128, (1, 1), name="ffm_conv_lower")(g_up)
        g_up = nn.BatchNorm(use_running_average=not train,
                            name="ffm_bn_lower")(g_up)
        d_p = nn.Conv(128, (1, 1), name="ffm_conv_higher")(d)
        d_p = nn.BatchNorm(use_running_average=not train,
                           name="ffm_bn_higher")(d_p)
        f = nn.relu(g_up + d_p)
        # classifier
        f = DSConv(128, name="cls_dsconv1")(f, train)
        f = DSConv(128, name="cls_dsconv2")(f, train)
        logits = nn.Conv(self.num_classes, (1, 1), name="cls_conv")(f)
        logits = resize_align_corners(logits, (x.shape[-3], x.shape[-2]))
        if squeeze:
            logits = logits[0]
        return logits


def _pad_to_64(img: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape[:2]
    Hp = ((H + 63) // 64) * 64
    Wp = ((W + 63) // 64) * 64
    return jnp.pad(img, ((0, Hp - H), (0, Wp - W), (0, 0)))


def segment_image(params, img: jnp.ndarray) -> jnp.ndarray:
    """[H,W] gray or [H,W,3] image -> per-pixel class ids [H,W]."""
    if img.ndim == 2:
        img = jnp.stack([img] * 3, axis=-1)
    H, W = img.shape[:2]
    x = _pad_to_64(img)
    model = FastSCNN()
    logits = model.apply(params, x)
    return jnp.argmax(logits, axis=-1)[:H, :W]


def init_params(key=None, height: int = 192, width: int = 320):
    model = FastSCNN()
    if key is None:
        key = jax.random.PRNGKey(0)
    x = jnp.zeros((height, width, 3))
    return model.init(key, x)


def load_params(path: str):
    """Load a flattened .npz checkpoint produced by `save_params`."""
    import flax

    data = np.load(path, allow_pickle=False)
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return flax.traverse_util.unflatten_dict(flat)


def save_params(path: str, params):
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    np.savez_compressed(
        path, **{"/".join(map(str, k)): np.asarray(v) for k, v in flat.items()}
    )


def classify_keypoints(seg: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Per-keypoint class from a segmentation map (Frame::
    computeClassifications role). xy [N,2] -> class ids [N]."""
    x = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, seg.shape[1] - 1)
    y = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, seg.shape[0] - 1)
    return seg[y, x]


def suppression_weights(classes: jnp.ndarray) -> jnp.ndarray:
    """Observation information scale per keypoint: sky/person -> 1e-4
    (Frontend.cpp:986-1011)."""
    suppressed = (classes == SKY_CLASS) | (classes == PERSON_CLASS)
    return jnp.where(suppressed, 1e-2, 1.0)  # sqrt of 1e-4 information
