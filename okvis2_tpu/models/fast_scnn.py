"""Fast-SCNN semantic segmentation in Flax.

Covers the reference's LibTorch fast-scnn integration (okvis_cv
Network wrapper okvis_cv/include/okvis/internal/Network.hpp:50-60, used
by Frame::computeClassifications okvis_cv/src/Frame.cpp:46-147, exported
by cnn/demo.py): 19-class cityscapes segmentation whose sky (10) and
person (11) classes suppress keypoints/landmarks
(Frontend.cpp:969-1011, information x 1e-4).

Architecture follows the public Fast-SCNN paper (Poudel et al., BMVC'19):
learning-to-downsample -> global feature extractor (inverted residual
bottlenecks + pyramid pooling) -> feature fusion -> classifier. Runs as
one XLA program (bf16-friendly) instead of a LibTorch subprocess; the
reference resizes inputs to multiples of 64 (Frame.cpp:64-ish) and so do
we. Weights load from an .npz checkpoint (`load_params`); without a
checkpoint the model runs with random weights — useful only for
benchmarking throughput, not for actual suppression.
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


class ConvBNReLU(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, (self.strides, self.strides),
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class DSConv(nn.Module):
    """Depthwise-separable conv."""

    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(x.shape[-1], (3, 3), (self.strides, self.strides),
                    feature_group_count=x.shape[-1], use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class Bottleneck(nn.Module):
    """Inverted residual bottleneck (MobileNetV2-style)."""

    features: int
    expansion: int = 6
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        h = ConvBNReLU(inp * self.expansion, (1, 1))(x, train)
        h = nn.Conv(inp * self.expansion, (3, 3),
                    (self.strides, self.strides),
                    feature_group_count=inp * self.expansion,
                    use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.strides == 1 and inp == self.features:
            h = h + x
        return h


class PyramidPooling(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W, C = x.shape[-3:]
        outs = [x]
        for bins in (1, 2, 3, 6):
            ph = max(H // bins, 1)
            pw = max(W // bins, 1)
            p = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            p = ConvBNReLU(C // 4, (1, 1))(p, train)
            p = jax.image.resize(p, x.shape[:-1] + (C // 4,), "bilinear")
            outs.append(p)
        x = jnp.concatenate(outs, axis=-1)
        return ConvBNReLU(self.features, (1, 1))(x, train)


class FastSCNN(nn.Module):
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [H, W, 3] or [B, H, W, 3], H/W multiples of 64
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        # learning to downsample (1/8)
        d = ConvBNReLU(32, strides=2)(x, train)
        d = DSConv(48, strides=2)(d, train)
        d = DSConv(64, strides=2)(d, train)
        # global feature extractor (1/32)
        g = d
        for s, f in ((2, 64), (1, 64), (1, 64)):
            g = Bottleneck(f, strides=s)(g, train)
        for s, f in ((2, 96), (1, 96), (1, 96)):
            g = Bottleneck(f, strides=s)(g, train)
        for f in (128, 128, 128):
            g = Bottleneck(f)(g, train)
        g = PyramidPooling(128)(g, train)
        # feature fusion
        g_up = jax.image.resize(g, d.shape[:-1] + (128,), "bilinear")
        g_up = nn.Conv(128, (3, 3), use_bias=False,
                       kernel_dilation=(4, 4))(g_up)
        g_up = nn.BatchNorm(use_running_average=not train)(g_up)
        d_p = nn.Conv(128, (1, 1), use_bias=False)(d)
        d_p = nn.BatchNorm(use_running_average=not train)(d_p)
        f = nn.relu(g_up + d_p)
        # classifier
        f = DSConv(128)(f, train)
        f = DSConv(128)(f, train)
        logits = nn.Conv(self.num_classes, (1, 1))(f)
        logits = jax.image.resize(
            logits, x.shape[:-1] + (self.num_classes,), "bilinear"
        )
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
