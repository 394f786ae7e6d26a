"""CNN keypoint suppression: sky/person landmarks carry ~zero weight.

Reference: on every keyframe the reference segments each image with
fast-scnn in background threads (Frontend.cpp:902-941), classifies
keypoints (okvis_cv/src/Frame.cpp:46-147) and scales the information of
landmarks observed on sky (class 10) or person (class 11) pixels by
1e-4 (Frontend.cpp:969-1011). Here segmentation + per-keypoint
classification run as ONE jitted dispatch per camera, keyframes only,
and suppression is a per-landmark information scale consumed by every
problem packer (LandmarkRecord.info_scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.models.fast_scnn import (
    PERSON_CLASS,
    SKY_CLASS,
    classify_keypoints,
    load_params,
    segment_image,
)


@jax.jit
def _classify_frame(params, img: jnp.ndarray, xy: jnp.ndarray):
    seg = segment_image(params, img)
    return classify_keypoints(seg, xy)


class CnnSuppressor:
    """Keyframe-time landmark suppression from fast-scnn segmentation."""

    def __init__(self, params_or_path):
        if isinstance(params_or_path, str):
            self.params = load_params(params_or_path)
        else:
            self.params = params_or_path
        self.num_suppressed = 0

    def suppress(self, estimator, frames, sid: int, images) -> int:
        """Classify this keyframe's keypoints and set info_scale = 1e-4
        on landmarks observed at sky/person keypoints. Returns the
        number of landmarks suppressed at this keyframe."""
        classes = []
        for ci, img in enumerate(images):
            cls = _classify_frame(
                self.params, jnp.asarray(img),
                jnp.asarray(frames[ci]["xy"]),
            )
            classes.append(cls)
        classes = [np.asarray(c) for c in classes]  # keyframe-only fetch
        n = 0
        for (lid, ci, kp) in estimator.obs_of_state(sid):
            lm = estimator.landmarks.get(lid)
            if lm is None:
                continue
            c = int(classes[ci][kp])
            if (c == SKY_CLASS or c == PERSON_CLASS) \
                    and lm.info_scale > 1e-4:
                estimator.set_info_scale(lid, 1e-4)
                n += 1
        self.num_suppressed += n
        return n
