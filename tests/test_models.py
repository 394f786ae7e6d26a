"""fast-scnn model tests (shape/jit/suppression logic)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_fast_scnn_shapes_and_segmentation():
    from okvis2_tpu.models.fast_scnn import (
        NUM_CLASSES,
        init_params,
        segment_image,
    )

    params = init_params(height=64, width=128)
    img = jnp.asarray(np.random.default_rng(0).random((50, 100)), jnp.float32)
    seg = segment_image(params, img)
    assert seg.shape == (50, 100)
    assert int(seg.min()) >= 0 and int(seg.max()) < NUM_CLASSES


def test_keypoint_classification_and_suppression():
    from okvis2_tpu.models.fast_scnn import (
        PERSON_CLASS,
        SKY_CLASS,
        classify_keypoints,
        suppression_weights,
    )

    seg = jnp.zeros((40, 60), jnp.int32)
    seg = seg.at[:10, :].set(SKY_CLASS)
    seg = seg.at[30:, :].set(PERSON_CLASS)
    xy = jnp.asarray([[5.0, 5.0], [30.0, 20.0], [10.0, 35.0]])
    cls = classify_keypoints(seg, xy)
    np.testing.assert_array_equal(np.asarray(cls), [SKY_CLASS, 0, PERSON_CLASS])
    w = suppression_weights(cls)
    np.testing.assert_allclose(np.asarray(w), [1e-2, 1.0, 1e-2])
