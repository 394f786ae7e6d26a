"""Pallas kernel tests (TPU only — skipped on the CPU test mesh).

Run on real hardware with:
    OKVIS2_USE_PALLAS_HARRIS=1 python -m pytest tests/test_pallas_kernels.py
(keeping the axon env so jax sees the TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas TPU kernel needs a TPU"
)


@requires_tpu
def test_harris_pallas_matches_xla():
    from okvis2_tpu.frontend.detection import harris_response, _nms3
    from okvis2_tpu.ops.harris_pallas import harris_nms_pallas

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 480, 768)), jnp.float32)
    resp_p, nms_p = harris_nms_pallas(img, band=120)
    resp_x = jax.vmap(harris_response)(img)
    nms_x = jax.vmap(_nms3)(resp_x)
    inner = np.s_[:, 16:-16, 16:-16]
    np.testing.assert_allclose(
        np.asarray(resp_p)[inner], np.asarray(resp_x)[inner],
        atol=1e-6, rtol=1e-4,
    )
    # suppression decisions agree
    agree = (
        np.isfinite(np.asarray(nms_p)[inner])
        == np.isfinite(np.asarray(nms_x)[inner])
    ).mean()
    assert agree > 0.9999
