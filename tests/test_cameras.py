"""Camera model tests.

Mirrors okvis_cv/test/TestPinholeCamera.cpp: project/backProject round
trips and Jacobians vs numeric differentiation, for every distortion
model, on randomly sampled image points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2_tpu.cameras import (
    EquidistantDistortion,
    NoDistortion,
    PinholeCamera,
    RadialTangentialDistortion,
    RadialTangentialDistortion8,
)

ALL_DISTORTIONS = [
    NoDistortion,
    RadialTangentialDistortion,
    RadialTangentialDistortion8,
    EquidistantDistortion,
]


@pytest.fixture(params=ALL_DISTORTIONS, ids=lambda c: c.__name__)
def camera(request):
    return PinholeCamera.create_test_object(request.param)


def random_image_points(camera, n=200, margin=20.0, seed=0):
    key = jax.random.PRNGKey(seed)
    ku, kv = jax.random.split(key)
    u = jax.random.uniform(ku, (n,), minval=margin, maxval=camera.width - margin)
    v = jax.random.uniform(kv, (n,), minval=margin, maxval=camera.height - margin)
    return jnp.stack([u, v], axis=-1)


def test_project_backproject_roundtrip(camera):
    uv = random_image_points(camera)
    rays = camera.back_project(uv)
    np.testing.assert_allclose(
        jnp.linalg.norm(rays, axis=-1), np.ones(len(uv)), atol=1e-10
    )
    # scale to random depths and project back
    depths = jax.random.uniform(jax.random.PRNGKey(1), (len(uv), 1), minval=0.3, maxval=30.0)
    pts = rays * depths
    uv2, valid = camera.project(pts)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(uv2, uv, atol=1e-6)


def test_project_behind_camera_invalid(camera):
    pts = jnp.array([[0.1, 0.2, -1.0], [0.0, 0.0, 0.0]])
    _, valid = camera.project(pts)
    assert not bool(valid[0])
    assert not bool(valid[1])


def test_project_outside_image_invalid(camera):
    # a point projecting far outside the image
    pts = jnp.array([[50.0, 0.0, 1.0]])
    _, valid = camera.project(pts)
    assert not bool(valid[0])


def test_project_homogeneous_sign_flip(camera):
    uv = random_image_points(camera, n=10)
    rays = camera.back_project(uv) * 5.0
    hp = jnp.concatenate([rays, jnp.ones((10, 1))], axis=-1)
    uv_pos, valid_pos = camera.project_homogeneous(hp)
    uv_neg, valid_neg = camera.project_homogeneous(-hp)
    np.testing.assert_allclose(uv_pos, uv_neg, atol=1e-9)
    assert bool(jnp.all(valid_pos)) and bool(jnp.all(valid_neg))


def test_projection_jacobian_vs_numeric(camera):
    uv = random_image_points(camera, n=20)
    pts = camera.back_project(uv) * 3.0

    def proj(p):
        return camera.project(p)[0]

    J = jax.vmap(jax.jacfwd(proj))(pts)  # [N, 2, 3]
    eps = 1e-7
    for axis in range(3):
        d = jnp.zeros(3).at[axis].set(eps)
        num = (jax.vmap(proj)(pts + d) - jax.vmap(proj)(pts - d)) / (2 * eps)
        # central differencing at eps=1e-7 leaves ~1e-6 relative roundoff
        np.testing.assert_allclose(J[:, :, axis], num, rtol=1e-5, atol=1e-4)


def test_distort_undistort_roundtrip(camera):
    uv = random_image_points(camera, n=100)
    xyd = (uv - camera.center) / camera.focal
    xy = camera.distortion.undistort(xyd)
    xyd2 = camera.distortion.distort(xy)
    np.testing.assert_allclose(xyd2, xyd, atol=1e-10)


def test_intrinsics_roundtrip(camera):
    intr = camera.intrinsics()
    cam2 = PinholeCamera.from_intrinsics(
        intr, type(camera.distortion), camera.image_size
    )
    uv = random_image_points(camera, n=5)
    pts = camera.back_project(uv) * 2.0
    uv_a, _ = camera.project(pts)
    uv_b, _ = cam2.project(pts)
    np.testing.assert_allclose(uv_a, uv_b, atol=1e-12)


def test_vmap_and_jit_compatible(camera):
    uv = random_image_points(camera, n=64)
    pts = camera.back_project(uv) * 2.0

    @jax.jit
    def f(c, p):
        return c.project(p)[0]

    np.testing.assert_allclose(f(camera, pts), camera.project(pts)[0], atol=1e-12)


def test_ncamera_overlaps_stereo():
    from okvis2_tpu.cameras import NCameraSystem
    from okvis2_tpu.core.se3 import Transformation
    from okvis2_tpu.core import so3

    cam = PinholeCamera.create_test_object(RadialTangentialDistortion)
    # stereo rig: 11 cm baseline along x, same orientation
    T0 = Transformation.identity()
    T1 = Transformation(r=jnp.array([0.11, 0.0, 0.0]), q=so3.identity_quat())
    rig = NCameraSystem([cam, cam], [T0, T1])
    assert rig.has_overlap(0, 1) and rig.has_overlap(1, 0)
    # opposite-facing cameras: no overlap
    q_back = so3.delta_q(jnp.array([0.0, np.pi, 0.0]))
    T2 = Transformation(r=jnp.array([0.0, 0.0, 0.0]), q=q_back)
    rig2 = NCameraSystem([cam, cam], [T0, T2])
    assert not rig2.has_overlap(0, 1)
