"""Camera model tests: project/bearing roundtrips for all 10 types.

Mirrors the coverage of the reference's geometry/test/camera_test.cc and
camera_functions_test.cc (projection/distortion inverses), plus the
normalized-coordinate conventions of camera.h:89-112.
"""

import numpy as np
import pytest

from opensfm_tpu.geometry import cameras
from opensfm_tpu.geometry.cameras import Camera


def make_all_cameras():
    return {
        "perspective": Camera.create_perspective(0.7, -0.1, 0.01),
        "brown": Camera.create_brown(
            0.8, 0.95, [0.01, -0.005], [-0.1, 0.02, 0.001, 0.001, -0.002]
        ),
        "fisheye": Camera.create_fisheye(0.6, -0.02, 0.003),
        "fisheye_opencv": Camera.create_fisheye_opencv(
            0.7, 0.95, [0.005, -0.01], [-0.02, 0.005, 0.001, -0.0005]
        ),
        "fisheye62": Camera.create_fisheye62(
            0.75, 1.02, [0.0, 0.0],
            [-0.02, 0.005, 0.001, -0.0005, 0.0002, -0.0001, 0.001, -0.001],
        ),
        "fisheye624": Camera.create_fisheye624(
            0.75, 1.0, [0.0, 0.0],
            [-0.02, 0.005, 0.001, -0.0005, 0.0002, -0.0001, 0.001, -0.001,
             0.0005, -0.0005, 0.0002, -0.0002],
        ),
        "spherical": Camera.create_spherical(),
        "dual": Camera.create_dual(0.5, 0.7, -0.05, 0.005),
        "radial": Camera.create_radial(0.8, 0.95, [0.01, -0.01], [-0.1, 0.02]),
        "simple_radial": Camera.create_simple_radial(0.8, 0.95, [0.01, -0.01], -0.1),
    }


@pytest.mark.parametrize("name", list(cameras.PARAMS.keys()))
def test_project_bearing_roundtrip(name):
    cam = make_all_cameras()[name]
    rng = np.random.default_rng(7)
    # Random bearings in a generous frustum in front of the camera.
    if name in ("spherical", "dual", "fisheye", "fisheye_opencv", "fisheye62",
                "fisheye624"):
        # Wide-angle models: allow wide bearings.
        dirs = rng.normal(0, 1, (100, 3))
        dirs[:, 2] = np.abs(dirs[:, 2]) + 0.5
    else:
        dirs = rng.normal(0, 0.25, (100, 3))
        dirs[:, 2] = 1.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    uv = cam.project_many(dirs)
    back = cam.bearings_many(uv)
    assert np.allclose(back, dirs, atol=1e-6), np.abs(back - dirs).max()


def test_spherical_project_bearing_full_sphere():
    cam = Camera.create_spherical()
    rng = np.random.default_rng(8)
    dirs = rng.normal(0, 1, (200, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    uv = cam.project_many(dirs)
    assert np.all(np.abs(uv[:, 0]) <= 0.5 + 1e-9)
    back = cam.bearings_many(uv)
    assert np.allclose(back, dirs, atol=1e-9)


def test_perspective_projection_formula():
    cam = Camera.create_perspective(0.7, 0.0, 0.0)
    p = cam.project([1.0, 2.0, 4.0])
    assert np.allclose(p, [0.7 * 0.25, 0.7 * 0.5])


def test_perspective_distortion_applied():
    cam = Camera.create_perspective(1.0, -0.1, 0.02)
    x, y, z = 0.4, -0.3, 1.0
    r2 = (x / z) ** 2 + (y / z) ** 2
    d = 1.0 - 0.1 * r2 + 0.02 * r2 * r2
    assert np.allclose(cam.project([x, y, z]), [x * d, y * d])


def test_brown_affine_and_tangential():
    k1, k2, k3, p1, p2 = -0.1, 0.02, 0.001, 0.001, -0.002
    cam = Camera.create_brown(0.8, 0.95, [0.01, -0.005], [k1, k2, k3, p1, p2])
    x, y = 0.2, -0.1
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    dx = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    dy = y * radial + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
    expected = [0.8 * dx + 0.01, 0.8 * 0.95 * dy - 0.005]
    assert np.allclose(cam.project([x, y, 1.0]), expected)


def test_fisheye_equidistant():
    cam = Camera.create_fisheye(1.0, 0.0, 0.0)
    # 45 degrees off-axis in x: r = theta.
    theta = np.pi / 4
    p = cam.project([np.sin(theta), 0.0, np.cos(theta)])
    assert np.allclose(p, [theta, 0.0], atol=1e-12)


def test_named_parameter_access():
    cam = Camera.create_perspective(0.7, -0.1, 0.01)
    assert cam.focal == 0.7
    assert cam.k1 == -0.1
    cam.focal = 0.75
    assert cam.focal == 0.75
    assert cam.get_parameters_map()["focal"] == 0.75
    with pytest.raises(AttributeError):
        _ = cam.cx  # perspective has no principal point parameter


def test_pixel_normalized_roundtrip():
    cam = Camera.create_perspective(0.7, 0.0, 0.0)
    cam.width, cam.height = 640, 480
    px = np.array([[0.0, 0.0], [639.0, 479.0], [319.5, 239.5], [100.0, 200.0]])
    norm = cam.pixel_to_normalized_coordinates_many(px)
    # Image center maps to (0, 0); scale is 1/max(w,h).
    assert np.allclose(norm[2], [0.0, 0.0])
    assert np.allclose(norm[0], [-319.5 / 640, -239.5 / 640])
    back = cam.normalized_to_pixel_coordinates_many(norm)
    assert np.allclose(back, px)


def test_K_matrices():
    cam = Camera.create_perspective(0.5, 0.0, 0.0)
    cam.width, cam.height = 800, 600
    K = cam.get_K()
    assert np.allclose(K, [[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1]])
    Kpx = cam.get_K_in_pixel_coordinates()
    assert np.allclose(Kpx[0, 0], 0.5 * 800)
    assert np.allclose(Kpx[0, 2], (800 - 1) / 2.0)


def test_jax_project_matches_numpy():
    import jax.numpy as jnp

    for name, cam in make_all_cameras().items():
        rng = np.random.default_rng(9)
        dirs = rng.normal(0, 0.2, (20, 3))
        dirs[:, 2] = 1.0
        np_uv = cameras.project(name, dirs, cam.parameters, xp=np)
        jax_uv = cameras.project(
            name, jnp.asarray(dirs), jnp.asarray(cam.parameters), xp=jnp
        )
        assert np.allclose(np_uv, np.asarray(jax_uv), atol=1e-10), name


def test_jax_project_differentiable():
    import jax
    import jax.numpy as jnp

    cam = Camera.create_brown(
        0.8, 0.95, [0.01, -0.005], [-0.1, 0.02, 0.001, 0.001, -0.002]
    )

    def f(point, params):
        return cameras.project("brown", point, params, xp=jnp)

    J_point = jax.jacfwd(f, argnums=0)(jnp.array([0.1, 0.2, 1.0]), jnp.asarray(cam.parameters))
    J_params = jax.jacfwd(f, argnums=1)(jnp.array([0.1, 0.2, 1.0]), jnp.asarray(cam.parameters))
    assert J_point.shape == (2, 3)
    assert J_params.shape == (2, len(cam.parameters))
    assert np.all(np.isfinite(np.asarray(J_point)))
    assert np.all(np.isfinite(np.asarray(J_params)))


def test_camera_copy_and_eq():
    cam = Camera.create_perspective(0.7, -0.1, 0.01)
    cam.id = "cam1"
    cam.width, cam.height = 640, 480
    cam2 = cam.copy()
    assert cam == cam2
    cam2.focal = 0.9
    assert cam != cam2


def test_pad_params():
    cam = Camera.create_perspective(0.7, -0.1, 0.01)
    padded = cameras.pad_params("perspective", cam.parameters)
    assert padded.shape == (cameras.MAX_PARAMS,)
    assert np.allclose(padded[:3], cam.parameters)
    assert np.allclose(padded[3:], 0.0)
