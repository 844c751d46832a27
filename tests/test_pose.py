"""Pose / Similarity / rotation math tests.

Covers the semantics of reference geometry/pose.h (compose/relative_to/
inverse/origin) and the JAX rotation kernels against the NumPy shells.
"""

import numpy as np
import pytest

from opensfm_tpu.geometry.pose import Pose, Similarity


def random_pose(rng):
    return Pose(rng.uniform(-1, 1, 3), rng.uniform(-5, 5, 3))


def test_rotation_matrix_roundtrip():
    rng = np.random.default_rng(42)
    for _ in range(20):
        r = rng.uniform(-np.pi, np.pi, 3) * rng.uniform(0, 1)
        p = Pose(r)
        R = p.get_rotation_matrix()
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R), 1.0)
        p2 = Pose()
        p2.set_rotation_matrix(R)
        assert np.allclose(p2.get_rotation_matrix(), R, atol=1e-12)


def test_rotation_near_pi():
    r = np.array([np.pi - 1e-7, 0.0, 0.0])
    p = Pose(r)
    p2 = Pose()
    p2.set_rotation_matrix(p.get_rotation_matrix())
    assert np.allclose(p2.get_rotation_matrix(), p.get_rotation_matrix(), atol=1e-9)


def test_identity_pose():
    p = Pose()
    assert np.allclose(p.get_rotation_matrix(), np.eye(3))
    assert np.allclose(p.get_origin(), 0.0)
    pt = np.array([1.0, 2.0, 3.0])
    assert np.allclose(p.transform(pt), pt)


def test_origin():
    rng = np.random.default_rng(0)
    p = random_pose(rng)
    o = p.get_origin()
    # The origin maps to the camera-frame zero.
    assert np.allclose(p.transform(o), 0.0, atol=1e-12)
    p.set_origin([1.0, 2.0, 3.0])
    assert np.allclose(p.get_origin(), [1.0, 2.0, 3.0], atol=1e-12)


def test_transform_roundtrip():
    rng = np.random.default_rng(1)
    p = random_pose(rng)
    pts = rng.uniform(-10, 10, (7, 3))
    assert np.allclose(p.transform_inverse(p.transform(pts)), pts, atol=1e-10)


def test_compose_and_relative_to():
    rng = np.random.default_rng(2)
    p1, p2 = random_pose(rng), random_pose(rng)
    # pose1.compose(pose2.inverse()) == pose1.relative_to(pose2)  (pose.h:139)
    a = p1.compose(p2.inverse())
    b = p1.relative_to(p2)
    assert np.allclose(a.rotation, b.rotation, atol=1e-10)
    assert np.allclose(a.translation, b.translation, atol=1e-10)
    # compose(identity) == self
    c = p1.compose(Pose())
    assert np.allclose(c.rotation, p1.rotation, atol=1e-12)
    # pose.compose(pose.inverse()) == identity
    ident = p1.compose(p1.inverse())
    assert np.allclose(ident.rotation, 0.0, atol=1e-10)
    assert np.allclose(ident.translation, 0.0, atol=1e-10)
    # Composition matches applying base first: (p1∘p2)(x) = p1(p2(x))
    x = rng.uniform(-1, 1, 3)
    assert np.allclose(p1.compose(p2).transform(x), p1.transform(p2.transform(x)))


def test_get_cam_to_world_inverse_of_world_to_cam():
    rng = np.random.default_rng(3)
    p = random_pose(rng)
    assert np.allclose(p.get_cam_to_world() @ p.get_world_to_cam(), np.eye(4), atol=1e-10)


def test_similarity_transform_and_inverse():
    rng = np.random.default_rng(4)
    s = Similarity(rng.uniform(-1, 1, 3), rng.uniform(-5, 5, 3), 2.5)
    pts = rng.uniform(-3, 3, (5, 3))
    t = s.transform(pts)
    back = s.inverse().transform(t)
    assert np.allclose(back, pts, atol=1e-10)
    # compose: (s1∘s2)(x) == s1(s2(x))
    s2 = Similarity(rng.uniform(-1, 1, 3), rng.uniform(-5, 5, 3), 0.7)
    x = rng.uniform(-1, 1, 3)
    assert np.allclose(s.compose(s2).transform(x), s.transform(s2.transform(x)), atol=1e-10)


def test_similarity_from_matrix_rotation():
    R = Pose(np.array([0.1, 0.2, 0.3])).get_rotation_matrix()
    s = Similarity(R, [1, 2, 3], 2.0)
    assert np.allclose(s.get_rotation_matrix(), R, atol=1e-12)


def test_jax_rotation_matches_numpy():
    import jax.numpy as jnp

    from opensfm_tpu.geometry import rotation

    rng = np.random.default_rng(5)
    rs = rng.uniform(-2, 2, (50, 3))
    rs[0] = 0.0  # identity
    rs[1] = [np.pi - 1e-8, 0, 0]  # near pi
    rs[2] = [1e-12, 0, 0]  # tiny
    R_jax = np.asarray(rotation.rotvec_to_matrix(jnp.asarray(rs)))
    for i, r in enumerate(rs):
        R_np = Pose(r).get_rotation_matrix()
        assert np.allclose(R_jax[i], R_np, atol=1e-10), i
    # Roundtrip through matrix_to_rotvec.
    back = np.asarray(rotation.matrix_to_rotvec(jnp.asarray(R_jax)))
    for i in range(len(rs)):
        # Compare rotation matrices (rotvec may differ by 2*pi wrapping).
        assert np.allclose(
            Pose(back[i]).get_rotation_matrix(), R_jax[i], atol=1e-8
        ), i


def test_jax_rotate_matches_matrix():
    import jax.numpy as jnp

    from opensfm_tpu.geometry import rotation

    rng = np.random.default_rng(6)
    r = jnp.asarray(rng.uniform(-2, 2, (10, 3)))
    x = jnp.asarray(rng.uniform(-5, 5, (10, 3)))
    direct = rotation.rotate(r, x)
    via_matrix = jnp.einsum("nij,nj->ni", rotation.rotvec_to_matrix(r), x)
    assert np.allclose(direct, via_matrix, atol=1e-10)


def test_jax_rotation_gradients_finite_at_identity():
    import jax
    import jax.numpy as jnp

    from opensfm_tpu.geometry import rotation

    def f(r):
        return jnp.sum(rotation.rotate(r, jnp.array([1.0, 2.0, 3.0])))

    g = jax.grad(f)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.jacfwd(rotation.rotvec_to_matrix)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g2)))
