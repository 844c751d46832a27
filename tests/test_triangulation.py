"""Triangulation kernel tests — mirrors reference test_triangulation.py."""

import jax.numpy as jnp
import numpy as np

from opensfm_tpu import io, pymap, reconstruction
from opensfm_tpu.geometry import triangulation as tri


def unit_vector(x):
    return np.array(x, dtype=float) / np.linalg.norm(x)


def make_spherical_two_shot_rec(second_translation):
    return io.reconstruction_from_json(
        {
            "cameras": {
                "theta": {
                    "projection_type": "spherical",
                    "width": 800,
                    "height": 400,
                }
            },
            "shots": {
                "im1": {
                    "camera": "theta",
                    "rotation": [0.0, 0.0, 0.0],
                    "translation": [0.0, 0.0, 0.0],
                },
                "im2": {
                    "camera": "theta",
                    "rotation": [0.0, 0.0, 0.0],
                    "translation": list(second_translation),
                },
            },
            "points": {},
        }
    )


def test_track_triangulator_spherical():
    tracks_manager = pymap.TracksManager()
    tracks_manager.add_observation(
        "im1", "1", pymap.Observation(0, 0, 1.0, 0, 0, 0, 0)
    )
    tracks_manager.add_observation(
        "im2", "1", pymap.Observation(-0.1, 0, 1.0, 0, 0, 0, 1)
    )
    rec = make_spherical_two_shot_rec([-1.0, 0.0, 0.0])
    config = {
        "triangulation_threshold": 0.01,
        "triangulation_min_ray_angle": 2.0,
        "triangulation_min_depth": 0.001,
        "triangulation_refinement_iterations": 10,
    }
    reconstruction.triangulate_tracks(["1"], tracks_manager, rec, config)
    assert "1" in rec.points
    p = rec.points["1"].coordinates
    assert np.allclose(p, [0, 0, 1.3763819204711], atol=1e-6)
    assert len(rec.points["1"].get_observations()) == 2


def test_track_triangulator_coincident_camera_origins():
    tracks_manager = pymap.TracksManager()
    tracks_manager.add_observation(
        "im1", "1", pymap.Observation(0, 0, 1.0, 0, 0, 0, 0)
    )
    tracks_manager.add_observation(
        "im2", "1", pymap.Observation(-0.1, 0, 1.0, 0, 0, 0, 1)
    )
    rec = make_spherical_two_shot_rec([0.0, 0.0, 0.0])
    config = {
        "triangulation_threshold": 0.01,
        "triangulation_min_ray_angle": 2.0,
        "triangulation_min_depth": 0.0001,
        "triangulation_refinement_iterations": 10,
    }
    reconstruction.triangulate_tracks(["1"], tracks_manager, rec, config)
    assert not rec.points


def test_triangulate_bearings_dlt():
    rt1 = np.append(np.identity(3), [[0], [0], [0]], axis=1)
    rt2 = np.append(np.identity(3), [[-1], [0], [0]], axis=1)
    b1 = unit_vector([0.0, 0, 1])
    b2 = unit_vector([-1.0, 0, 1])
    res, X = tri.triangulate_bearings_dlt(
        jnp.asarray(np.stack([rt1, rt2])), jnp.asarray(np.stack([b1, b2])),
        jnp.ones(2, bool), 0.01, np.radians(2.0), 0.001,
    )
    assert np.allclose(np.asarray(X), [0, 0, 1.0], atol=1e-9)
    assert bool(res) is True


def test_triangulate_bearings_dlt_coincident_camera_origins():
    rt1 = np.append(np.identity(3), [[0], [0], [0]], axis=1)
    rt2 = np.append(np.identity(3), [[0], [0], [0]], axis=1)
    b1 = unit_vector([0.0, 0, 1])
    b2 = unit_vector([-1.0, 0, 1])
    res, _ = tri.triangulate_bearings_dlt(
        jnp.asarray(np.stack([rt1, rt2])), jnp.asarray(np.stack([b1, b2])),
        jnp.ones(2, bool), 0.01, np.radians(2.0), 0.001,
    )
    assert bool(res) is False


def test_triangulate_bearings_midpoint():
    o1, b1 = np.array([0.0, 0, 0]), unit_vector([0.0, 0, 1])
    o2, b2 = np.array([1.0, 0, 0]), unit_vector([-1.0, 0, 1])
    ok, X = tri.triangulate_bearings_midpoint(
        jnp.asarray(np.stack([o1, o2])), jnp.asarray(np.stack([b1, b2])),
        jnp.ones(2, bool), jnp.full(2, 0.01), np.radians(2.0), 0.001,
    )
    assert np.allclose(np.asarray(X), [0, 0, 1.0], atol=1e-9)
    assert bool(ok) is True


def test_triangulate_bearings_midpoint_coincident_camera_origins():
    o1, b1 = np.array([0.0, 0, 0]), unit_vector([0.0, 0, 1])
    o2, b2 = np.array([0.0, 0, 0]), unit_vector([-1.0, 0, 1])
    ok, _ = tri.triangulate_bearings_midpoint(
        jnp.asarray(np.stack([o1, o2])), jnp.asarray(np.stack([b1, b2])),
        jnp.ones(2, bool), jnp.full(2, 0.01), np.radians(2.0), 0.001,
    )
    assert bool(ok) is False


def test_triangulate_two_bearings_midpoint():
    # Camera 2 at origin (1, 0, 0) with identity rotation: t = -origin.
    b1 = unit_vector([0.0, 0, 1])
    b2 = unit_vector([-1.0, 0, 1])
    ok, X = tri.triangulate_two_bearings_midpoint(
        jnp.asarray(b1), jnp.asarray(b2),
        jnp.eye(3), jnp.asarray([-1.0, 0.0, 0.0]),
    )
    assert bool(ok) is True
    assert np.allclose(np.asarray(X), [0, 0, 1.0], atol=1e-9)


def test_triangulate_two_bearings_midpoint_failed():
    b1 = unit_vector([0.0, 0, 1])
    # Almost parallel rays: must be rejected.
    b2 = b1 + np.array([-1e-10, 0, 0])
    ok, _ = tri.triangulate_two_bearings_midpoint(
        jnp.asarray(b1), jnp.asarray(b2),
        jnp.eye(3), jnp.asarray([-1.0, 0.0, 0.0]),
    )
    assert bool(ok) is False
