"""Shot neighborhood BFS tests — mirrors reference
test_reconstruction_shot_neighborhood.py."""

from opensfm_tpu import pymap, types
from opensfm_tpu.ba.problem import shot_neighborhood
from opensfm_tpu.geometry.cameras import Camera


def _make_rec():
    rec = types.Reconstruction()
    cam = Camera.create_perspective(0.5, 0, 0)
    cam.id = "cam1"
    rec.add_camera(cam)
    return rec, cam


def _add_point(rec, point_id, observations):
    rec.create_point(point_id)
    for shot_id in observations:
        obs = pymap.Observation(100, 200, 0.5, 255, 0, 0, int(point_id))
        rec.add_observation(shot_id, point_id, obs)


def test_shot_neighborhood_linear_graph():
    rec, cam = _make_rec()
    rec.create_shot("im0", "cam1")
    for i in range(1, 4):
        p, n = f"im{i - 1}", f"im{i}"
        rec.create_shot(n, "cam1")
        _add_point(rec, str(i), [p, n])

    interior, boundary = shot_neighborhood(
        rec, "im2", radius=1, min_common_points=1, max_interior_size=10
    )
    assert interior == {"im2"}
    assert boundary == {"im1", "im3"}

    interior, boundary = shot_neighborhood(
        rec, "im2", radius=2, min_common_points=1, max_interior_size=10
    )
    assert interior == {"im1", "im2", "im3"}
    assert boundary == {"im0"}

    interior, boundary = shot_neighborhood(
        rec, "im2", radius=3, min_common_points=1, max_interior_size=10
    )
    assert interior == {"im0", "im1", "im2", "im3"}
    assert boundary == set()

    interior, boundary = shot_neighborhood(
        rec, "im2", radius=3, min_common_points=1, max_interior_size=3
    )
    assert interior == {"im1", "im2", "im3"}
    assert boundary == {"im0"}


def test_shot_neighborhood_complete_graph():
    rec, cam = _make_rec()
    for i in range(4):
        rec.create_shot(f"im{i}", "cam1")
    _add_point(rec, "1", list(rec.shots.keys()))

    interior, boundary = shot_neighborhood(
        rec, "im2", radius=2, min_common_points=1, max_interior_size=10
    )
    assert interior == {"im0", "im1", "im2", "im3"}
    assert boundary == set()


def test_shot_neighborhood_sorted_results():
    rec, cam = _make_rec()
    for i in range(3):
        rec.create_shot(f"im{i}", "cam1")
    _add_point(rec, "1", ["im0", "im1"])
    _add_point(rec, "2", ["im0", "im1"])
    _add_point(rec, "3", ["im0", "im2"])

    interior, boundary = shot_neighborhood(
        rec, "im0", radius=2, min_common_points=1, max_interior_size=2
    )
    assert interior == {"im0", "im1"}
    assert boundary == {"im2"}

    _add_point(rec, "4", ["im0", "im2"])
    _add_point(rec, "5", ["im0", "im2"])

    interior, boundary = shot_neighborhood(
        rec, "im0", radius=2, min_common_points=1, max_interior_size=2
    )
    assert interior == {"im0", "im2"}
    assert boundary == {"im1"}
