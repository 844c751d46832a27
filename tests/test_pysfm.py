"""Tests for the pysfm-shaped API surface (tracks surgery + realign_maps).

Mirrors the semantics of the reference's sfm/src/tracks_helpers.cc:32-45 and
sfm/src/retriangulation.cc:8-115.
"""

import numpy as np

from opensfm_tpu import pymap, pysfm, types
from opensfm_tpu.geo import TopocentricConverter
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose


def _make_rec(offset=np.zeros(3), scale_attr=1.0):
    rec = types.Reconstruction()
    rec.reference = TopocentricConverter(47.0, 6.0, 0.0)
    cam = Camera.create_perspective(0.9, -0.01, 0.001)
    cam.id = "cam1"
    cam.width, cam.height = 800, 600
    rec.add_camera(cam)
    for i in range(4):
        pose = Pose(np.zeros(3), np.array([float(i), 0.0, 0.0]) + offset)
        shot = rec.create_shot(f"shot{i}", "cam1", pose)
        shot.scale = scale_attr
    return rec


def test_add_remove_connections() -> None:
    tm = pymap.TracksManager()
    pysfm.add_connections(tm, "shotA", ["t1", "t2", "t3"])
    assert set(tm.get_shot_observations("shotA")) == {"t1", "t2", "t3"}
    pysfm.remove_connections(tm, "shotA", ["t2"])
    assert set(tm.get_shot_observations("shotA")) == {"t1", "t3"}


def test_realign_maps_shifts_shots_and_points() -> None:
    rec_from = _make_rec(offset=np.array([0.0, 0.0, -5.0]))
    rec_to = _make_rec()

    # extra shot in 'to' that 'from' doesn't have -> deleted
    rec_to.create_shot("orphan", "cam1", Pose())

    # a point observed by shot1
    pt = rec_to.create_point("p0", np.array([0.5, 0.2, 8.0]))
    obs = pymap.Observation(0.1, 0.2, 1.0, 10, 20, 30, 0)
    rec_to.add_observation("shot1", "p0", obs)

    # the realigned point is remapped with shot1's similarity: here 'from'
    # differs from 'to' by a pure camera translation, so the point moves by
    # the same world-frame offset the cameras moved by (computed from the
    # PRE-realign poses; realign_maps then moves 'to' shots onto 'from').
    origin_from = rec_from.shots["shot1"].pose.get_origin()
    origin_to = rec_to.shots["shot1"].pose.get_origin()
    expected = origin_from + (np.array([0.5, 0.2, 8.0]) - origin_to)

    pysfm.realign_maps(rec_from, rec_to, update_points=True)

    assert "orphan" not in rec_to.shots
    assert np.allclose(rec_to.points["p0"].coordinates, expected, atol=1e-9)
    # shots of 'to' now sit at 'from' poses
    assert np.allclose(
        rec_to.shots["shot1"].pose.get_origin(), origin_from, atol=1e-9
    )


def test_realign_maps_respects_reference_offset() -> None:
    rec_from = _make_rec()
    rec_from.reference = TopocentricConverter(47.0, 6.0, 10.0)  # 10 m higher
    rec_to = _make_rec()
    pysfm.realign_maps(rec_from, rec_to, update_points=False)
    # shot poses of 'to' keep their own values; rig instance poses get the
    # 'from' pose expressed in 'to's frame (10 m altitude offset -> +z)
    inst = next(iter(rec_to.rig_instances.values()))
    assert abs(inst.pose.get_origin()[2] - 10.0) < 1e-6
