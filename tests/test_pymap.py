"""Map / Shot / Landmark / TracksManager tests.

Mirrors reference map/test/map_test.cc, tracks_manager_test.cc and
test_datastructures.py coverage: shot lifecycle, rig pose composition,
observation bookkeeping, tracks serialization roundtrip.
"""

import numpy as np

from opensfm_tpu import pymap
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose
from opensfm_tpu.unionfind import UnionFind


def make_map():
    m = pymap.Map()
    cam = Camera.create_perspective(0.7, 0.0, 0.0)
    cam.id = "cam1"
    cam.width, cam.height = 640, 480
    m.create_camera(cam)
    return m


def test_create_and_remove_shot():
    m = make_map()
    s = m.create_shot("im1", "cam1", pose=Pose([0.1, 0.2, 0.3], [1, 2, 3]))
    assert s.id == "im1"
    assert np.allclose(s.pose.rotation, [0.1, 0.2, 0.3])
    assert "im1" in m.rig_instances  # implicit single-shot rig
    m.remove_shot("im1")
    assert "im1" not in m.shots
    assert "im1" not in m.rig_instances


def test_shot_pose_setter():
    m = make_map()
    s = m.create_shot("im1", "cam1")
    s.pose = Pose([0, 0, 0.5], [1, 0, 0])
    assert np.allclose(s.pose.translation, [1, 0, 0])


def test_rig_pose_composition():
    m = make_map()
    rc = pymap.RigCamera(Pose([0, 0, 0], [1, 0, 0]), "left")
    m.create_rig_camera(rc)
    instance_pose = Pose([0, 0, 0], [0, 0, 5])
    s = m.create_shot("im1", "cam1", rig_camera_id="left", rig_instance_id="inst1")
    m.rig_instances["inst1"].pose = instance_pose
    # pose(shot) = pose(rig_camera) ∘ pose(instance)  (shot.cc:146-151)
    expected = rc.pose.compose(instance_pose)
    assert np.allclose(s.pose.translation, expected.translation)
    # Setting pose of a rigged shot with offset rig camera raises.
    try:
        s.pose = Pose()
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_observations_bidirectional():
    m = make_map()
    m.create_shot("im1", "cam1")
    m.create_shot("im2", "cam1")
    lm = m.create_landmark("p0", [0.0, 0.0, 5.0])
    obs = pymap.Observation(0.1, 0.2, 1.0, 255, 0, 0, 7)
    m.add_observation("im1", "p0", obs)
    m.add_observation("im2", "p0", pymap.Observation(0.3, 0.1, 1.0, 255, 0, 0, 9))
    assert lm.number_of_observations() == 2
    assert m.shots["im1"].get_observation("p0") == obs
    m.remove_observation("im1", "p0")
    assert lm.number_of_observations() == 1
    m.remove_landmark("p0")
    assert m.shots["im2"].get_observation("p0") is None


def test_shot_project_roundtrip():
    m = make_map()
    s = m.create_shot("im1", "cam1", pose=Pose([0.0, 0.3, 0.0], [0.5, 0, 2]))
    point = np.array([1.0, 0.5, 8.0])
    uv = s.project(point)
    bearing = s.bearing(uv)
    # Bearing should point from the camera center toward the point.
    direction = point - s.pose.get_origin()
    direction /= np.linalg.norm(direction)
    assert np.allclose(bearing, direction, atol=1e-8)


def test_metadata_optional_values():
    m = make_map()
    s = m.create_shot("im1", "cam1")
    assert not s.metadata.gps_position.has_value
    s.metadata.gps_position.value = np.array([1.0, 2.0, 3.0])
    assert s.metadata.gps_position.has_value
    s2 = m.create_shot("im2", "cam1")
    s2.metadata.set(s.metadata)
    assert np.allclose(s2.metadata.gps_position.value, [1, 2, 3])


def test_tracks_manager_roundtrip():
    tm = pymap.TracksManager()
    tm.add_observation("im1", "0", pymap.Observation(0.1, 0.2, 1.5, 255, 128, 0, 3))
    tm.add_observation("im2", "0", pymap.Observation(-0.1, 0.0, 2.0, 255, 128, 0, 4))
    tm.add_observation("im1", "1", pymap.Observation(0.3, 0.1, 1.0, 0, 0, 255, 5, 2, 7))
    s = tm.as_string()
    assert s.startswith("OPENSFM_TRACKS_VERSION_v2")
    tm2 = pymap.TracksManager.instanciate_from_string(s)
    assert set(tm2.get_shot_ids()) == {"im1", "im2"}
    assert set(tm2.get_track_ids()) == {"0", "1"}
    o = tm2.get_observation("im1", "1")
    assert o.segmentation == 2 and o.instance == 7 and o.id == 5
    assert np.allclose(o.point, [0.3, 0.1])


def test_tracks_manager_common_and_connectivity():
    tm = pymap.TracksManager()
    for t in range(4):
        for im in ("im1", "im2", "im3")[: 2 + t % 2]:
            tm.add_observation(im, str(t), pymap.Observation(0, 0, 1, 0, 0, 0, t))
    common = tm.get_all_common_observations("im1", "im2")
    assert len(common) == 4
    conn = tm.get_all_pairs_connectivity()
    assert conn[("im1", "im2")] == 4
    assert conn[("im1", "im3")] == 2
    sub = tm.construct_sub_tracks_manager(["0", "1"], ["im1", "im2"])
    assert sub.num_tracks() == 2 and sub.num_shots() == 2


def test_tracks_manager_file_roundtrip(tmp_path):
    tm = pymap.TracksManager()
    tm.add_observation("im1", "0", pymap.Observation(0.1, 0.2, 1.5, 255, 128, 0, 3))
    path = str(tmp_path / "tracks.csv")
    tm.write_to_file(path)
    tm2 = pymap.TracksManager.instanciate_from_file(path)
    assert tm2.get_observation("im1", "0") == tm.get_observation("im1", "0")


def test_union_find():
    uf = UnionFind()
    for i in range(10):
        uf.add(i)
    uf.union(0, 1)
    uf.union(1, 2)
    uf.union(5, 6)
    clusters = {frozenset(c) for c in uf.clusters() if len(c) > 1}
    assert frozenset([0, 1, 2]) in clusters
    assert frozenset([5, 6]) in clusters
    assert uf.find(2) == uf.find(0)
    assert uf.find(3) != uf.find(0)


def test_merge_tracks_managers():
    tm1 = pymap.TracksManager()
    tm1.add_observation("im1", "a", pymap.Observation(0, 0, 1, 0, 0, 0, 10))
    tm1.add_observation("im2", "a", pymap.Observation(0, 0, 1, 0, 0, 0, 20))
    tm2 = pymap.TracksManager()
    tm2.add_observation("im2", "b", pymap.Observation(0, 0, 1, 0, 0, 0, 20))
    tm2.add_observation("im3", "b", pymap.Observation(0, 0, 1, 0, 0, 0, 30))
    merged = pymap.TracksManager.merge_tracks_manager([tm1, tm2])
    # Tracks a and b share (im2, feature 20) -> fused into one track.
    assert merged.num_tracks() == 1
    track = merged.get_track_observations(merged.get_track_ids()[0])
    assert set(track.keys()) == {"im1", "im2", "im3"}


def test_map_to_tracks_manager():
    m = make_map()
    m.create_shot("im1", "cam1")
    m.create_landmark("p0", [0, 0, 5])
    m.add_observation("im1", "p0", pymap.Observation(0.1, 0.2, 1.0, 0, 0, 0, 1))
    tm = m.to_tracks_manager()
    assert tm.num_tracks() == 1


def test_compute_reprojection_errors():
    m = make_map()
    s = m.create_shot("im1", "cam1", pose=Pose())
    m.create_landmark("p0", [0.0, 0.0, 5.0])
    proj = s.project([0.0, 0.0, 5.0])
    m.add_observation(
        "im1", "p0",
        pymap.Observation(proj[0] + 0.01, proj[1], 2.0, 0, 0, 0, 1),
    )
    m.compute_reprojection_errors(None, scaled=True)
    err = m.landmarks["p0"].reprojection_errors["im1"]
    assert np.allclose(err, [-0.005, 0.0], atol=1e-9)
