"""Undistortion tests — mirrors reference test_undistort.py coverage."""

import numpy as np

from opensfm_tpu import pymap, types, undistort
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose


class _MemUdata:
    def __init__(self):
        self.config = {"depthmap_resolution": 64}
        self.saved = {}

    def save_undistorted_reconstruction(self, recs):
        self.saved["rec"] = recs

    def save_undistorted_tracks_manager(self, tm):
        self.saved["tracks"] = tm

    def save_undistorted_shot_ids(self, ids):
        self.saved["ids"] = ids


class _MemData:
    config = {"depthmap_resolution": 64}

    def __init__(self, images):
        self._images = images

    def images(self):
        return self._images


def make_perspective_reconstruction():
    rec = types.Reconstruction()
    cam = Camera.create_perspective(0.8, -0.1, 0.01)
    cam.id = "cam1"
    cam.width, cam.height = 320, 240
    rec.add_camera(cam)
    rec.create_shot("im1", "cam1", Pose([0.1, 0, 0], [0, 0, 1]))
    rec.create_point("0", [0.0, 0.0, 5.0])
    return rec


def test_undistort_perspective_removes_distortion():
    rec = make_perspective_reconstruction()
    tm = pymap.TracksManager()
    uv = rec.shots["im1"].project([0.0, 0.0, 5.0])
    tm.add_observation("im1", "0", pymap.Observation(uv[0], uv[1], 1, 0, 0, 0, 0))

    udata = _MemUdata()
    shots = undistort.undistort_reconstruction(
        tm, rec, _MemData(["im1"]), udata
    )
    urec = udata.saved["rec"][0]
    ucam = urec.cameras["cam1"]
    assert ucam.projection_type == "perspective"
    assert ucam.k1 == 0.0 and ucam.k2 == 0.0
    assert len(shots["im1"]) == 1
    # Undistorted observation reprojects through the undistorted camera.
    utm = udata.saved["tracks"]
    uobs = utm.get_observation("im1", "0")
    ushot = urec.shots["im1"]
    expected = ushot.project([0.0, 0.0, 5.0])
    assert np.allclose(uobs.point, expected, atol=1e-8)


def test_undistort_spherical_makes_cube_faces():
    rec = types.Reconstruction()
    cam = Camera.create_spherical()
    cam.id = "pano"
    cam.width, cam.height = 512, 256
    rec.add_camera(cam)
    rec.create_shot("im1", "pano", Pose())
    tm = pymap.TracksManager()

    udata = _MemUdata()
    shots = undistort.undistort_reconstruction(
        tm, rec, _MemData(["im1"]), udata
    )
    assert len(shots["im1"]) == 6
    urec = udata.saved["rec"][0]
    # All six faces share one rig instance; rotations cover the cube.
    instance_ids = {s.rig_instance.id for s in shots["im1"]}
    assert len(instance_ids) == 1
    names = {s.id for s in shots["im1"]}
    assert any("front" in n for n in names)
    assert any("top" in n for n in names)


def test_camera_mapping_identity():
    cam = Camera.create_perspective(0.8, 0.0, 0.0)
    cam.id = "c"
    cam.width, cam.height = 64, 48
    map_x, map_y = undistort.compute_camera_mapping(cam, cam, 64, 48)
    ys, xs = np.mgrid[0:48, 0:64]
    assert np.allclose(map_x, xs, atol=1e-6)
    assert np.allclose(map_y, ys, atol=1e-6)


def test_pano_subshot_tracks():
    rec = types.Reconstruction()
    pano_cam = Camera.create_spherical()
    pano_cam.id = "pano"
    pano_cam.width, pano_cam.height = 512, 256
    rec.add_camera(pano_cam)
    pano_shot = rec.create_shot("im1", "pano", Pose())

    tm = pymap.TracksManager()
    # A point straight ahead (z+) lands on the front face.
    uv = pano_cam.project([0.0, 0.0, 1.0])
    tm.add_observation("im1", "t0", pymap.Observation(uv[0], uv[1], 1, 0, 0, 0, 0))

    udata = _MemUdata()
    undistort.undistort_reconstruction(tm, rec, _MemData(["im1"]), udata)
    utm = udata.saved["tracks"]
    front_shots = [s for s in utm.get_shot_ids() if "front" in s]
    assert front_shots
    obs = utm.get_observation(front_shots[0], "t0")
    assert np.allclose(obs.point, [0.0, 0.0], atol=1e-8)
