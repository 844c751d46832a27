"""IO roundtrip tests — mirrors reference test_io.py coverage."""

import json

import numpy as np
import pytest

from opensfm_tpu import io, pymap, types
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose, Similarity


def make_reconstruction():
    rec = types.Reconstruction()
    cam = Camera.create_perspective(0.9, -0.1, 0.01)
    cam.id = "cam1"
    cam.width, cam.height = 640, 480
    rec.add_camera(cam)
    rec.set_bias("cam1", Similarity([0.1, 0, 0], [1, 2, 3], 1.1))
    shot = rec.create_shot("im1", "cam1", Pose([0.1, 0.2, 0.3], [1, 2, 3]))
    shot.metadata.gps_position.value = np.array([1.0, 2.0, 3.0])
    shot.metadata.gps_accuracy.value = 5.0
    shot.metadata.orientation.value = 1
    shot.metadata.capture_time.value = 1234.5
    p = rec.create_point("42", [1.0, 2.0, 3.0])
    p.color = np.array([255, 100, 5])
    from opensfm_tpu.geo import TopocentricConverter

    rec.reference = TopocentricConverter(52.0, 13.0, 30.0)
    return rec


def test_reconstruction_json_roundtrip():
    rec = make_reconstruction()
    obj = io.reconstructions_to_json([rec])
    rec2 = io.reconstructions_from_json(json.loads(json.dumps(obj)))[0]

    assert rec2.cameras["cam1"] == rec.cameras["cam1"]
    assert np.allclose(
        rec2.shots["im1"].pose.rotation, rec.shots["im1"].pose.rotation
    )
    assert np.allclose(
        rec2.shots["im1"].pose.translation, rec.shots["im1"].pose.translation
    )
    assert np.allclose(
        rec2.shots["im1"].metadata.gps_position.value, [1, 2, 3]
    )
    assert rec2.shots["im1"].metadata.gps_accuracy.value == 5.0
    assert np.allclose(rec2.points["42"].coordinates, [1, 2, 3])
    assert np.allclose(rec2.points["42"].color, [255, 100, 5])
    assert rec2.reference.lat == 52.0
    assert np.isclose(rec2.biases["cam1"].scale, 1.1)


@pytest.mark.parametrize(
    "make",
    [
        lambda: Camera.create_perspective(0.8, -0.1, 0.01),
        lambda: Camera.create_brown(
            0.8, 0.95, [0.01, -0.005], [-0.1, 0.02, 0.001, 0.001, -0.002]
        ),
        lambda: Camera.create_fisheye(0.6, -0.02, 0.003),
        lambda: Camera.create_fisheye_opencv(
            0.7, 0.95, [0.005, -0.01], [-0.02, 0.005, 0.001, -0.0005]
        ),
        lambda: Camera.create_fisheye62(
            0.75, 1.02, [0.0, 0.0],
            [-0.02, 0.005, 0.001, -0.0005, 0.0002, -0.0001, 0.001, -0.001],
        ),
        lambda: Camera.create_fisheye624(
            0.75, 1.0, [0.0, 0.0],
            [-0.02, 0.005, 0.001, -0.0005, 0.0002, -0.0001, 0.001, -0.001,
             0.0005, -0.0005, 0.0002, -0.0002],
        ),
        lambda: Camera.create_dual(0.4, 0.7, -0.05, 0.005),
        lambda: Camera.create_spherical(),
        lambda: Camera.create_radial(0.8, 0.95, [0.01, -0.01], [-0.1, 0.02]),
        lambda: Camera.create_simple_radial(0.8, 0.95, [0.01, -0.01], -0.1),
    ],
)
def test_camera_json_roundtrip(make):
    cam = make()
    cam.id = "cam"
    cam.width, cam.height = 800, 600
    obj = io.camera_to_json(cam)
    cam2 = io.camera_from_json("cam", json.loads(json.dumps(obj)))
    assert cam2 == cam


def test_gcp_json_roundtrip(tmp_path):
    gcp = io.GroundControlPoint()
    gcp.id = "gcp1"
    gcp.lla = {"latitude": 52.0, "longitude": 13.0, "altitude": 30.0}
    gcp.has_altitude = True
    gcp.observations = [
        io.GroundControlPointObservation("im1", [0.1, 0.2]),
        io.GroundControlPointObservation("im2", [-0.1, 0.0]),
    ]
    path = tmp_path / "gcp.json"
    with open(path, "w") as f:
        io.write_ground_control_points([gcp], f)
    with open(path) as f:
        loaded = io.read_ground_control_points(f)
    assert len(loaded) == 1
    assert loaded[0].id == "gcp1"
    assert loaded[0].has_altitude
    assert len(loaded[0].observations) == 2
    assert np.allclose(loaded[0].observations[0].projection, [0.1, 0.2])


def test_reconstruction_to_ply():
    rec = make_reconstruction()
    ply = io.reconstruction_to_ply(rec)
    lines = ply.splitlines()
    assert lines[0] == "ply"
    n_vertices = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    assert n_vertices == 1 + 30  # 1 point + 3 axes x 10 samples for the shot


def test_rig_json_roundtrip():
    rec = types.Reconstruction()
    cam = Camera.create_perspective(0.9, 0.0, 0.0)
    cam.id = "cam1"
    rec.add_camera(cam)
    rig_cam = pymap.RigCamera(Pose([0, 0, 0.1], [1, 0, 0]), "left")
    rec.add_rig_camera(rig_cam)
    instance = pymap.RigInstance("inst0")
    instance.pose = Pose([0, 0, 0], [0, 0, 5])
    rec.add_rig_instance(instance)
    rec.create_shot("im1", "cam1", rig_camera_id="left", rig_instance_id="inst0")

    obj = io.reconstruction_to_json(rec)
    rec2 = io.reconstruction_from_json(json.loads(json.dumps(obj)))
    assert "left" in rec2.rig_cameras
    assert "inst0" in rec2.rig_instances
    shot2 = rec2.shots["im1"]
    assert shot2.rig_camera.id == "left"
    assert shot2.rig_instance.id == "inst0"
    assert np.allclose(
        shot2.pose.translation, rec.shots["im1"].pose.translation
    )


def test_point_cloud_ply_roundtrip() -> None:
    """Dense PLY write/read roundtrip (reference io.py:1184-1249)."""
    import io as stdio

    import numpy as np

    from opensfm_tpu import io

    rng = np.random.default_rng(3)
    pts = rng.uniform(-5, 5, (7, 3)).astype(np.float32)
    nrm = rng.normal(size=(7, 3)).astype(np.float32)
    col = rng.integers(0, 255, (7, 3)).astype(np.uint8)
    lab = np.arange(7, dtype=np.uint8)
    buf = stdio.StringIO()
    io.point_cloud_to_ply(pts, nrm, col, lab, buf)
    buf.seek(0)
    p2, n2, c2, l2 = io.point_cloud_from_ply(buf)
    assert np.allclose(pts, p2, atol=1e-3)
    assert np.allclose(nrm, n2, atol=1e-3)
    assert (col == c2).all() and (lab == l2).all()


def test_io_filesystem_default(tmp_path) -> None:
    """IoFilesystemDefault basics (reference io.py:1429-1510)."""
    from opensfm_tpu import io

    fs = io.IoFilesystemDefault()
    d = str(tmp_path / "sub")
    fs.mkdir_p(d)
    assert fs.isdir(d) and fs.exists(d)
    f = str(tmp_path / "sub" / "x.txt")
    with fs.open_wt(f) as fp:
        fp.write("hello")
    with fs.open_rt(f) as fp:
        assert fp.read() == "hello"
    assert fs.isfile(f) and fs.timestamp(f) > 0
    assert fs.ls(d) == ["x.txt"]
    fs.rm_if_exist(f)
    assert not fs.exists(f)


def test_openmvs_binary_roundtrip(tmp_path):
    """The .mvs writer produces a stream that parses back exactly
    (Interface.h version-6 layout: magic, u64-prefixed strings/vectors,
    row-major f64 matrices, f32 vertex positions)."""
    import numpy as np

    from opensfm_tpu.io_openmvs import (
        MVSI_PROJECT_VER,
        OpenMVSExporter,
        read_mvs,
    )

    ex = OpenMVSExporter()
    K = np.array([[1000.0, 0, 511.5], [0, 1000.0, 383.5], [0, 0, 1]])
    ex.add_camera("cam1", K, 1024, 768)
    R = np.eye(3)
    ex.add_shot("/tmp/a.jpg", "", "shot_a", "cam1", R, np.array([1.0, 2, 3]))
    ex.add_shot("/tmp/b.jpg", "/tmp/b_mask.png", "shot_b", "cam1", R,
                np.array([4.0, 5, 6]))
    ex.add_point(np.array([0.5, -0.5, 10.0]), ["shot_a", "shot_b"])
    ex.add_point(np.array([1.5, 0.5, 12.0]), ["shot_b"])

    out = tmp_path / "scene.mvs"
    ex.export(str(out))
    assert out.stat().st_size > 0

    scene = read_mvs(str(out))
    assert scene["version"] == MVSI_PROJECT_VER
    assert len(scene["platforms"]) == 1
    p = scene["platforms"][0]
    assert p["name"] == "cam1"
    assert len(p["cameras"]) == 1
    np.testing.assert_allclose(p["cameras"][0]["K"], K)
    assert p["cameras"][0]["width"] == 1024
    assert len(p["poses"]) == 2
    np.testing.assert_allclose(p["poses"][0]["C"], [1, 2, 3])
    assert len(scene["images"]) == 2
    assert scene["images"][0]["name"] == "/tmp/a.jpg"
    assert scene["images"][1]["mask_name"] == "/tmp/b_mask.png"
    assert scene["images"][1]["pose_id"] == 1
    assert len(scene["vertices"]) == 2
    np.testing.assert_allclose(
        scene["vertices"][0]["X"], [0.5, -0.5, 10.0], rtol=1e-6
    )
    assert [v[0] for v in scene["vertices"][0]["views"]] == [0, 1]
