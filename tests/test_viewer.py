"""Viewer + annotation server smoke tests (stdlib HTTP, no browser)."""

import json
import os
import sys
import threading
import urllib.request
from http.server import HTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _start(handler_cls):
    server = HTTPServer(("127.0.0.1", 0), handler_cls)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://127.0.0.1:{server.server_port}"


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.read()


def test_viewer_server_routes(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "viewer"))
    import importlib
    server_mod = importlib.import_module("server")

    rec = [{
        "cameras": {"cam1": {"projection_type": "perspective", "focal": 0.9,
                             "width": 100, "height": 80, "k1": 0, "k2": 0}},
        "shots": {"a.jpg": {"camera": "cam1", "rotation": [0, 0, 0],
                            "translation": [0, 0, 0]}},
        "points": {"0": {"coordinates": [0, 0, 1], "color": [10, 20, 30]}},
    }]
    (tmp_path / "reconstruction.json").write_text(json.dumps(rec))
    os.makedirs(tmp_path / "images")
    (tmp_path / "images" / "a.jpg").write_bytes(b"\xff\xd8fakejpg")

    class H(server_mod.ReconstructionHandler):
        dataset_path = str(tmp_path)

    srv, base = _start(H)
    try:
        status, body = _get(base + "/items")
        assert status == 200
        meta = json.loads(body)
        assert meta["items"] == [
            {"name": "reconstruction.json", "type": "reconstruction"}
        ]
        assert meta["dense"] is None and meta["gcp"] is False

        status, body = _get(base + "/")
        assert status == 200 and b"WebGL" in body

        status, body = _get(base + "/data/reconstruction.json")
        assert status == 200 and json.loads(body) == rec

        status, body = _get(base + "/image/a.jpg")
        assert status == 200 and body.startswith(b"\xff\xd8")
    finally:
        srv.shutdown()


def test_viewer_items_reports_dense_and_gcp(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "viewer"))
    import importlib
    server_mod = importlib.import_module("server")

    (tmp_path / "reconstruction.json").write_text("[]")
    os.makedirs(tmp_path / "undistorted" / "depthmaps")
    (tmp_path / "undistorted" / "depthmaps" / "merged.ply").write_text(
        "ply\nformat ascii 1.0\nelement vertex 0\nend_header\n"
    )
    (tmp_path / "ground_control_points.json").write_text('{"points": []}')

    class H(server_mod.ReconstructionHandler):
        dataset_path = str(tmp_path)

    srv, base = _start(H)
    try:
        _, body = _get(base + "/items")
        meta = json.loads(body)
        assert meta["dense"] == "undistorted/depthmaps/merged.ply"
        assert meta["gcp"] is True
    finally:
        srv.shutdown()


def test_annotation_analyze_requires_reconstruction(tmp_path):
    from annotation_gui_gcp.main import analyze_dataset

    os.makedirs(tmp_path / "images")
    out = analyze_dataset(str(tmp_path))
    assert "error" in out


def test_annotation_analyze_on_synthetic_reconstruction(tmp_path):
    """End-to-end: a perfect synthetic reconstruction + consistent GCP
    annotations must reproject with ~zero error."""
    import numpy as np

    from annotation_gui_gcp.main import analyze_dataset
    from opensfm_tpu import geo as geo_mod
    from opensfm_tpu import io as io_mod
    from opensfm_tpu import pymap, types
    from opensfm_tpu.geometry import pose as pose_mod
    from opensfm_tpu.geometry.cameras import Camera

    rec = types.Reconstruction()
    rec.reference = geo_mod.TopocentricConverter(52.0, 13.0, 0.0)
    cam = Camera.create_perspective(0.9, 0.0, 0.0)
    cam.id = "cam1"
    cam.width, cam.height = 100, 80
    rec.add_camera(cam)
    for i, origin in enumerate([[0, 0, 0], [2, 0, 0]]):
        pose = pose_mod.Pose()
        pose.set_origin(np.array(origin, dtype=float))
        shot = rec.create_shot(f"im{i}.jpg", "cam1", pose)
    # One world point seen by both shots.
    pt = np.array([1.0, 0.5, 8.0])
    obs = []
    for i in range(2):
        shot = rec.shots[f"im{i}.jpg"]
        proj = shot.project(pt)
        obs.append({"shot_id": f"im{i}.jpg",
                    "projection": [float(proj[0]), float(proj[1])]})
    lla = rec.reference.to_lla(*pt)
    gcp_file = {
        "points": [{
            "id": "gcp1",
            "position": {"latitude": lla[0], "longitude": lla[1],
                         "altitude": lla[2]},
            "observations": obs,
        }]
    }
    (tmp_path / "ground_control_points.json").write_text(json.dumps(gcp_file))
    with open(tmp_path / "reconstruction.json", "w") as f:
        json.dump(io_mod.reconstructions_to_json([rec]), f)
    os.makedirs(tmp_path / "images")

    out = analyze_dataset(str(tmp_path))
    assert "error" not in out, out
    reproj = out["reprojections"]["gcp1"]
    assert set(reproj.keys()) == {"im0.jpg", "im1.jpg"}
    for o in reproj.values():
        assert o["error"] < 1e-6
    assert out["geo_errors"]["gcp1"]["error"] < 1e-6
