"""Web GCP annotation tool (stdlib HTTP, no flask).

Mirrors reference `annotation_gui_gcp/main.py` + `lib/GUI.py`: browse the
dataset's images side by side, click to add GCP observations, persist them
to `ground_control_points.json` (the same format `run_ba.py` and the
pipeline's GCP alignment consume).

Usage: python annotation_gui_gcp/main.py <dataset> [--port 8090]
"""

from __future__ import annotations

import argparse
import json
import os
import posixpath
import sys
import urllib.parse
from http.server import HTTPServer, SimpleHTTPRequestHandler

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from annotation_gui_gcp.lib.gcp_manager import (  # noqa: E402
    GroundControlPointManager,
)

HERE = os.path.dirname(os.path.abspath(__file__))


def analyze_dataset(dataset_path: str):
    """Triangulate annotated GCPs against the dataset's reconstruction and
    report per-observation reprojection + geopositional errors (reference
    annotation_gui_gcp run_ba analysis loop)."""
    from annotation_gui_gcp.run_ba import (
        gcp_geopositional_error,
        reproject_gcps,
    )
    from opensfm_tpu.dataset import DataSet

    data = DataSet(dataset_path)
    if not data.reconstruction_exists():
        return {"error": "no reconstruction.json — run the pipeline first"}
    rec = data.load_reconstruction()[0]
    gcps = data.load_ground_control_points()
    if not gcps:
        return {"error": "no annotated GCPs"}
    reproj = reproject_gcps(gcps, rec)
    geo = gcp_geopositional_error(gcps, rec)
    return {"reprojections": reproj, "geo_errors": geo}


class AnnotationHandler(SimpleHTTPRequestHandler):
    dataset_path = "."
    manager: GroundControlPointManager = None

    def do_GET(self):  # noqa: N802 (stdlib API)
        parsed = urllib.parse.urlparse(self.path)
        path = posixpath.normpath(parsed.path)
        if path in ("/", "/index.html"):
            return self._serve_file(
                os.path.join(HERE, "templates", "annotation.html"), "text/html"
            )
        if path == "/images":
            images = sorted(
                os.listdir(os.path.join(self.dataset_path, "images"))
            )
            return self._json({"images": images})
        if path == "/points":
            return self._json({"points": self.manager.points})
        if path.startswith("/image/"):
            image = urllib.parse.unquote(path[len("/image/"):])
            candidate = os.path.join(self.dataset_path, "images", image)
            return self._serve_file(candidate, "image/jpeg")
        self.send_error(404)

    def do_POST(self):  # noqa: N802 (stdlib API)
        length = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(length) or b"{}")
        parsed = urllib.parse.urlparse(self.path)
        path = posixpath.normpath(parsed.path)
        m = self.manager
        if path == "/add_observation":
            point_id = body["point_id"]
            if point_id not in m.points:
                m.add_point(point_id)
            m.add_point_observation(
                point_id, body["shot_id"], body["projection"]
            )
            m.write_to_file()
            return self._json({"ok": True})
        if path == "/remove_observation":
            m.remove_point_observation(body["point_id"], body["shot_id"])
            m.write_to_file()
            return self._json({"ok": True})
        if path == "/remove_point":
            m.remove_point(body["point_id"])
            m.write_to_file()
            return self._json({"ok": True})
        if path == "/set_position":
            m.set_point_position(
                body["point_id"], body["latitude"], body["longitude"],
                body.get("altitude"),
            )
            m.write_to_file()
            return self._json({"ok": True})
        if path == "/analyze":
            return self._json(analyze_dataset(self.dataset_path))
        self.send_error(404)

    def _json(self, obj):
        payload = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _serve_file(self, filepath, content_type):
        if not os.path.isfile(filepath):
            self.send_error(404)
            return
        with open(filepath, "rb") as f:
            payload = f.read()
        self.send_response(200)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, fmt, *args):  # quiet
        pass


def main() -> None:
    parser = argparse.ArgumentParser(description="GCP annotation tool")
    parser.add_argument("dataset", help="dataset path")
    parser.add_argument("--port", type=int, default=8090)
    args = parser.parse_args()
    AnnotationHandler.dataset_path = os.path.abspath(args.dataset)
    AnnotationHandler.manager = GroundControlPointManager(
        AnnotationHandler.dataset_path
    )
    server = HTTPServer(("0.0.0.0", args.port), AnnotationHandler)
    print(f"Annotating {args.dataset} at http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
