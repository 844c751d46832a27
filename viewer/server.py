"""Reconstruction web viewer server.

Mirrors the reference `viewer/server.py` routes (/items, dataset files,
images — reference viewer/server.py:1-109) using only the standard
library (flask is unavailable here); the client is a self-contained WebGL
viewer (index.html): point cloud + camera frusta + GCPs + dense PLY +
thumbnails, no external JS dependencies (the reference's mapillary-js /
three.js stack needs a network build).

Usage: python viewer/server.py <dataset_path> [--port 8080]
"""

from __future__ import annotations

import argparse
import json
import os
import posixpath
import urllib.parse
from http.server import HTTPServer, SimpleHTTPRequestHandler

VIEWER_DIR = os.path.dirname(os.path.abspath(__file__))

MIME = {
    ".json": "application/json",
    ".html": "text/html",
    ".ply": "application/octet-stream",
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".png": "image/png",
    ".pdf": "application/pdf",
}


class ReconstructionHandler(SimpleHTTPRequestHandler):
    dataset_path = "."

    def do_GET(self):  # noqa: N802 (stdlib API)
        parsed = urllib.parse.urlparse(self.path)
        path = posixpath.normpath(urllib.parse.unquote(parsed.path))
        if path in ("/", "/index.html"):
            return self._serve_file(os.path.join(VIEWER_DIR, "index.html"),
                                    "text/html")
        if path == "/items":
            return self._serve_items()
        if path.startswith("/data/"):
            rel = path[len("/data/"):]
            if ".." in rel.split("/"):
                return self.send_error(403)
            ext = os.path.splitext(rel)[1].lower()
            return self._serve_file(
                os.path.join(self.dataset_path, rel),
                MIME.get(ext, "application/octet-stream"),
            )
        if path.startswith("/image/"):
            image = path[len("/image/"):]
            if ".." in image.split("/"):
                return self.send_error(403)
            for sub in ("images", "undistorted/images"):
                candidate = os.path.join(self.dataset_path, sub, image)
                if os.path.isfile(candidate):
                    ext = os.path.splitext(image)[1].lower()
                    return self._serve_file(candidate,
                                            MIME.get(ext, "image/jpeg"))
            self.send_error(404)
            return
        self.send_error(404)

    def _serve_items(self):
        """Dataset inventory: reconstructions, dense clouds, GCPs, stats."""
        d = self.dataset_path
        items = []
        for name in sorted(os.listdir(d)):
            if name.startswith("reconstruction") and name.endswith(".json"):
                items.append({"name": name, "type": "reconstruction"})
        dense = os.path.join("undistorted", "depthmaps", "merged.ply")
        payload = json.dumps({
            "items": items,
            "dense": dense if os.path.isfile(os.path.join(d, dense)) else None,
            "gcp": os.path.isfile(os.path.join(d, "ground_control_points.json")),
            "stats": os.path.isfile(os.path.join(d, "stats", "stats.json")),
        }).encode()
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
    parser = argparse.ArgumentParser(description="opensfm_tpu viewer")
    parser.add_argument("dataset", help="dataset path")
    parser.add_argument("--port", type=int, default=8080)
    args = parser.parse_args()
    ReconstructionHandler.dataset_path = os.path.abspath(args.dataset)
    server = HTTPServer(("0.0.0.0", args.port), ReconstructionHandler)
    print(f"Serving {args.dataset} at http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
