"""Reconstruction web viewer server.

Mirrors the reference `viewer/server.py` routes (/items, dataset files,
images) using only the standard library (flask is unavailable here); the
client is a self-contained WebGL-free point-cloud viewer (index.html).

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


class ReconstructionHandler(SimpleHTTPRequestHandler):
    dataset_path = "."

    def do_GET(self):  # noqa: N802 (stdlib API)
        parsed = urllib.parse.urlparse(self.path)
        path = posixpath.normpath(parsed.path)
        if path in ("/", "/index.html"):
            return self._serve_file(os.path.join(VIEWER_DIR, "index.html"),
                                    "text/html")
        if path == "/items":
            return self._serve_items()
        if path.startswith("/data/"):
            rel = path[len("/data/"):]
            return self._serve_file(
                os.path.join(self.dataset_path, rel), "application/json"
            )
        if path.startswith("/image/"):
            image = urllib.parse.unquote(path[len("/image/"):])
            for sub in ("images", "undistorted/images"):
                candidate = os.path.join(self.dataset_path, sub, image)
                if os.path.isfile(candidate):
                    return self._serve_file(candidate, "image/jpeg")
            self.send_error(404)
            return
        self.send_error(404)

    def _serve_items(self):
        items = []
        for name in sorted(os.listdir(self.dataset_path)):
            if name.startswith("reconstruction") and name.endswith(".json"):
                items.append({"name": name, "type": "reconstruction"})
        payload = json.dumps({"items": items}).encode()
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
