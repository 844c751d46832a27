"""Ground-control-point annotation store.

Mirrors reference `annotation_gui_gcp/lib/gcp_manager.py:1-377`
(GroundControlPointManager: load/save the dataset's
ground_control_points.json, add/remove point observations, track which
images observe which points)."""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


class GroundControlPointManager:
    def __init__(self, path: str) -> None:
        self.path = path
        self.points: Dict[str, dict] = {}  # id -> {"position": lla?, "observations": [...]}
        self.load_from_file()

    # -- persistence ---------------------------------------------------------
    def file_path(self) -> str:
        return os.path.join(self.path, "ground_control_points.json")

    def load_from_file(self) -> None:
        fp = self.file_path()
        if not os.path.isfile(fp):
            return
        with open(fp) as f:
            obj = json.load(f)
        for point in obj.get("points", []):
            self.points[point["id"]] = {
                "position": point.get("position"),
                "observations": point.get("observations", []),
            }

    def write_to_file(self) -> None:
        points = []
        for point_id, data in self.points.items():
            entry = {"id": point_id, "observations": data["observations"]}
            if data.get("position"):
                entry["position"] = data["position"]
            points.append(entry)
        with open(self.file_path(), "w") as f:
            json.dump({"points": points}, f, indent=4)

    # -- edits ---------------------------------------------------------------
    def add_point(self, point_id: str, position: Optional[dict] = None) -> None:
        if point_id in self.points:
            raise ValueError(f"Point {point_id} already exists")
        self.points[point_id] = {"position": position, "observations": []}

    def remove_point(self, point_id: str) -> None:
        self.points.pop(point_id, None)

    def add_point_observation(
        self, point_id: str, shot_id: str, projection: List[float]
    ) -> None:
        self.remove_point_observation(point_id, shot_id)
        self.points.setdefault(
            point_id, {"position": None, "observations": []}
        )["observations"].append(
            {"shot_id": shot_id, "projection": list(projection)}
        )

    def remove_point_observation(self, point_id: str, shot_id: str) -> None:
        point = self.points.get(point_id)
        if point is None:
            return
        point["observations"] = [
            o for o in point["observations"] if o["shot_id"] != shot_id
        ]

    def set_point_position(self, point_id: str, lat: float, lon: float,
                           alt: Optional[float] = None) -> None:
        pos = {"latitude": lat, "longitude": lon}
        if alt is not None:
            pos["altitude"] = alt
        self.points[point_id]["position"] = pos

    # -- queries -------------------------------------------------------------
    def get_observations(self, point_id: str) -> List[dict]:
        return self.points.get(point_id, {}).get("observations", [])

    def observed_shots(self, point_id: str) -> List[str]:
        return [o["shot_id"] for o in self.get_observations(point_id)]

    def points_on_shot(self, shot_id: str) -> Dict[str, List[float]]:
        out = {}
        for point_id, data in self.points.items():
            for o in data["observations"]:
                if o["shot_id"] == shot_id:
                    out[point_id] = o["projection"]
        return out
