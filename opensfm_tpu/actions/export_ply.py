"""Export reconstruction to PLY (reference actions/export_ply.py)."""

from __future__ import annotations


def run_dataset(data, no_cameras: bool = False, no_points: bool = False,
                depthmaps: bool = False, point_num_views: bool = False) -> None:
    reconstructions = data.load_reconstruction()
    tracks_manager = data.load_tracks_manager() if data.tracks_exists() else None
    if reconstructions:
        data.save_ply(
            reconstructions[0], tracks_manager, "reconstruction.ply",
            no_cameras, no_points, point_num_views,
        )
