"""Link pairwise matches into tracks
(reference actions/create_tracks.py:8-62)."""

from __future__ import annotations

from timeit import default_timer as timer

from opensfm_tpu import io, tracking


def run_dataset(data) -> None:
    start = timer()
    features, colors, segmentations, instances, depths = tracking.load_features(
        data, data.images()
    )
    features_end = timer()
    matches = tracking.load_matches(data, data.images())
    matches_end = timer()
    tracks_manager = tracking.create_tracks_manager(
        features, colors, segmentations, instances, matches,
        data.config["min_track_length"], depths,
        data.config["depth_is_radial"],
        data.config["depth_std_deviation_m_default"],
    )
    tracks_end = timer()
    data.save_tracks_manager(tracks_manager)

    report = {
        "wall_times": {
            "load_features": features_end - start,
            "load_matches": matches_end - features_end,
            "compute_tracks": tracks_end - matches_end,
        },
        "num_images": tracks_manager.num_shots(),
        "num_tracks": tracks_manager.num_tracks(),
    }
    data.save_report(io.json_dumps(report), "tracks.json")
