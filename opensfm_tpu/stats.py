"""Reconstruction statistics + quality plots.

Mirrors reference `opensfm/stats.py` (compute_all_statistics:455,
reconstruction_statistics:196, processing_statistics:288, gps_errors:74,
gcp_errors:81, save_matchgraph:501, save_residual_histogram:568,
save_topview:622, save_heatmap:795).
"""

from __future__ import annotations

import logging
import math
import os
import statistics
from collections import defaultdict
from functools import lru_cache
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from opensfm_tpu import io, multiview, pymap, types

logger = logging.getLogger(__name__)

RESIDUAL_PIXEL_CUTOFF = 4


def _norm2d(point: np.ndarray) -> float:
    return math.sqrt(point[0] ** 2 + point[1] ** 2)


def gps_errors(reconstructions: List[types.Reconstruction]) -> Dict[str, Any]:
    """GPS position residuals of the reconstructed shots (stats.py:74-79)."""
    errors = []
    for rec in reconstructions:
        for shot in rec.shots.values():
            if shot.metadata.gps_position.has_value:
                bias = rec.biases[shot.camera.id]
                gps = bias.transform(shot.metadata.gps_position.value)
                errors.append(np.asarray(shot.pose.get_origin() - gps))
    return _gps_gcp_errors_stats(np.array(errors))


def gcp_errors(data, reconstructions: List[types.Reconstruction]) -> Dict[str, Any]:
    """GCP position residuals (stats.py:81-112)."""
    all_errors = []
    try:
        gcps = data.load_ground_control_points()
    except Exception:
        gcps = []
    if not gcps:
        return {}
    for gcp in gcps:
        if not gcp.lla:
            continue
        for rec in reconstructions:
            triangulated = multiview.triangulate_gcp(gcp, rec.shots)
            if triangulated is None:
                continue
            gcp_enu = np.asarray(rec.reference.to_topocentric(*gcp.lla_vec))
            all_errors.append(triangulated - gcp_enu)
            break
    return _gps_gcp_errors_stats(np.array(all_errors))


def _gps_gcp_errors_stats(errors: np.ndarray) -> Dict[str, Any]:
    if errors is None or len(errors) == 0:
        return {}
    stats_out: Dict[str, Any] = {}
    squared = errors * errors
    m_squared = np.mean(squared, 0)
    mean = np.mean(errors, 0)
    std_dev = np.std(errors, 0)
    average = np.average(np.linalg.norm(errors, axis=1))
    stats_out["mean"] = {"x": mean[0], "y": mean[1], "z": mean[2]}
    stats_out["std"] = {"x": std_dev[0], "y": std_dev[1], "z": std_dev[2]}
    stats_out["error"] = {
        "x": math.sqrt(m_squared[0]),
        "y": math.sqrt(m_squared[1]),
        "z": math.sqrt(m_squared[2]),
    }
    stats_out["average_error"] = average
    stats_out["ce90"] = _ce90(errors)
    stats_out["le90"] = _le90(errors)
    return stats_out


def _ce90(errors: np.ndarray) -> float:
    """90th percentile horizontal error."""
    horizontal = np.linalg.norm(errors[:, :2], axis=1)
    return float(np.percentile(horizontal, 90)) if len(horizontal) else 0.0


def _le90(errors: np.ndarray) -> float:
    """90th percentile vertical error."""
    vertical = np.abs(errors[:, 2])
    return float(np.percentile(vertical, 90)) if len(vertical) else 0.0


def td_grid_resolution(reconstruction: types.Reconstruction) -> float:
    return 0.0


def processing_statistics(
    data, reconstructions: List[types.Reconstruction]
) -> Dict[str, Any]:
    """Wall times of the pipeline stages from profile.log (stats.py:288)."""
    steps = {
        "extract_metadata": "Metadata extraction",
        "detect_features": "Features detection",
        "match_features": "Features matching",
        "create_tracks": "Tracks merging",
        "reconstruct": "Reconstruction",
    }
    steps_times = {}
    try:
        with open(os.path.join(data.data_path, "profile.log")) as f:
            for line in f:
                if ":" not in line:
                    continue
                name, t = line.split(":", 1)
                name = name.strip()
                if name in steps:
                    try:
                        steps_times[steps[name]] = float(t)
                    except ValueError:
                        pass
    except IOError:
        pass

    stats_out = {
        "steps_times": steps_times,
        "date": "unknown",
        "area": 0.0,
    }
    stats_out["steps_times"]["Total Time"] = sum(steps_times.values())
    return stats_out


def features_statistics(
    data, tracks_manager: pymap.TracksManager,
    reconstructions: List[types.Reconstruction],
) -> Dict[str, Any]:
    """Detected/reconstructed feature counts (stats.py:115-160)."""
    stats_out: Dict[str, Any] = {}
    detected = []
    images = {s for r in reconstructions for s in r.shots}
    for im in images:
        if data.features_exist(im):
            fd = data.load_features(im)
            if fd is not None:
                detected.append(len(fd.points))
    if detected:
        stats_out["detected_features"] = {
            "min": int(min(detected)),
            "max": int(max(detected)),
            "mean": int(np.mean(detected)),
            "median": int(np.median(detected)),
        }
    else:
        stats_out["detected_features"] = {
            "min": -1, "max": -1, "mean": -1, "median": -1
        }

    per_shots = defaultdict(int)
    for track_id in tracks_manager.get_track_ids():
        for shot_id in tracks_manager.get_track_observations(track_id):
            if shot_id in images:
                per_shots[shot_id] += 1
    per_shots_list = list(per_shots.values())
    if per_shots_list:
        stats_out["reconstructed_features"] = {
            "min": int(min(per_shots_list)),
            "max": int(max(per_shots_list)),
            "mean": int(np.mean(per_shots_list)),
            "median": int(np.median(per_shots_list)),
        }
    else:
        stats_out["reconstructed_features"] = {
            "min": -1, "max": -1, "mean": -1, "median": -1
        }
    return stats_out


def reconstruction_statistics(
    data, tracks_manager: pymap.TracksManager,
    reconstructions: List[types.Reconstruction],
) -> Dict[str, Any]:
    """Core quality numbers (stats.py:196-287)."""
    stats_out: Dict[str, Any] = {}
    stats_out["components"] = len(reconstructions)
    gps_count = sum(
        1
        for rec in reconstructions
        for shot in rec.shots.values()
        if shot.metadata.gps_position.has_value
    )
    stats_out["has_gps"] = gps_count > 2
    stats_out["has_gcp"] = bool(data.load_ground_control_points())

    stats_out["initial_points_count"] = tracks_manager.num_tracks()
    stats_out["initial_shots_count"] = len(data.images())

    stats_out["reconstructed_points_count"] = sum(
        len(r.points) for r in reconstructions
    )
    stats_out["reconstructed_shots_count"] = sum(
        len(r.shots) for r in reconstructions
    )

    hist_agg = np.zeros(30)
    length_histo: Dict[int, int] = defaultdict(int)
    all_errors_normalized = []
    all_errors_pixels = []
    for rec in reconstructions:
        from opensfm_tpu.reconstruction import compute_reprojection_errors

        # Reconstructions loaded from JSON carry no observations; re-attach
        # them from the tracks manager before computing residuals.
        if not any(
            s.get_landmark_observations() for s in rec.shots.values()
        ):
            rec.add_correspondences_from_tracks_manager(tracks_manager)
        compute_reprojection_errors(rec)
        for point in rec.points.values():
            length_histo[point.number_of_observations()] += 1
            for shot_id, error in point.reprojection_errors.items():
                norm = _norm2d(error)
                shot = rec.shots.get(shot_id)
                if shot is None:
                    continue
                size = max(shot.camera.width, shot.camera.height)
                pixel = norm * size
                if pixel < RESIDUAL_PIXEL_CUTOFF:
                    all_errors_normalized.append(norm)
                    all_errors_pixels.append(pixel)

    if all_errors_normalized:
        stats_out["reprojection_error_normalized"] = float(
            np.mean(all_errors_normalized)
        )
        stats_out["reprojection_error_pixels"] = float(np.mean(all_errors_pixels))
        stats_out["reprojection_histogram"] = list(
            map(float, np.histogram(all_errors_pixels, bins=30, range=(0, 4))[0])
        )
    else:
        stats_out["reprojection_error_normalized"] = -1.0
        stats_out["reprojection_error_pixels"] = -1.0

    stats_out["average_track_length"] = (
        float(
            np.mean(
                [
                    p.number_of_observations()
                    for r in reconstructions
                    for p in r.points.values()
                ]
            )
        )
        if stats_out["reconstructed_points_count"]
        else -1
    )
    stats_out["histogram_track_length"] = {
        str(k): v for k, v in sorted(length_histo.items())
    }
    return stats_out


def cameras_statistics(camera_models: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for camera_id, camera in camera_models.items():
        out[camera_id] = {
            "projection_type": camera.projection_type,
            "width": camera.width,
            "height": camera.height,
        }
        out[camera_id].update(
            {k: float(v) for k, v in camera.get_parameters_map().items()}
        )
    return out


def compute_all_statistics(
    data, tracks_manager: pymap.TracksManager,
    reconstructions: List[types.Reconstruction],
) -> Dict[str, Any]:
    """The stats.json payload (stats.py:455-499)."""
    stats_out: Dict[str, Any] = {}
    stats_out["processing_statistics"] = processing_statistics(data, reconstructions)
    stats_out["features_statistics"] = features_statistics(
        data, tracks_manager, reconstructions
    )
    stats_out["reconstruction_statistics"] = reconstruction_statistics(
        data, tracks_manager, reconstructions
    )
    stats_out["camera_errors"] = _camera_errors(data, reconstructions)
    stats_out["gps_errors"] = gps_errors(reconstructions)
    stats_out["gcp_errors"] = gcp_errors(data, reconstructions)
    return stats_out


def _camera_errors(data, reconstructions) -> Dict[str, Any]:
    """Initial vs optimized camera parameters (stats.py:430-452)."""
    out = {}
    try:
        initial = data.load_camera_models()
    except Exception:
        return {}
    for camera_id, camera_initial in initial.items():
        for rec in reconstructions:
            if camera_id in rec.cameras:
                optimized = rec.cameras[camera_id]
                out[camera_id] = {
                    "initial_values": {
                        k: float(v)
                        for k, v in camera_initial.get_parameters_map().items()
                    },
                    "optimized_values": {
                        k: float(v)
                        for k, v in optimized.get_parameters_map().items()
                    },
                }
                break
    return out


# ---------------------------------------------------------------------------
# Plots (matplotlib)
# ---------------------------------------------------------------------------


def save_matchgraph(
    data, tracks_manager, reconstructions, output_path: str, io_handler=None
) -> None:
    """Match-graph plot colored by common-track count (stats.py:501-566)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    all_shots = {
        s: r.shots[s].pose.get_origin()
        for r in reconstructions
        for s in r.shots
    }
    connectivity = tracks_manager.get_all_pairs_connectivity(
        list(all_shots.keys()), None
    )
    if not connectivity:
        return
    values = list(connectivity.values())
    lowest, highest = np.percentile(values, 5), np.percentile(values, 95)

    fig, ax = plt.subplots(figsize=(12, 12))
    cmap = plt.get_cmap("viridis")
    for (im1, im2), size in sorted(connectivity.items(), key=lambda x: x[1]):
        if im1 not in all_shots or im2 not in all_shots:
            continue
        o1, o2 = all_shots[im1], all_shots[im2]
        c = max(0.0, min(1.0, (size - lowest) / max(highest - lowest, 1)))
        ax.plot([o1[0], o2[0]], [o1[1], o2[1]], color=cmap(c), linewidth=0.7)
    positions = np.array(list(all_shots.values()))
    ax.scatter(positions[:, 0], positions[:, 1], s=6, c="red", zorder=3)
    ax.set_aspect("equal")
    ax.set_title("Match graph")
    fig.savefig(os.path.join(output_path, "matchgraph.png"), dpi=150)
    plt.close(fig)


def save_topview(
    data, tracks_manager, reconstructions, output_path: str, io_handler=None
) -> None:
    """Top view of points + camera positions (stats.py:622-793)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 12))
    for rec in reconstructions:
        if rec.points:
            pts = np.array([p.coordinates for p in rec.points.values()])
            colors = (
                np.array([p.color for p in rec.points.values()]) / 255.0
            ).clip(0, 1)
            ax.scatter(pts[:, 0], pts[:, 1], s=0.5, c=colors)
        origins = np.array(
            [s.pose.get_origin() for s in rec.shots.values()]
        )
        if len(origins):
            ax.scatter(origins[:, 0], origins[:, 1], s=12, c="red", zorder=3)
    ax.set_aspect("equal")
    ax.set_title("Top view")
    fig.savefig(os.path.join(output_path, "topview.png"), dpi=150)
    plt.close(fig)


def save_residual_histogram(stats, output_path: str, io_handler=None) -> None:
    """Reprojection residual histogram (stats.py:568-620)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    histogram = stats.get("reconstruction_statistics", {}).get(
        "reprojection_histogram"
    )
    if not histogram:
        return
    fig, ax = plt.subplots(figsize=(8, 5))
    edges = np.linspace(0, 4, len(histogram) + 1)[:-1]
    ax.bar(edges, histogram, width=4.0 / len(histogram), align="edge")
    ax.set_xlabel("Reprojection error (pixels)")
    ax.set_ylabel("Count")
    fig.savefig(os.path.join(output_path, "residual_histogram.png"), dpi=150)
    plt.close(fig)


def save_heatmap(
    data, tracks_manager, reconstructions, output_path: str, io_handler=None
) -> None:
    """Per-camera feature coverage heatmap (stats.py:795-889)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    points_per_camera = defaultdict(list)
    for rec in reconstructions:
        for shot in rec.shots.values():
            for obs in shot.get_landmark_observations().values():
                points_per_camera[shot.camera.id].append(obs.point)
    for camera_id, points in points_per_camera.items():
        points = np.array(points)
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.hist2d(points[:, 0], points[:, 1], bins=30)
        ax.invert_yaxis()
        ax.set_title(f"Feature heatmap: {camera_id}")
        safe_id = camera_id.replace("/", "_").replace(" ", "_")
        fig.savefig(
            os.path.join(output_path, f"heatmap_{safe_id}.png"), dpi=150
        )
        plt.close(fig)
