"""Reconstruction statistics + quality plots.

Mirrors reference `opensfm/stats.py` (compute_all_statistics:455,
reconstruction_statistics:196, processing_statistics:288, gps_errors:74,
gcp_errors:81, save_matchgraph:501, save_residual_histogram:568,
save_topview:622, save_heatmap:795).
"""

from __future__ import annotations

import datetime
import json
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
    # GCP reports keep the 90th-percentile circular/linear errors the
    # reference's PDF report quotes.
    return _gps_gcp_errors_stats(np.array(all_errors), percentiles=True)


def _gps_gcp_errors_stats(errors: np.ndarray, percentiles: bool = False
                          ) -> Dict[str, Any]:
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
    if percentiles:
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
    """Stage wall times from reports/, run date, covered area
    (stats.py:288-339)."""
    steps = {
        "Feature Extraction": "features.json",
        "Features Matching": "matches.json",
        "Tracks Merging": "tracks.json",
        "Reconstruction": "reconstruction.json",
    }

    steps_times = {}
    data_path = getattr(data, "data_path", None)
    for step_name, report_file in steps.items():
        obj: Dict[str, Any] = {}
        if data_path is not None:
            file_path = os.path.join(data_path, "reports", report_file)
            if os.path.exists(file_path):
                with open(file_path) as fin:
                    obj = json.load(fin)
        if "wall_time" in obj:
            steps_times[step_name] = obj["wall_time"]
        elif "wall_times" in obj:
            steps_times[step_name] = sum(obj["wall_times"].values())
        else:
            steps_times[step_name] = -1

    stats_out: Dict[str, Any] = {"steps_times": steps_times}
    stats_out["steps_times"]["Total Time"] = sum(
        t for t in steps_times.values() if t >= 0
    )

    stats_out["date"] = "unknown"
    if data_path is not None:
        rec_file = os.path.join(data_path, "reconstruction.json")
        if os.path.exists(rec_file):
            stats_out["date"] = datetime.datetime.fromtimestamp(
                os.path.getmtime(rec_file)
            ).strftime("%d/%m/%Y at %H:%M:%S")

    default_max = 1e30
    min_x, min_y, max_x, max_y = default_max, default_max, 0.0, 0.0
    for rec in reconstructions:
        for shot in rec.shots.values():
            o = shot.pose.get_origin()
            min_x = min(min_x, o[0])
            min_y = min(min_y, o[1])
            max_x = max(max_x, o[0])
            max_y = max(max_y, o[1])
    stats_out["area"] = (
        (max_x - min_x) * (max_y - min_y) if min_x != default_max else -1
    )
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

    stats_out["observations_count"] = int(
        sum(k * v for k, v in length_histo.items())
    )

    if all_errors_normalized:
        stats_out["reprojection_error_normalized"] = float(
            np.mean(all_errors_normalized)
        )
        stats_out["reprojection_error_pixels"] = float(np.mean(all_errors_pixels))
        hist_n, bins_n = np.histogram(all_errors_normalized, bins=30)
        hist_p, bins_p = np.histogram(all_errors_pixels, bins=30)
        stats_out["reprojection_histogram_normalized"] = (
            list(map(int, hist_n)), list(map(float, bins_n)),
        )
        stats_out["reprojection_histogram_pixels"] = (
            list(map(int, hist_p)), list(map(float, bins_p)),
        )
    else:
        stats_out["reprojection_error_normalized"] = -1.0
        stats_out["reprojection_error_pixels"] = -1.0
        stats_out["reprojection_histogram_normalized"] = ([], [])
        stats_out["reprojection_histogram_pixels"] = ([], [])

    track_lengths = [
        p.number_of_observations()
        for r in reconstructions
        for p in r.points.values()
    ]
    if stats_out["reconstructed_points_count"]:
        stats_out["average_track_length"] = float(np.mean(track_lengths))
        over_two = [t for t in track_lengths if t > 2]
        stats_out["average_track_length_over_two"] = (
            float(np.mean(over_two)) if over_two else -1
        )
    else:
        stats_out["average_track_length"] = -1
        stats_out["average_track_length_over_two"] = -1
    stats_out["histogram_track_length"] = {
        str(k): v for k, v in sorted(length_histo.items())
    }
    return stats_out


def _camera_params(camera) -> Dict[str, Any]:
    """Parameter name -> value map (stats.py:386-390)."""
    return {k: float(v) for k, v in camera.get_parameters_map().items()}


def cameras_statistics(data, reconstructions) -> Dict[str, Any]:
    """Initial vs optimized camera parameters + per-camera GPS bias
    (stats.py:393-415)."""
    from opensfm_tpu import io as osfm_io

    out: Dict[str, Any] = {}
    permutation = np.argsort([-len(r.shots) for r in reconstructions])
    for camera_id, camera_model in data.load_camera_models().items():
        out[camera_id] = {"initial_values": _camera_params(camera_model)}

    for idx in permutation:
        rec = reconstructions[idx]
        for camera in rec.cameras.values():
            if camera.id not in out or "optimized_values" in out[camera.id]:
                continue
            out[camera.id]["optimized_values"] = _camera_params(camera)
            out[camera.id]["bias"] = osfm_io.bias_to_json(
                rec.biases[camera.id]
            )

    for camera_id in list(out):
        if "optimized_values" not in out[camera_id]:
            del out[camera_id]
    return out


def rig_statistics(data, reconstructions) -> Dict[str, Any]:
    """Initial vs optimized rig camera poses (stats.py:418-452); per-camera
    (leverarm) rig cameras are skipped."""
    out: Dict[str, Any] = {}
    permutation = np.argsort([-len(r.shots) for r in reconstructions])
    rig_cameras = data.load_rig_cameras()
    cameras = data.load_camera_models()
    for rig_camera_id, rig_camera in rig_cameras.items():
        if rig_camera_id in cameras:
            continue
        out[rig_camera_id] = {
            "initial_values": {
                "rotation": list(rig_camera.pose.rotation),
                "translation": list(rig_camera.pose.translation),
            }
        }

    for idx in permutation:
        rec = reconstructions[idx]
        for rig_camera in rec.rig_cameras.values():
            if rig_camera.id not in out or "optimized_values" in out[rig_camera.id]:
                continue
            out[rig_camera.id]["optimized_values"] = {
                "rotation": list(rig_camera.pose.rotation),
                "translation": list(rig_camera.pose.translation),
            }

    for rig_camera_id in list(out):
        if "optimized_values" not in out[rig_camera_id]:
            del out[rig_camera_id]
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
    stats_out["camera_errors"] = cameras_statistics(data, reconstructions)
    stats_out["rig_errors"] = rig_statistics(data, reconstructions)
    stats_out["gps_errors"] = gps_errors(reconstructions)
    stats_out["gcp_errors"] = gcp_errors(data, reconstructions)
    return stats_out




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


def _grid_buckets(camera) -> Tuple[int, int]:
    """Residual-grid bucket counts (reference stats.py:477-482)."""
    buckets = 40
    if camera.projection_type == "spherical":
        return 2 * buckets, buckets
    return buckets, buckets


def save_residual_grids(
    data, tracks_manager, reconstructions, output_path: str, io_handler=None
) -> None:
    """Per-camera residual vector-field plots (reference stats.py:891-1000):
    normalized reprojection residuals binned on a 40x40 grid over the image
    plane, drawn as a quiver field colored by magnitude — the lens-model
    health check (systematic radial patterns = distortion misfit)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import colors as mcolors

    from opensfm_tpu.reconstruction import compute_reprojection_errors

    scaling = 4
    all_errors: Dict[str, list] = {}
    cameras: Dict[str, Any] = {}
    for rec in reconstructions:
        for camera_id, cam in rec.cameras.items():
            all_errors.setdefault(camera_id, [])
            cameras[camera_id] = cam

    for rec in reconstructions:
        if not any(s.get_landmark_observations() for s in rec.shots.values()):
            rec.add_correspondences_from_tracks_manager(tracks_manager)
        compute_reprojection_errors(rec)
        for point in rec.points.values():
            for shot_id, error in point.reprojection_errors.items():
                shot = rec.shots.get(shot_id)
                if shot is None:
                    continue
                obs = shot.get_observation(point.id)
                if obs is None:
                    continue
                cam = shot.camera
                w, h = cam.width, cam.height
                normalizer = max(w, h)
                if _norm2d(np.asarray(error)) * normalizer > RESIDUAL_PIXEL_CUTOFF:
                    continue
                buckets_x, buckets_y = _grid_buckets(cam)
                center = np.array([w / 2.0, h / 2.0])
                bucket = np.asarray(obs.point) * normalizer + center
                x = int(np.clip(bucket[0] * buckets_x / w, 0, buckets_x - 1))
                y = int(np.clip(bucket[1] * buckets_y / h, 0, buckets_y - 1))
                all_errors[cam.id].append((x, y, np.asarray(error)))

    for camera_id, errors in all_errors.items():
        if not errors:
            continue
        cam = cameras[camera_id]
        buckets_x, buckets_y = _grid_buckets(cam)
        grid_res = np.zeros((buckets_y, buckets_x, 2))
        grid_count = np.full((buckets_y, buckets_x, 1), 1)
        for x, y, e in errors:
            grid_res[y, x] += e[:2]
            grid_count[y, x, 0] += 1
        grid_res = grid_res / grid_count

        clamp = 0.1
        res_colors = np.linalg.norm(grid_res, axis=2)
        lowest = np.percentile(res_colors, 0)
        highest = np.percentile(res_colors, 100 * (1 - clamp))
        res_colors = np.clip(res_colors, lowest, highest)
        scale = max(highest - lowest, 1e-12)
        res_colors = res_colors / scale

        plt.clf()
        fig = plt.figure(figsize=(12, 10))
        Q = plt.quiver(
            grid_res[:, :, 0] * scaling,
            grid_res[:, :, 1] * scaling,
            res_colors,
            units="xy", angles="xy", scale_units="xy", scale=1, width=0.1,
            cmap="viridis_r",
        )
        plt.quiverkey(
            Q, X=0.1, Y=1.04, U=scale * scaling,
            label=f"Residual grid scale : {scale:.2f}", labelpos="E",
        )
        norm = mcolors.Normalize(vmin=lowest, vmax=highest)
        sm = plt.cm.ScalarMappable(norm=norm, cmap=plt.get_cmap("viridis_r"))
        sm.set_array([])
        plt.colorbar(sm, ax=plt.gca())
        plt.gca().invert_yaxis()
        plt.title(f"Residual grid: {camera_id}")
        safe_id = camera_id.replace("/", "_").replace(" ", "_")
        fig.savefig(
            os.path.join(output_path, f"residuals_{safe_id}.png"), dpi=150,
            bbox_inches="tight",
        )
        plt.close(fig)
