"""Compute statistics + plots (reference actions/compute_statistics.py)."""

import logging
import os

from opensfm_tpu import io, stats

logger = logging.getLogger(__name__)


def run_dataset(data, diagram_max_points: int = -1) -> None:
    reconstructions = data.load_reconstruction()
    tracks_manager = data.load_tracks_manager()
    output_path = os.path.join(data.data_path, "stats")
    os.makedirs(output_path, exist_ok=True)

    stats_dict = stats.compute_all_statistics(data, tracks_manager, reconstructions)
    with open(os.path.join(output_path, "stats.json"), "w") as f:
        io.json_dump(stats_dict, f)

    try:
        stats.save_residual_histogram(stats_dict, output_path)
        stats.save_matchgraph(data, tracks_manager, reconstructions, output_path)
        stats.save_topview(data, tracks_manager, reconstructions, output_path)
        stats.save_heatmap(data, tracks_manager, reconstructions, output_path)
        stats.save_residual_grids(
            data, tracks_manager, reconstructions, output_path
        )
    except Exception as e:
        logger.warning("Plot generation failed: %s", e)
    logger.info("Statistics written to %s", output_path)
