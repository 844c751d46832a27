"""PDF quality report.

Mirrors reference `opensfm/report.py:16-502` using matplotlib's PdfPages
(fpdf is not available in this environment).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict

logger = logging.getLogger(__name__)


def generate_report(data) -> None:
    """Assemble stats + plots into report.pdf (report.py:16-502)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    stats_path = os.path.join(data.data_path, "stats")
    stats_file = os.path.join(stats_path, "stats.json")
    if not os.path.isfile(stats_file):
        from opensfm_tpu.actions import compute_statistics

        compute_statistics.run_dataset(data)
    with open(stats_file) as f:
        stats = json.load(f)

    out_file = os.path.join(stats_path, "report.pdf")
    with PdfPages(out_file) as pdf:
        # Page 1: summary text.
        fig, ax = plt.subplots(figsize=(8.27, 11.69))
        ax.axis("off")
        lines = ["OpenSfM-TPU Quality Report", ""]
        rs = stats.get("reconstruction_statistics", {})
        lines += [
            f"Components: {rs.get('components')}",
            f"Reconstructed shots: {rs.get('reconstructed_shots_count')} / "
            f"{rs.get('initial_shots_count')}",
            f"Reconstructed points: {rs.get('reconstructed_points_count')} / "
            f"{rs.get('initial_points_count')}",
            f"Mean reprojection error: "
            f"{rs.get('reprojection_error_pixels', -1):.2f} px",
            f"Average track length: {rs.get('average_track_length', -1):.2f}",
            "",
        ]
        ps = stats.get("processing_statistics", {}).get("steps_times", {})
        lines += ["Processing times:"] + [
            f"  {k}: {v:.1f}s" for k, v in ps.items()
        ]
        ge = stats.get("gps_errors", {})
        if ge:
            lines += [
                "",
                f"GPS average error: {ge.get('average_error', 0):.2f} m "
                f"(CE90 {ge.get('ce90', 0):.2f}, LE90 {ge.get('le90', 0):.2f})",
            ]
        gc = stats.get("gcp_errors", {})
        if gc:
            lines += [
                f"GCP average error: {gc.get('average_error', 0):.2f} m",
            ]
        ax.text(0.05, 0.95, "\n".join(map(str, lines)), va="top", family="monospace")
        pdf.savefig(fig)
        plt.close(fig)

        # Plot pages.
        for name in ("topview.png", "matchgraph.png", "residual_histogram.png"):
            path = os.path.join(stats_path, name)
            if os.path.isfile(path):
                img = plt.imread(path)
                fig, ax = plt.subplots(figsize=(8.27, 11.69))
                ax.imshow(img)
                ax.axis("off")
                ax.set_title(name.split(".")[0])
                pdf.savefig(fig)
                plt.close(fig)
        for name in sorted(os.listdir(stats_path)):
            if name.startswith("heatmap_") and name.endswith(".png"):
                img = plt.imread(os.path.join(stats_path, name))
                fig, ax = plt.subplots(figsize=(8.27, 11.69))
                ax.imshow(img)
                ax.axis("off")
                pdf.savefig(fig)
                plt.close(fig)
    logger.info("Report written to %s", out_file)
