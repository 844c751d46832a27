"""Multi-page PDF quality report.

Mirrors reference `opensfm/report.py:16-502` section by section — title,
dataset summary, processing summary (+ topview), processing-time details,
GPS/GCP details, feature details, reconstruction details, camera-model
details (+ residual grids), rig details, tracks details (+ matchgraph,
heatmaps) — rendered with matplotlib's PdfPages (fpdf is not available in
this environment; the section content and table rows match the reference).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


class Report:
    """Section-by-section report builder (reference report.py:17-502)."""

    PAGE = (8.27, 11.69)  # A4 portrait, inches

    def __init__(self, data, stats: Optional[Dict[str, Any]] = None) -> None:
        import matplotlib

        matplotlib.use("Agg")

        self.data = data
        self.dataset_name = os.path.basename(os.path.normpath(data.data_path))
        self.output_path = os.path.join(data.data_path, "stats")
        if stats is not None:
            self.stats = stats
        else:
            self.stats = self._read_stats_file("stats.json")
        self._pages: List = []
        self._fig = None
        self._y = 0.0

    # -- low-level page/drawing helpers -------------------------------------
    def _new_page(self):
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=self.PAGE)
        self._pages.append(fig)
        self._fig = fig
        self._y = 0.96
        return fig

    def add_page_break(self) -> None:
        self._new_page()

    def _ensure_room(self, height: float) -> None:
        if self._fig is None or self._y - height < 0.03:
            self._new_page()

    def _text(self, s: str, size=10, weight="normal", color="0.15",
              height=0.022) -> None:
        self._ensure_room(height)
        self._fig.text(0.07, self._y, s, fontsize=size, fontweight=weight,
                       color=color, va="top", family="sans-serif")
        self._y -= height

    def _make_section(self, title: str) -> None:
        self._y -= 0.01
        self._text(title, size=14, weight="bold", color="#104f30",
                   height=0.035)

    def _make_subsection(self, title: str) -> None:
        self._text(title, size=11, weight="bold", color="0.3", height=0.028)

    def _make_table(self, columns_names, rows, row_header=False) -> None:
        n_rows = len(rows) + (1 if columns_names else 0)
        height = 0.026 * n_rows + 0.01
        self._ensure_room(height)
        ax = self._fig.add_axes(
            [0.07, self._y - height, 0.86, height]
        )
        ax.axis("off")
        table = ax.table(
            cellText=[[str(c) for c in row] for row in rows],
            colLabels=columns_names,
            loc="upper left", cellLoc="left",
        )
        table.auto_set_font_size(False)
        table.set_fontsize(9)
        table.scale(1.0, 1.3)
        for (r, c), cell in table.get_celld().items():
            cell.set_edgecolor("0.85")
            if columns_names and r == 0:
                cell.set_text_props(fontweight="bold")
                cell.set_facecolor("#e8f0ea")
            elif row_header and c == 0:
                cell.set_text_props(fontweight="bold")
        self._y -= height + 0.015

    def _make_centered_image(self, image_path: str, desired_height: float) -> None:
        """desired_height in the reference's mm units (page = 297 mm)."""
        import matplotlib.pyplot as plt

        if not os.path.isfile(image_path):
            return
        frac = min(desired_height / 297.0, 0.75)
        self._ensure_room(frac + 0.02)
        img = plt.imread(image_path)
        ax = self._fig.add_axes([0.12, self._y - frac, 0.76, frac])
        ax.imshow(img)
        ax.axis("off")
        self._y -= frac + 0.02

    def _read_stats_file(self, filename: str) -> Dict[str, Any]:
        path = os.path.join(self.output_path, filename)
        if not os.path.isfile(path):
            from opensfm_tpu.actions import compute_statistics

            compute_statistics.run_dataset(self.data)
        with open(path) as f:
            return json.load(f)

    # -- sections (reference report.py order) --------------------------------
    def make_title(self) -> None:
        self._new_page()
        self._fig.text(0.5, 0.95, "OpenSfM Quality Report", fontsize=20,
                       fontweight="bold", color="#104f30", ha="center")
        self._fig.text(
            0.93, 0.91, "Processed with OpenSfM-TPU", fontsize=8,
            color="0.4", ha="right",
        )
        self._y = 0.87

    def make_dataset_summary(self) -> None:
        self._make_section("Dataset Summary")
        ps = self.stats.get("processing_statistics", {})
        rows = [
            ["Dataset", self.dataset_name],
            ["Date", ps.get("date", "unknown")],
            ["Area Covered", f"{ps.get('area', 0) / 1e6:.6f} km²"],
            [
                "Processing Time",
                f"{ps.get('steps_times', {}).get('Total Time', 0):.2f} seconds",
            ],
        ]
        self._make_table(None, rows, True)

    def _has_meaningful_gcp(self) -> bool:
        return bool(
            self.stats.get("reconstruction_statistics", {}).get("has_gcp")
            and "average_error" in self.stats.get("gcp_errors", {})
        )

    def make_processing_summary(self) -> None:
        self._make_section("Processing Summary")
        rs = self.stats.get("reconstruction_statistics", {})
        fs = self.stats.get("features_statistics", {})
        rec_shots = rs.get("reconstructed_shots_count", 0)
        init_shots = rs.get("initial_shots_count", 0)
        rec_points = rs.get("reconstructed_points_count", 0)
        init_points = max(rs.get("initial_points_count", 0), 1)
        geo_string = []
        if rs.get("has_gps"):
            geo_string.append("GPS")
        if self._has_meaningful_gcp():
            geo_string.append("GCP")
        ratio_shots = rec_shots / init_shots * 100 if init_shots > 0 else -1
        rows = [
            ["Reconstructed Images",
             f"{rec_shots} over {init_shots} shots ({ratio_shots:.1f}%)"],
            ["Reconstructed Points",
             f"{rec_points} over {init_points} points "
             f"({rec_points / init_points * 100:.1f}%)"],
            ["Reconstructed Components",
             f"{rs.get('components', 1)} component"],
            ["Detected Features",
             f"{fs.get('detected_features', {}).get('median', -1)} features"],
            ["Reconstructed Features",
             f"{fs.get('reconstructed_features', {}).get('median', -1)} features"],
            ["Geographic Reference", " and ".join(geo_string)],
        ]
        geo_errors = []
        if rs.get("has_gps") and "average_error" in self.stats.get("gps_errors", {}):
            geo_errors.append(f"{self.stats['gps_errors']['average_error']:.2f}")
        if self._has_meaningful_gcp():
            geo_errors.append(f"{self.stats['gcp_errors']['average_error']:.2f}")
        rows.append(
            [" / ".join(geo_string) + " errors",
             " / ".join(geo_errors) + " meters" if geo_errors else "-"]
        )
        self._make_table(None, rows, True)
        self._make_centered_image(
            os.path.join(self.output_path, "topview.png"), 130
        )

    def make_processing_time_details(self) -> None:
        self._make_section("Processing Time Details")
        steps = self.stats.get("processing_statistics", {}).get("steps_times", {})
        if steps:
            names = list(steps.keys())
            values = [f"{v:.2f} sec." for v in steps.values()]
            self._make_table(names, [values])

    def make_gps_details(self) -> None:
        self._make_section("GPS/GCP Errors Details")
        for error_type, title in (("gps", "GPS"), ("gcp", "GCP")):
            errors = self.stats.get(f"{error_type}_errors", {})
            if not errors or "mean" not in errors:
                continue
            self._make_subsection(f"{title} Errors")
            rows = []
            names = ["", "Mean", "Sigma", "RMS Error"]
            for comp in ("x", "y", "z"):
                rows.append([
                    comp.upper(),
                    f"{errors['mean'].get(comp, 0):.3f}",
                    f"{errors['std'].get(comp, 0):.3f}",
                    f"{errors['error'].get(comp, 0):.3f}",
                ])
            self._make_table(names, rows)
            if "ce90" in errors:
                rows = [[
                    f"{errors.get('average_error', 0):.3f} m",
                    f"{errors.get('ce90', 0):.3f} m",
                    f"{errors.get('le90', 0):.3f} m",
                ]]
                self._make_table(
                    ["Average Error", "CE90", "LE90"], rows
                )

    def make_features_details(self) -> None:
        self._make_section("Features Details")
        fs = self.stats.get("features_statistics", {})
        heatmaps = sorted(
            f for f in os.listdir(self.output_path)
            if f.startswith("heatmap_") and f.endswith(".png")
        ) if os.path.isdir(self.output_path) else []
        if fs:
            rows = []
            for name, key in (("Detected Features", "detected_features"),
                              ("Reconstructed Features", "reconstructed_features")):
                d = fs.get(key, {})
                rows.append([
                    name,
                    str(d.get("min", -1)), str(d.get("max", -1)),
                    f"{d.get('mean', -1):.0f}", str(d.get("median", -1)),
                ])
            self._make_table(["", "Min", "Max", "Mean", "Median"], rows)
        for name in heatmaps[:4]:
            self._make_centered_image(
                os.path.join(self.output_path, name), 110
            )

    def make_reconstruction_details(self) -> None:
        self._make_section("Reconstruction Details")
        rs = self.stats.get("reconstruction_statistics", {})
        rows = [
            ["Average Reprojection Error (normalized / pixels / angular)",
             f"{rs.get('reprojection_error_normalized', -1):.4f} / "
             f"{rs.get('reprojection_error_pixels', -1):.2f} px / "
             f"{rs.get('reprojection_error_angular', -1):.5f}"],
            ["Average Track Length",
             f"{rs.get('average_track_length', -1):.2f} images"],
            ["Average Track Length (> 2)",
             f"{rs.get('average_track_length_over_two', -1):.2f} images"],
        ]
        self._make_table(None, rows, True)
        self._make_centered_image(
            os.path.join(self.output_path, "residual_histogram.png"), 110
        )

    def make_camera_models_details(self) -> None:
        self._make_section("Camera Models Details")
        cs = self.stats.get("camera_errors", {})
        for camera, errors in cs.items():
            self._make_subsection(camera)
            names = list(errors.get("initial_values", {}).keys())
            rows = []
            for key in ("initial_values", "optimized_values"):
                d = errors.get(key, {})
                rows.append([f"{d.get(n, 0):.4f}" for n in names])
            if names:
                self._make_table(names, rows)
        grids = sorted(
            f for f in os.listdir(self.output_path)
            if f.startswith("residuals_") and f.endswith(".png")
        ) if os.path.isdir(self.output_path) else []
        for name in grids:
            self._make_centered_image(
                os.path.join(self.output_path, name), 120
            )

    def make_rig_cameras_details(self) -> None:
        rigs = self.stats.get("rig_errors", {})
        if not rigs:
            return
        self._make_section("Rig Cameras Details")
        for rig_camera_id, errors in rigs.items():
            self._make_subsection(rig_camera_id)
            for key, title in (("initial_values", "Initial"),
                               ("optimized_values", "Optimized")):
                d = errors.get(key)
                if not d:
                    continue
                rows = [[
                    title,
                    str([round(v, 4) for v in d.get("rotation", [])]),
                    str([round(v, 4) for v in d.get("translation", [])]),
                ]]
                self._make_table(["", "Rotation", "Translation"], rows)

    def make_tracks_details(self) -> None:
        self._make_section("Tracks Details")
        rs = self.stats.get("reconstruction_statistics", {})
        histo = rs.get("histogram_track_length", {})
        if histo:
            lengths = sorted(histo.keys(), key=lambda x: int(x))[:10]
            self._make_table(
                ["Length"] + [str(l) for l in lengths],
                [["Count"] + [str(histo[l]) for l in lengths]],
            )
        self._make_centered_image(
            os.path.join(self.output_path, "matchgraph.png"), 110
        )

    def generate_report(self) -> None:
        self.make_title()
        self.make_dataset_summary()
        self.make_processing_summary()
        self.add_page_break()
        self.make_features_details()
        self.make_reconstruction_details()
        self.add_page_break()
        self.make_tracks_details()
        self.make_camera_models_details()
        self.make_rig_cameras_details()
        self.add_page_break()
        self.make_processing_time_details()
        self.make_gps_details()

    def save_report(self, filename: str = "report.pdf") -> None:
        import matplotlib.pyplot as plt
        from matplotlib.backends.backend_pdf import PdfPages

        out_file = os.path.join(self.output_path, filename)
        with PdfPages(out_file) as pdf:
            for fig in self._pages:
                pdf.savefig(fig)
                plt.close(fig)
        self._pages = []
        logger.info("Report written to %s", out_file)


def generate_report(data) -> None:
    """Entry point used by export_report (reference actions/export_report)."""
    report = Report(data)
    report.generate_report()
    report.save_report("report.pdf")
