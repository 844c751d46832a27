"""Export a PDF report (reference actions/export_report.py)."""

from opensfm_tpu import report


def run_dataset(data) -> None:
    report.generate_report(data)
