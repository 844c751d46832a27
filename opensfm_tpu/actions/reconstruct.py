"""Incremental reconstruction (reference actions/reconstruct.py:6-25)."""

from __future__ import annotations

from opensfm_tpu import io, reconstruction


def run_dataset(data, algorithm: str = "incremental") -> None:
    tracks_manager = data.load_tracks_manager()
    if algorithm == "incremental":
        report, reconstructions = reconstruction.incremental_reconstruction(
            data, tracks_manager
        )
    elif algorithm == "triangulation":
        report, reconstructions = reconstruction.triangulation_reconstruction(
            data, tracks_manager
        )
    else:
        raise RuntimeError(f"Unsupported algorithm for reconstruction {algorithm}")
    data.save_reconstruction(reconstructions)
    data.save_report(io.json_dumps(report), "reconstruction.json")
