"""Reconstruct starting from a prior model
(reference actions/reconstruct_from_prior.py)."""

from opensfm_tpu import io, reconstruction as orec


def run_dataset(data, input="reconstruction.json", output="reconstruction.prior.json") -> None:
    tracks_manager = data.load_tracks_manager()
    rec_prior = data.load_reconstruction(input)
    if rec_prior:
        report, rec = orec.reconstruct_from_prior(data, tracks_manager, rec_prior[0])
        data.save_reconstruction([rec], output)
        data.save_report(io.json_dumps(report), "reconstruction.json")
