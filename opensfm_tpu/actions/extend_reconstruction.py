"""Extend a reconstruction with remaining images
(reference actions/extend_reconstruction.py:8-34)."""

from opensfm_tpu import io, reconstruction as orec


def run_dataset(data, input=None, output=None) -> None:
    tracks_manager = data.load_tracks_manager()
    prior_recs = data.load_reconstruction(input)
    gcp = data.load_ground_control_points()
    if not prior_recs:
        return
    rec = prior_recs[0]
    images = set(tracks_manager.get_shot_ids()) - set(rec.shots)
    rec, report = orec.grow_reconstruction(data, tracks_manager, rec, images, gcp)
    data.save_reconstruction([rec], output)
    data.save_report(io.json_dumps(report), "reconstruction.json")
