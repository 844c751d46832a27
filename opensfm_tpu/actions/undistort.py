"""Undistort images + reconstruction (reference actions/undistort.py)."""

from opensfm_tpu import undistort as undistort_mod
from opensfm_tpu.dataset import UndistortedDataSet


def run_dataset(data, reconstruction=None, reconstruction_index=0,
                tracks=None, output="undistorted", skip_images=False) -> None:
    undistorted_data_path = data.data_path + "/" + output
    udata = UndistortedDataSet(data, undistorted_data_path)
    reconstructions = data.load_reconstruction(reconstruction)
    if data.tracks_exists(tracks):
        tracks_manager = data.load_tracks_manager(tracks)
    else:
        tracks_manager = None
    if reconstructions:
        r = reconstructions[reconstruction_index]
        undistort_mod.undistort_reconstruction_with_images(
            tracks_manager, r, data, udata, skip_images
        )
