"""Compute dense depthmaps (reference actions/compute_depthmaps.py)."""

from opensfm_tpu import dense
from opensfm_tpu.dataset import UndistortedDataSet


def run_dataset(data, subfolder: str = "undistorted", interactive: bool = False) -> None:
    udata_path = data.data_path + "/" + subfolder
    udata = UndistortedDataSet(data, udata_path)
    data.config["interactive"] = interactive
    reconstructions = udata.load_undistorted_reconstruction()
    tracks_manager = udata.load_undistorted_tracks_manager()
    dense.compute_depthmaps(udata, udata, tracks_manager)
