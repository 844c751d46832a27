"""Align submodel reconstructions (reference actions/align_submodels.py:6-14)."""

from opensfm_tpu.large import tools
from opensfm_tpu.large.metadataset import MetaDataSet


def run_dataset(data) -> None:
    meta_data = MetaDataSet(data.data_path)
    reconstruction_shots = tools.load_reconstruction_shots(meta_data)
    transformations = tools.align_reconstructions(
        reconstruction_shots, tools.partial_reconstruction_name, True
    )
    tools.apply_transformations(transformations)
