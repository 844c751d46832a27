"""Detect features for all images (reference actions/detect_features.py)."""

from opensfm_tpu import features_processing


def run_dataset(data) -> None:
    features_processing.run_features_processing(data, data.images(), force=False)
