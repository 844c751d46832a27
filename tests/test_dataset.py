"""DataSet feature IO — mirrors reference test_dataset.py (berlin folder)."""

import shutil

import numpy as np
import pytest

from opensfm_tpu import features
from opensfm_tpu.dataset import DataSet

BERLIN = "/root/reference/data/berlin"


def create_berlin_test_folder(tmp_path):
    path = tmp_path / "berlin"
    path.mkdir()
    shutil.copytree(BERLIN + "/images", path / "images")
    shutil.copy(BERLIN + "/config.yaml", path / "config.yaml")
    return DataSet(str(path))


def test_dataset_load_features_sift(tmp_path):
    data = create_berlin_test_folder(tmp_path)
    assert len(data.images()) == 3

    data.config["feature_type"] = "SIFT"
    image = data.images()[0]
    points = np.random.random((3, 4))
    descriptors = np.random.random((128, 4))
    colors = np.random.random((3, 4))
    segmentations = np.random.randint(low=0, high=255, size=(3, 4))
    instances = np.random.randint(low=0, high=255, size=(3, 4))

    semantic_data = features.SemanticData(
        segmentations, instances, data.segmentation_labels()
    )
    before = features.FeaturesData(points, descriptors, colors, semantic_data)
    data.save_features(image, before)
    after = data.load_features(image)
    assert after
    assert np.allclose(points, after.points)
    assert np.allclose(descriptors, after.descriptors)
    assert np.allclose(colors, after.colors)
    semantic = after.semantic
    assert semantic
    assert np.allclose(segmentations, semantic.segmentation)
    assert np.allclose(instances, semantic.instances)
