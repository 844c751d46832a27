"""Real-data smoke test over data/berlin.

Mirrors reference opensfm/test/test_commands.py:18-66 (test_run_all): run
the pipeline end-to-end on the 3 berlin images and assert 3 shots and
> 1000 points.
"""

import os

import numpy as np
import pytest

BERLIN = "/root/reference/data/berlin"


@pytest.fixture(scope="module")
def berlin_dataset(tmp_path_factory):
    from opensfm_tpu.dataset import DataSet

    root = tmp_path_factory.mktemp("berlin")
    os.symlink(os.path.join(BERLIN, "images"), root / "images")
    with open(os.path.join(BERLIN, "config.yaml")) as f:
        (root / "config.yaml").write_text(f.read())
    gcp = os.path.join(BERLIN, "ground_control_points.json")
    if os.path.isfile(gcp):
        with open(gcp) as f:
            (root / "ground_control_points.json").write_text(f.read())
    return DataSet(str(root))


@pytest.mark.skipif(not os.path.isdir(BERLIN), reason="berlin data missing")
def test_run_all_berlin(berlin_dataset):
    from opensfm_tpu.actions import (
        create_tracks,
        detect_features,
        export_ply,
        extract_metadata,
        match_features,
        reconstruct,
    )

    data = berlin_dataset
    extract_metadata.run_dataset(data)
    assert len(data.load_camera_models()) == 1

    detect_features.run_dataset(data)
    for image in data.images():
        assert data.features_exist(image)
        assert len(data.load_features(image).points) > 1000

    match_features.run_dataset(data)
    create_tracks.run_dataset(data)
    tm = data.load_tracks_manager()
    assert tm.num_shots() == 3
    assert tm.num_tracks() > 500

    reconstruct.run_dataset(data)
    reconstructions = data.load_reconstruction()
    assert len(reconstructions) == 1
    assert len(reconstructions[0].shots) == 3
    assert len(reconstructions[0].points) > 1000

    export_ply.run_dataset(data)
    ply = (data.data_path + "/reconstruction.ply")
    assert os.path.isfile(ply)
    with open(ply) as f:
        assert f.readline().strip() == "ply"


@pytest.mark.skipif(not os.path.isdir(BERLIN), reason="berlin data missing")
def test_exif_extraction(berlin_dataset):
    data = berlin_dataset
    d = data.extract_exif("01.jpg")
    assert d["width"] == 3264
    assert d["height"] == 2448
    assert d["camera"] == "v2 unknown unknown 3264 2448 perspective 0.9722"
    assert abs(d["gps"]["latitude"] - 52.519) < 0.01
    assert abs(d["gps"]["longitude"] - 13.40) < 0.01
    assert d["gps"]["dop"] == 5.0
    assert abs(d["focal_ratio"] - 35.0 / 36.0) < 1e-6
