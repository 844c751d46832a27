"""Statistics tests — mirrors reference test_stats.py.

RNG-dependent values (feature counts) are asserted as structure + plausible
ranges; deterministic behaviors (null scenes, sentinel -1s, key sets) match
the reference exactly."""

import numpy as np
import pytest

from opensfm_tpu import geo, stats, types
from opensfm_tpu.synthetic_data import (
    synthetic_dataset,
    synthetic_examples,
    synthetic_scene,
)


@pytest.fixture(scope="module")
def scene_synthetic():
    np.random.seed(42)
    reference = geo.TopocentricConverter(47.0, 6.0, 0)
    data = synthetic_examples.synthetic_circle_scene(reference)
    return synthetic_scene.SyntheticInputData(
        data.get_reconstruction(), reference, 40, 1.0, 5.0, 0.1,
        (0.01, 0.1), False, 10, [10.0, 0.0, 100.0],
    )


@pytest.fixture(scope="module")
def null_scene():
    return types.Reconstruction()


def make_dataset(scene, rec):
    return synthetic_dataset.SyntheticDataSet(
        rec, scene.exifs, scene.features, scene.tracks_manager
    )


def test_processing_statistics_normal(scene_synthetic):
    reference = scene_synthetic.reconstruction
    dataset = make_dataset(scene_synthetic, reference)
    ps = stats.processing_statistics(dataset, [reference])
    assert list(ps.keys()) == ["steps_times", "date", "area"]
    assert ps["steps_times"] == {
        "Feature Extraction": -1,
        "Features Matching": -1,
        "Tracks Merging": -1,
        "Reconstruction": -1,
        "Total Time": 0,
    }
    assert ps["date"] == "unknown"
    assert 3000 < ps["area"] < 4500


def test_processing_statistics_null(scene_synthetic, null_scene):
    dataset = make_dataset(scene_synthetic, null_scene)
    ps = stats.processing_statistics(dataset, [null_scene])
    assert ps["date"] == "unknown"
    assert ps["area"] == -1


def test_features_statistics_normal(scene_synthetic):
    reference = scene_synthetic.reconstruction
    dataset = make_dataset(scene_synthetic, reference)
    fs = stats.features_statistics(
        dataset, scene_synthetic.tracks_manager, [reference]
    )
    assert list(fs.keys()) == ["detected_features", "reconstructed_features"]
    assert fs["detected_features"] == fs["reconstructed_features"]
    rf = fs["reconstructed_features"]
    assert 0 < rf["min"] <= rf["median"] <= rf["max"]
    assert 200 < rf["mean"] < 2000


def test_features_statistics_null(scene_synthetic, null_scene):
    dataset = make_dataset(scene_synthetic, null_scene)
    fs = stats.features_statistics(
        dataset, scene_synthetic.tracks_manager, [null_scene]
    )
    assert fs["reconstructed_features"] == {
        "min": -1, "max": -1, "mean": -1, "median": -1,
    }


def test_reconstruction_statistics_normal(scene_synthetic):
    reference = scene_synthetic.reconstruction
    dataset = make_dataset(scene_synthetic, reference)
    rs = stats.reconstruction_statistics(
        dataset, scene_synthetic.tracks_manager, [reference]
    )
    assert rs["components"] == 1
    assert rs["has_gps"]
    assert not rs["has_gcp"]
    assert rs["initial_shots_count"] == 20
    assert rs["reconstructed_shots_count"] == 20
    assert 4000 < rs["reconstructed_points_count"] <= 5000
    assert rs["observations_count"] > 10000
    assert 3.0 < rs["average_track_length"] < 4.0
    assert rs["average_track_length_over_two"] >= rs["average_track_length"]
    # Ground-truth scene: reprojection error ~ injected 1px noise.
    assert 0 < rs["reprojection_error_normalized"] < 0.01
    assert 0 < rs["reprojection_error_pixels"] < 3.0


def test_reconstruction_statistics_null(scene_synthetic, null_scene):
    dataset = make_dataset(scene_synthetic, null_scene)
    rs = stats.reconstruction_statistics(
        dataset, scene_synthetic.tracks_manager, [null_scene]
    )
    assert rs["components"] == 1
    assert not rs["has_gps"]
    assert not rs["has_gcp"]
    assert rs["initial_shots_count"] == 0
    assert rs["reconstructed_shots_count"] == 0
    assert rs["reconstructed_points_count"] == 0
    assert rs["observations_count"] == 0
    assert rs["average_track_length"] == -1
    assert rs["average_track_length_over_two"] == -1
    assert rs["reprojection_error_normalized"] == -1.0
    assert rs["reprojection_error_pixels"] == -1.0


def test_cameras_statistics_normal(scene_synthetic):
    reference = scene_synthetic.reconstruction
    dataset = make_dataset(scene_synthetic, reference)
    cs = stats.cameras_statistics(dataset, [reference])
    assert set(cs.keys()) == {"1"}
    entry = cs["1"]
    assert entry["initial_values"] == {"k1": -0.1, "k2": 0.01, "focal": 0.7}
    assert entry["optimized_values"] == {"k1": -0.1, "k2": 0.01, "focal": 0.7}
    assert entry["bias"]["scale"] == 1.0
    assert list(entry["bias"]["translation"]) == [0.0, 0.0, 0.0]


def test_cameras_statistics_null(scene_synthetic, null_scene):
    dataset = make_dataset(scene_synthetic, null_scene)
    assert stats.cameras_statistics(dataset, [null_scene]) == {}


def test_rig_statistics_normal(scene_synthetic):
    reference = scene_synthetic.reconstruction
    dataset = make_dataset(scene_synthetic, reference)
    assert stats.rig_statistics(dataset, [reference]) == {}


def test_gps_errors_normal(scene_synthetic):
    reference = scene_synthetic.reconstruction
    ge = stats.gps_errors([reference])
    assert set(ge.keys()) == {"average_error", "error", "mean", "std"}
    # scene_synthetic generated GPS noise is 5 meters
    assert 3.0 < ge["average_error"] < 7.0


def test_gps_errors_null(null_scene):
    assert stats.gps_errors([null_scene]) == {}


def test_gcp_errors_normal(scene_synthetic):
    reference = scene_synthetic.reconstruction
    dataset = make_dataset(scene_synthetic, reference)
    assert stats.gcp_errors(dataset, [reference]) == {}
