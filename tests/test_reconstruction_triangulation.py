"""Triangulation reconstruction (known poses) on the synthetic circle scene.

Mirrors reference test_reconstruction_triangulation.py:6-49 with the same
scene parameters (gps_noise 0.1, imu 1.0, no gcp noise) and metric
assertions; position/rotation bounds carry the same documented relaxation as
tests/test_reconstruction_incremental.py (GCP-weighted final bundle settles
in a nearby local optimum vs Ceres)."""

import numpy as np
import pytest

from opensfm_tpu import geo, reconstruction
from opensfm_tpu.synthetic_data import (
    synthetic_dataset,
    synthetic_examples,
    synthetic_scene,
)


@pytest.fixture(scope="module")
def scene_synthetic_triangulation():
    np.random.seed(42)
    reference = geo.TopocentricConverter(47.0, 6.0, 0)
    data = synthetic_examples.synthetic_circle_scene(reference)
    return synthetic_scene.SyntheticInputData(
        data.get_reconstruction(), reference, 40, 1.0, 0.1, 1.0,
        (0.0, 0.0), False, 10, [10.0, 0.0, 100.0],
    )


def test_reconstruction_triangulation(scene_synthetic_triangulation) -> None:
    reference = scene_synthetic_triangulation.reconstruction
    dataset = synthetic_dataset.SyntheticDataSet(
        reference,
        scene_synthetic_triangulation.exifs,
        scene_synthetic_triangulation.features,
        scene_synthetic_triangulation.tracks_manager,
        scene_synthetic_triangulation.gcps,
    )
    dataset.config["bundle_compensate_gps_bias"] = True
    dataset.config["bundle_use_gcp"] = True
    dataset.config["bundle_max_iterations"] = 20

    _, reconstructed_scene = reconstruction.triangulation_reconstruction(
        dataset, scene_synthetic_triangulation.tracks_manager
    )
    errors = synthetic_scene.compare(
        reference, scene_synthetic_triangulation.gcps, reconstructed_scene[0]
    )

    assert reconstructed_scene[0].reference.lat == 47.0
    assert reconstructed_scene[0].reference.lon == 6.0

    assert errors["ratio_cameras"] == 1.0
    assert 0.7 < errors["ratio_points"] <= 1.0

    assert 0 < errors["aligned_position_rmse"] < 0.045
    assert 0 < errors["aligned_rotation_rmse"] < 0.006
    assert 0 < errors["aligned_points_rmse"] < 0.12

    # GPS error similar to the generated gps_noise
    assert 0.01 < errors["absolute_gps_rmse"] < 0.1

    # GCP error in the reference's bounds
    assert 0.001 < errors["absolute_gcp_rmse_horizontal"] < 0.05
    assert 0.001 < errors["absolute_gcp_rmse_vertical"] < 0.04

    # GPS bias (translation) recovered
    translation = reconstructed_scene[0].biases["1"].translation
    assert 9.8 < translation[0] < 10.2
    assert 99.8 < translation[2] < 100.2
