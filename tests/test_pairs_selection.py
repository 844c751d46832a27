"""Pair selection tests — mirrors reference test_pairs_selection.py
(representative-point portion; the lund end-to-end candidate tests live in
the matching pipeline drives)."""

import numpy as np

from opensfm_tpu import geo, pairs_selection


def test_get_gps_point():
    reference = geo.TopocentricConverter(0, 0, 0)
    exifs = {
        "gps": {"latitude": 0.0001, "longitude": 0.0001, "altitude": 100.0}
    }
    origin, direction = pairs_selection.get_gps_point(exifs, reference)
    assert np.allclose(origin, [11.131, 11.057, 0.0], atol=1e-3)
    assert np.allclose(direction, [0, 0, 1])


def test_get_gps_opk_point():
    reference = geo.TopocentricConverter(0, 0, 0)
    exifs = {
        "gps": {"latitude": 0.0001, "longitude": 0.0001, "altitude": 100.0},
        "opk": {"omega": 45, "phi": 0, "kappa": 45},
    }
    origin, direction = pairs_selection.get_gps_opk_point(exifs, reference)
    assert np.allclose(origin, [11.131, 11.057, 0.0], atol=1e-3)
    assert np.allclose(direction, [0.0, 1.0, -1.0])


def test_find_best_altitude_convergent():
    origins = {"0": np.array([2.0, 0.0, 8.0]), "1": np.array([-2.0, 0.0, 8.0])}
    directions = {
        "0": np.array([-1.0, 0.0, -1.0]),
        "1": np.array([1.0, 0.0, -1.0]),
    }
    altitude = pairs_selection.find_best_altitude(origins, directions)
    assert np.allclose([altitude], [2.0], atol=1e-2)


def test_find_best_altitude_divergent():
    origins = {"0": np.array([2.0, 0.0, 8.0]), "1": np.array([-2.0, 0.0, 8.0])}
    directions = {
        "0": np.array([1.0, 0.0, -1.0]),
        "1": np.array([-1.0, 0.0, -1.0]),
    }
    altitude = pairs_selection.find_best_altitude(origins, directions)
    assert np.allclose([altitude], pairs_selection.DEFAULT_Z, atol=1e-2)


def test_representative_points_plain_gps():
    reference = geo.TopocentricConverter(0, 0, 0)
    exifs = {
        "a": {"gps": {"latitude": 0.0001, "longitude": 0.0001}},
        "b": {"gps": {"latitude": -0.0001, "longitude": 0.0002}},
        "c": {},  # no gps: skipped
    }
    points = pairs_selection.get_representative_points(
        ["a", "b", "c"], exifs, reference
    )
    assert set(points.keys()) == {"a", "b"}
