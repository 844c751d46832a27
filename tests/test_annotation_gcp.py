"""Annotation tool tests: GCP manager roundtrip + run_ba helpers."""

import json
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from annotation_gui_gcp.lib.gcp_manager import GroundControlPointManager
from annotation_gui_gcp import run_ba
from opensfm_tpu import io as osfm_io


def test_gcp_manager_roundtrip(tmp_path):
    m = GroundControlPointManager(str(tmp_path))
    m.add_point("p1")
    m.add_point_observation("p1", "im1", [0.1, 0.2])
    m.add_point_observation("p1", "im2", [-0.1, 0.0])
    m.set_point_position("p1", 52.0, 13.0, 30.0)
    m.write_to_file()

    m2 = GroundControlPointManager(str(tmp_path))
    assert m2.observed_shots("p1") == ["im1", "im2"]
    assert m2.points["p1"]["position"]["latitude"] == 52.0
    assert m2.points_on_shot("im1") == {"p1": [0.1, 0.2]}

    # The pipeline reader consumes the same file.
    with open(os.path.join(tmp_path, "ground_control_points.json")) as f:
        gcps = osfm_io.read_ground_control_points(f)
    assert len(gcps) == 1
    assert gcps[0].id == "p1"
    assert len(gcps[0].observations) == 2
    assert gcps[0].lla["latitude"] == 52.0


def test_gcp_manager_edits(tmp_path):
    m = GroundControlPointManager(str(tmp_path))
    m.add_point("a")
    m.add_point_observation("a", "im1", [0, 0])
    # re-annotating the same shot replaces the observation
    m.add_point_observation("a", "im1", [0.5, 0.5])
    assert m.get_observations("a") == [
        {"shot_id": "im1", "projection": [0.5, 0.5]}
    ]
    m.remove_point_observation("a", "im1")
    assert m.get_observations("a") == []
    m.remove_point("a")
    assert "a" not in m.points
    with pytest.raises(ValueError):
        m.add_point("b")
        m.add_point("b")


def test_find_alignment():
    rng = np.random.default_rng(0)
    pts1 = rng.normal(size=(10, 3))
    s_true, b_true = 2.5, np.array([1.0, -2.0, 0.5])
    theta = 0.4
    A_true = np.array(
        [[np.cos(theta), -np.sin(theta), 0],
         [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1.0]]
    )
    pts0 = [s_true * A_true @ p + b_true for p in pts1]
    pts0[3] = None  # missing correspondences are skipped
    s, A, b = run_ba.find_alignment(pts0, list(pts1))
    assert np.isclose(s, s_true)
    assert np.allclose(A, A_true, atol=1e-9)
    assert np.allclose(b, b_true, atol=1e-9)


def test_compute_gcp_std_and_wrong_counts():
    reprojections = {
        "g1": {"im1": {"error": 0.003}, "im2": {"error": 0.004}},
        "g2": {"im1": {"error": 0.1}},
    }
    std = run_ba.compute_gcp_std(reprojections)
    assert np.isclose(
        std, np.sqrt(np.mean(np.square([0.003, 0.004, 0.1])))
    )
    wrong = run_ba.get_number_of_wrong_annotations_per_gcp(reprojections, 0.01)
    assert wrong == {"g1": 0, "g2": 1}
    ranked = run_ba.get_sorted_reprojection_errors(reprojections)
    assert ranked[0] == ("g2", "im1", 0.1)


def test_decompose_covariance():
    cov = np.diag([4.0, 1.0, 0.25])
    _, sigmas = run_ba.decompose_covariance(cov)
    assert np.allclose(sorted(sigmas), [0.5, 1.0, 2.0])


def test_cp_finder_candidate_ordering(tmp_path):
    """Images observing the point but NOT shown in other views come first
    (reference lib/views/cp_finder_view.py:21-37)."""
    from annotation_gui_gcp.main import cp_finder_candidates

    m = GroundControlPointManager(str(tmp_path))
    m.add_point("p1")
    for im in ("im1", "im2", "im3"):
        m.add_point_observation("p1", im, [0.0, 0.0])
    cands = cp_finder_candidates(m, "p1", shown=["im2"])
    assert cands == ["im1", "im3", "im2"]
    assert cp_finder_candidates(m, "nope", shown=[]) == []


def test_cad_position_places_point_geo(tmp_path):
    """A world-frame click converts through the dataset's reference_lla to
    a LLA position (cad_view is_geo_reference semantics)."""
    import json as _json

    from annotation_gui_gcp.main import set_position_from_world
    from opensfm_tpu.geo import TopocentricConverter

    (tmp_path / "reference_lla.json").write_text(_json.dumps(
        {"latitude": 47.0, "longitude": 6.0, "altitude": 10.0}
    ))
    m = GroundControlPointManager(str(tmp_path))
    res = set_position_from_world(m, str(tmp_path), "cp0", 100.0, 50.0, 2.0)
    assert res["ok"]
    conv = TopocentricConverter(47.0, 6.0, 10.0)
    x, y, z = conv.to_topocentric(
        res["latitude"], res["longitude"], res["altitude"]
    )
    np.testing.assert_allclose([x, y, z], [100.0, 50.0, 2.0], atol=1e-6)
    # Persisted in the pipeline-readable format.
    with open(os.path.join(tmp_path, "ground_control_points.json")) as f:
        gcps = osfm_io.read_ground_control_points(f)
    assert gcps[0].lla["latitude"] == res["latitude"]


def test_model_payload_requires_reconstruction(tmp_path):
    from annotation_gui_gcp.main import load_model_payload

    assert "error" in load_model_payload(str(tmp_path))


def test_visible_points_and_track_navigation(tmp_path):
    """Per-image point overlay payload + track-level image list (reference
    image_view.py sync_to_client:78-100 and the jump-through-track flow)."""
    from annotation_gui_gcp.main import (
        point_color,
        point_images,
        visible_points,
    )

    m = GroundControlPointManager(str(tmp_path))
    m.add_point("p1")
    m.add_point("p2")
    m.add_point_observation("p1", "im1", [0.1, 0.2])
    m.add_point_observation("p1", "im2", [0.3, 0.4])
    m.add_point_observation("p2", "im1", [0.5, 0.6])

    vis = visible_points(m, "im1")
    assert set(vis) == {"p1", "p2"}
    assert vis["p1"]["projection"] == [0.1, 0.2]
    assert vis["p1"]["color"] == point_color("p1")
    assert vis["p1"]["color"].startswith("#")

    assert point_images(m, "p1") == ["im1", "im2"]
    assert point_images(m, "p2") == ["im1"]
    assert point_images(m, "absent") == []


def test_run_ba_analysis_modes(tmp_path):
    """The tools pane's rigid/flex/full dispatch reaches run_ba.align with
    the right behavior switches (reference GUI.py:103-134)."""
    import inspect

    from annotation_gui_gcp.run_ba import align, bundle_with_fixed_images

    sig = inspect.signature(align)
    assert "mode" in sig.parameters
    assert sig.parameters["mode"].default == "full"
    assert "covariance" in inspect.signature(
        bundle_with_fixed_images
    ).parameters
