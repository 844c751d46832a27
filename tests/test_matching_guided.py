"""WORDS / guided / masked matching tests (reference matching surface)."""

import numpy as np
import pytest

from opensfm_tpu import matching
from opensfm_tpu.geometry.pose import Pose
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.ops.matching import (
    match_brute_force,
    match_brute_force_symmetric,
    word_compatibility_mask,
)


def make_descriptors(n, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, dim)).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def test_masked_matching_restricts_candidates():
    d1 = make_descriptors(20)
    noise = 0.01 * np.random.default_rng(1).normal(size=d1.shape).astype(np.float32)
    d2 = d1 + noise  # perfect correspondence i <-> i

    full = match_brute_force_symmetric(d1, d2, ratio=0.9)
    assert len(full) == 20
    assert np.array_equal(full[:, 0], full[:, 1])

    # Mask out the true matches: nothing should survive the ratio test well.
    mask = ~np.eye(20, dtype=bool)
    masked = match_brute_force_symmetric(d1, d2, ratio=0.9, mask12=mask)
    ids = {tuple(m) for m in masked}
    assert all(a != b for a, b in ids)


def test_mask_with_single_candidate_row():
    d1 = make_descriptors(8)
    d2 = d1.copy()
    mask = np.zeros((8, 8), dtype=bool)
    mask[0, 0] = True  # row 0 has only one allowed candidate
    out = match_brute_force(d1, d2, ratio=0.8, mask12=mask)
    # One candidate -> second-best distance is inf -> ratio test fails.
    assert len(out) == 0


def test_word_compatibility_mask():
    words1 = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    words2 = np.array([[1, 9], [7, 0], [5, 2]], dtype=np.int32)
    mask = word_compatibility_mask(words1, words2, num_checks=3)
    # feature0 of im2 has best word 1, in words1[0] -> compatible with f1#0
    assert mask[0, 0] and not mask[1, 0]
    # feature1 of im2 best word 7 matches nobody
    assert not mask[0, 1] and not mask[1, 1]
    # feature2 of im2 best word 5 in words1[1]
    assert mask[1, 2] and not mask[0, 2]
    # num_checks=1 only looks at the first column of words1
    mask1 = word_compatibility_mask(words1, words2, num_checks=1)
    assert not mask1[0, 0] and not mask1[1, 2]


def test_match_words_equals_bruteforce_when_words_agree():
    d1 = make_descriptors(30, seed=2)
    d2 = d1 + 0.01 * np.random.default_rng(3).normal(size=d1.shape).astype(
        np.float32
    )
    # All features share word 0: words impose no restriction.
    words = np.zeros((30, 4), dtype=np.int32)
    config = {"lowes_ratio": 0.9, "bow_num_checks": 4}
    mw = matching.match_words_symmetric(d1, words, d2, words, config)
    bf = match_brute_force_symmetric(d1, d2, 0.9)
    assert {tuple(m) for m in mw} == {tuple(m) for m in bf}


def test_guided_epipolar_mask():
    # Two cameras looking at points; mask should be true for corresponding
    # bearings under the true relative pose.
    rng = np.random.default_rng(5)
    points = rng.normal(size=(40, 3)) + np.array([0, 0, 6.0])
    pose1 = Pose([0, 0, 0], [0, 0, 0])
    pose2 = Pose([0.0, 0.2, 0.0], [-1.0, 0, 0])
    b1 = points / np.linalg.norm(points, axis=1, keepdims=True)
    p2 = (pose2.get_rotation_matrix() @ points.T).T + pose2.translation
    b2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
    relative = pose2.compose(pose1.inverse())
    mask = matching.compute_inliers_bearing_epipolar(b1, b2, relative, 1e-6)
    assert mask.shape == (40, 40)
    assert np.all(np.diag(mask))  # true correspondences are on-epipolar
    assert mask.sum() < 40 * 40  # but most random pairs are not


def test_non_static_matches_filter():
    p1 = np.array([[0.0, 0.0], [0.5, 0.5], [0.2, 0.1]])
    p2 = np.array([[0.0, 0.0], [0.4, 0.4], [0.2, 0.1]])
    matches = np.array([[0, 0], [1, 1], [2, 2]])
    out = matching._non_static_matches(p1, p2, matches)
    # matches 0 and 2 are static (identical positions) and dropped
    assert {tuple(m) for m in out} == {(1, 1)}


def test_non_static_keeps_static_scene():
    # If nearly all matches are static, the filter backs off entirely.
    p = np.random.default_rng(0).normal(size=(20, 2))
    matches = np.stack([np.arange(20), np.arange(20)], axis=1)
    out = matching._non_static_matches(p, p, matches)
    assert len(out) == 20


def test_pano_poles_filter():
    cam_pano = Camera.create_spherical()
    cam_persp = Camera.create_perspective(0.8, 0, 0)
    p1 = np.array([[0.0, 0.0], [0.0, 0.3], [0.0, -0.2]])
    p2 = np.array([[0.0, 0.0], [0.1, 0.0], [0.2, 0.0]])
    matches = np.array([[0, 0], [1, 1], [2, 2]])
    out = matching._not_on_pano_poles_matches(p1, p2, matches, cam_pano, cam_persp)
    assert {tuple(m) for m in out} == {(0, 0)}
    out2 = matching._not_on_pano_poles_matches(
        p1, p2, matches, cam_persp, cam_persp
    )
    assert len(out2) == 3


class _ExifData:
    def __init__(self, makes):
        self._makes = makes

    def load_exif(self, image):
        return {"make": self._makes.get(image, ""), "model": ""}


def test_blackvue_watermark_filter():
    data = _ExifData({"im1": "Blackvue"})
    p1 = np.array([[0.0, 0.0], [0.0, 0.29]])
    p2 = np.array([[0.0, 0.0], [0.0, 0.0]])
    matches = np.array([[0, 0], [1, 1]])
    out = matching._not_on_blackvue_watermark(p1, p2, matches, "im1", "im2", data)
    assert {tuple(m) for m in out} == {(0, 0)}
