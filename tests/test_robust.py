"""Batched RANSAC tests — mirrors reference opensfm/test/test_robust.py:
synthetic inliers + outliers for each model family, assert outlier rejection
and model accuracy.
"""

import numpy as np
import pytest

from opensfm_tpu import robust
from opensfm_tpu.geometry.pose import Pose


def add_outliers(rng, inliers_count, points, scale):
    idx = rng.choice(len(points), inliers_count, replace=False)
    points[idx] += rng.normal(0, scale, points[idx].shape)
    return set(idx.tolist())


def test_ransac_line():
    rng = np.random.default_rng(0)
    a, b = 2.0, 3.0
    x = np.linspace(-10, 10, 100)
    points = np.stack([x, a * x + b], axis=1)
    points += rng.normal(0, 0.05, points.shape)
    outliers = add_outliers(rng, 30, points, 5.0)
    result = robust.ransac_line(points, threshold=0.3, iterations=500)
    assert result.num_inliers >= 60
    est_a, est_b = result.model
    assert abs(est_a - a) < 0.05
    assert abs(est_b - b) < 0.2
    assert len(set(result.inliers_indices.tolist()) & outliers) < 5


def test_ransac_similarity():
    rng = np.random.default_rng(1)
    x = rng.uniform(-10, 10, (100, 3))
    gt = Pose(rng.uniform(-1, 1, 3), rng.uniform(-5, 5, 3))
    s = 2.5
    y = s * x @ gt.get_rotation_matrix().T + gt.translation
    add_outliers(rng, 25, y, 10.0)
    result = robust.ransac_similarity(x, y, threshold=0.1, iterations=500)
    assert result.num_inliers >= 70
    T = result.model
    scale = np.linalg.det(T[:3, :3]) ** (1 / 3)
    assert abs(scale - s) < 0.01
    assert np.allclose(T[:3, :3] / scale, gt.get_rotation_matrix(), atol=1e-3)


def make_two_view(rng, n, rotation_only=False):
    gt = Pose(rng.uniform(-0.3, 0.3, 3), np.zeros(3) if rotation_only
              else rng.uniform(-1, 1, 3))
    X = rng.uniform(-4, 4, (n, 3)) + np.array([0, 0, 12.0])
    b1 = X / np.linalg.norm(X, axis=1, keepdims=True)
    Xc2 = X @ gt.get_rotation_matrix().T + gt.translation
    b2 = Xc2 / np.linalg.norm(Xc2, axis=1, keepdims=True)
    return gt, X, b1, b2


def corrupt_bearings(rng, b, count):
    idx = rng.choice(len(b), count, replace=False)
    b[idx] = rng.normal(0, 1, (count, 3))
    b[idx] /= np.linalg.norm(b[idx], axis=1, keepdims=True)
    return set(idx.tolist())


def test_ransac_essential():
    rng = np.random.default_rng(2)
    gt, X, b1, b2 = make_two_view(rng, 120)
    outliers = corrupt_bearings(rng, b2, 30)
    result = robust.ransac_essential(b1, b2, threshold=0.002, iterations=500)
    assert result.num_inliers >= 80
    assert len(set(result.inliers_indices.tolist()) & outliers) < 5


def test_ransac_relative_pose():
    rng = np.random.default_rng(3)
    gt, X, b1, b2 = make_two_view(rng, 120)
    outliers = corrupt_bearings(rng, b2, 30)
    result = robust.ransac_relative_pose(b1, b2, threshold=0.002, iterations=500)
    assert result.num_inliers >= 80
    Rt = result.model
    R_gt = gt.get_rotation_matrix()
    t_gt = gt.translation / np.linalg.norm(gt.translation)
    assert np.allclose(Rt[:, :3], R_gt, atol=1e-3)
    assert np.allclose(Rt[:, 3], t_gt, atol=1e-3)


def test_ransac_relative_rotation():
    rng = np.random.default_rng(4)
    gt, X, b1, b2 = make_two_view(rng, 100, rotation_only=True)
    outliers = corrupt_bearings(rng, b2, 25)
    result = robust.ransac_relative_rotation(b1, b2, threshold=0.002, iterations=500)
    assert result.num_inliers >= 70
    assert np.allclose(result.model, gt.get_rotation_matrix(), atol=1e-4)


def test_ransac_absolute_pose():
    rng = np.random.default_rng(5)
    gt = Pose(rng.uniform(-0.5, 0.5, 3), rng.uniform(-2, 2, 3))
    R, t = gt.get_rotation_matrix(), gt.translation
    Pw = rng.uniform(-5, 5, (100, 3)) + np.array([0, 0, 10.0])
    pc = Pw @ R.T + t
    b = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    outliers = corrupt_bearings(rng, b, 25)
    result = robust.ransac_absolute_pose(b, Pw, threshold=0.002, iterations=500)
    assert result.num_inliers >= 70
    Rt = result.model
    assert np.allclose(Rt[:, :3], R, atol=1e-4)
    assert np.allclose(Rt[:, 3], t, atol=1e-3)


def test_ransac_absolute_pose_known_rotation():
    rng = np.random.default_rng(6)
    gt = Pose(rng.uniform(-0.5, 0.5, 3), rng.uniform(-2, 2, 3))
    R, t = gt.get_rotation_matrix(), gt.translation
    Pw = rng.uniform(-5, 5, (80, 3)) + np.array([0, 0, 10.0])
    pc = Pw @ R.T + t
    b = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    outliers = corrupt_bearings(rng, b, 20)
    result = robust.ransac_absolute_pose_known_rotation(
        b, Pw, R, threshold=0.002, iterations=500
    )
    assert result.num_inliers >= 55
    assert np.allclose(result.model, t, atol=1e-3)


def test_ransac_with_noise_tolerance():
    # All-inlier data with moderate noise: every point should be an inlier.
    rng = np.random.default_rng(7)
    gt, X, b1, b2 = make_two_view(rng, 60)
    result = robust.ransac_relative_pose(b1, b2, threshold=0.01, iterations=200)
    assert result.num_inliers == 60


def test_ransac_insufficient_data():
    result = robust.ransac_absolute_pose(
        np.zeros((2, 3)), np.zeros((2, 3)), threshold=0.01
    )
    assert result.num_inliers == 0
    assert result.model is None
