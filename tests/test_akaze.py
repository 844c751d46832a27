"""AKAZE (JAX FED nonlinear scale space) feature tests.

Mirrors the reference's feature-extraction expectations for the AKAZE type
(features.py:485-513, config.py:71-84): keypoints found on structured
images, M-SURF 64-d float descriptors / M-LDB 486-bit binary descriptors,
and translation repeatability of the matched descriptors.
"""

import numpy as np
import pytest

from opensfm_tpu import features
from opensfm_tpu.ops.akaze import extract_akaze_features


@pytest.fixture(scope="module")
def test_image():
    rng = np.random.default_rng(7)
    img = np.zeros((300, 400), dtype=np.float32)
    # Blobs and corners at random positions: rich, isotropic structure.
    for _ in range(60):
        cy = rng.integers(30, 270)
        cx = rng.integers(30, 370)
        r = int(rng.integers(4, 14))
        y, x = np.ogrid[-r:r + 1, -r:r + 1]
        blob = (y * y + x * x <= r * r).astype(np.float32)
        img[cy - r:cy + r + 1, cx - r:cx + r + 1] += blob * rng.uniform(0.3, 1.0)
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    return np.clip(img, 0, 1) * 255


def test_akaze_msurf_detect(test_image):
    pts, desc = extract_akaze_features(test_image, {}, 500)
    assert len(pts) > 100
    assert desc.shape[1] == 64
    # Unit-norm M-SURF descriptors.
    norms = np.linalg.norm(desc, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-4)
    # Keypoints inside the image.
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] < 400).all()
    assert (pts[:, 1] >= 0).all() and (pts[:, 1] < 300).all()
    assert (pts[:, 2] > 0).all()  # positive scales


def test_akaze_mldb_binary(test_image):
    cfg = {"akaze_descriptor": "MLDB"}
    pts, desc = extract_akaze_features(test_image, cfg, 300)
    assert len(pts) > 50
    # 486 = 3 channels x (6 + 36 + 120) grid-cell comparisons.
    assert desc.shape[1] == 486
    assert set(np.unique(desc)).issubset({0.0, 1.0})


def test_akaze_upright_zero_angle(test_image):
    cfg = {"akaze_descriptor": "MSURF_UPRIGHT"}
    pts, _ = extract_akaze_features(test_image, cfg, 200)
    assert np.allclose(pts[:, 3], 0.0)


def test_akaze_translation_repeatability(test_image):
    """Keypoints on a shifted copy should mostly match with the shift."""
    shift = 16
    shifted = np.roll(test_image, shift, axis=1)
    pts1, desc1 = extract_akaze_features(test_image, {}, 400)
    pts2, desc2 = extract_akaze_features(shifted, {}, 400)

    # Mutual nearest neighbours by L2.
    d = ((desc1[:, None] - desc2[None]) ** 2).sum(-1)
    nn12 = d.argmin(1)
    nn21 = d.argmin(0)
    mutual = nn21[nn12] == np.arange(len(desc1))
    dx = pts2[nn12, 0] - pts1[:, 0]
    dy = pts2[nn12, 1] - pts1[:, 1]
    good = mutual & (np.abs(dx - shift) < 2.0) & (np.abs(dy) < 2.0)
    # Majority of mutual matches consistent with the translation.
    assert good.sum() > 0.5 * mutual.sum()
    assert good.sum() > 50


def test_akaze_via_extract_features(test_image):
    """The features.extract_features dispatch path: normalized coords."""
    config = dict(features.DEFAULT_EXTRACT_CONFIG) if hasattr(
        features, "DEFAULT_EXTRACT_CONFIG") else {}
    from opensfm_tpu import config as config_lib

    config = config_lib.default_config()
    config["feature_type"] = "AKAZE"
    config["feature_min_frames"] = 300
    config["feature_process_size"] = 400
    img3 = np.repeat(test_image[:, :, None], 3, axis=2).astype(np.uint8)
    data = features.extract_features(img3, config, is_panorama=False)
    assert len(data.points) > 50
    # Normalized coordinates in [-0.5, 0.5].
    assert np.abs(data.points[:, :2]).max() <= 0.5 + 1e-6
    # feature_root applied to M-SURF: signed sqrt keeps values in [-1, 1].
    assert np.abs(data.descriptors).max() <= 1.0 + 1e-6
