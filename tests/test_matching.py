"""Descriptor matching + pair selection tests.

Mirrors reference test_matching.py / test_pairs_selection.py coverage at
unit level with synthetic descriptors.
"""

import numpy as np
import pytest

from opensfm_tpu import pairs_selection, robust
from opensfm_tpu.ops.matching import match_brute_force_symmetric


def test_match_brute_force_symmetric_exact():
    rng = np.random.default_rng(0)
    d2 = rng.normal(0, 1, (100, 32)).astype(np.float32)
    # d1 = permuted noisy copies of d2's first 50 rows.
    perm = rng.permutation(50)
    d1 = d2[perm] + rng.normal(0, 0.01, (50, 32)).astype(np.float32)
    matches = match_brute_force_symmetric(d1, d2, ratio=0.8, symmetric=True)
    assert len(matches) >= 45
    for i, j in matches:
        assert perm[i] == j


def test_match_ratio_rejects_ambiguous():
    # Two identical target descriptors: ratio test must reject.
    d2 = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    d1 = np.array([[1.0, 0.01]], dtype=np.float32)
    matches = match_brute_force_symmetric(d1, d2, ratio=0.8, symmetric=False)
    assert len(matches) == 0


def test_match_empty_inputs():
    out = match_brute_force_symmetric(
        np.zeros((0, 8), np.float32), np.zeros((5, 8), np.float32), 0.8
    )
    assert out.shape == (0, 2)


def test_ransac_fundamental():
    rng = np.random.default_rng(1)
    # Points from a planar-ish scene seen by two views -> F from E.
    from opensfm_tpu.geometry.pose import Pose

    gt = Pose([0.02, -0.1, 0.03], [0.5, 0.1, -0.1])
    f = 0.8
    X = rng.uniform(-3, 3, (150, 3)) + [0, 0, 10.0]
    x1 = (X[:, :2] / X[:, 2:]) * f
    Xc2 = X @ gt.get_rotation_matrix().T + gt.translation
    x2 = (Xc2[:, :2] / Xc2[:, 2:]) * f
    bad = rng.choice(150, 40, replace=False)
    x2[bad] += rng.normal(0, 0.3, (40, 2))
    result = robust.ransac_fundamental(x1, x2, threshold=0.002, iterations=500)
    assert result.num_inliers >= 100
    assert len(set(result.inliers_indices) & set(bad.tolist())) < 5


class _FakeData:
    def __init__(self, exifs):
        from opensfm_tpu import config as cm
        from opensfm_tpu.geo import TopocentricConverter

        self.config = cm.default_config()
        self._reference = TopocentricConverter(52.0, 13.0, 0)
        self.exifs = exifs

    def init_reference(self, images=None):
        pass

    def load_reference(self):
        return self._reference


def _exif_at(lat, lon, t=0.0):
    return {
        "gps": {"latitude": lat, "longitude": lon, "altitude": 0.0},
        "capture_time": t,
    }


def test_pair_selection_exhaustive_when_disabled():
    exifs = {f"im{i}": _exif_at(52.0, 13.0 + i * 1e-5) for i in range(4)}
    data = _FakeData(exifs)
    data.config["matching_gps_distance"] = 0
    pairs, report = pairs_selection.match_candidates_from_metadata(
        list(exifs), list(exifs), exifs, data, {}
    )
    assert len(pairs) == 6  # all C(4,2) pairs


def test_pair_selection_by_distance():
    # Two clusters 10km apart: only intra-cluster pairs.
    exifs = {}
    for i in range(3):
        exifs[f"a{i}"] = _exif_at(52.0, 13.0 + i * 1e-5)
        exifs[f"b{i}"] = _exif_at(52.1, 13.0 + i * 1e-5)
    data = _FakeData(exifs)
    data.config["matching_gps_distance"] = 150
    pairs, _ = pairs_selection.match_candidates_from_metadata(
        list(exifs), list(exifs), exifs, data, {}
    )
    for im1, im2 in pairs:
        assert im1[0] == im2[0], (im1, im2)
    assert len(pairs) == 6  # 3 per cluster


def test_pair_selection_by_time():
    exifs = {f"im{i}": _exif_at(52.0, 13.0, t=float(i)) for i in range(5)}
    # Remove GPS to force non-gps strategies.
    for v in exifs.values():
        v["gps"] = {}
    data = _FakeData(exifs)
    data.config["matching_gps_distance"] = 0
    data.config["matching_time_neighbors"] = 1
    pairs, _ = pairs_selection.match_candidates_from_metadata(
        list(exifs), list(exifs), exifs, data, {}
    )
    # Each image paired with its time neighbor.
    assert ("im0", "im1") in pairs or ("im1", "im0") in pairs
    assert len(pairs) >= 4


def test_dog_feature_detector_synthetic():
    """Detector finds repeatable corners on a checkerboard-ish pattern."""
    from opensfm_tpu.ops.features import extract_dog_features

    rng = np.random.default_rng(2)
    img = np.zeros((256, 256), dtype=np.float32)
    for _ in range(30):
        y, x = rng.integers(20, 236, 2)
        img[y - 6 : y + 6, x - 6 : x + 6] = rng.uniform(0.5, 1.0)
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    pts, desc = extract_dog_features(img, peak_threshold=0.01, target_features=500)
    assert len(pts) > 20
    assert desc.shape[1] == 128
    assert np.allclose(np.linalg.norm(desc, axis=1), 1.0, atol=0.01)


def test_matching_use_segmentation_suppresses_cross_class(tmp_path):
    """`matching_use_segmentation` must make the exact matcher prefer a
    same-class descriptor over a closer cross-class one (the reference
    appends a weighted label column so FLANN can't rank cross-class
    candidates first — feature_loading.py:16-24,111, matching.py:281-289;
    this was a silently-dead config key in rounds 1-3)."""
    import yaml

    from opensfm_tpu.dataset import DataSet
    from opensfm_tpu.features import FeaturesData, SemanticData
    from opensfm_tpu.matching import clear_cache, match_descriptors

    root = tmp_path / "segds"
    (root / "images").mkdir(parents=True)
    (root / "config.yaml").write_text(
        yaml.safe_dump(
            {"feature_type": "HAHOG", "hahog_normalize_to_uchar": True}
        )
    )
    data = DataSet(str(root))

    rng = np.random.default_rng(3)
    n = 24
    base = rng.integers(0, 200, (n, 128)).astype(np.uint8)
    pts = np.concatenate(
        [rng.uniform(-0.4, 0.4, (n, 2)), np.full((n, 1), 0.01),
         np.zeros((n, 1))], axis=1
    )
    colors = np.full((n, 3), 128.0)

    # im1: every feature labelled class 0.
    seg1 = SemanticData(np.zeros(n, dtype=np.int32), None, ["sky", "road"])
    data.save_features("im1.jpg", FeaturesData(pts, base, colors, seg1))

    # im2: feature i is the EXACT copy of im1's feature i but labelled
    # class 1 (cross-class, distance 0), feature n+i is a slightly
    # perturbed copy labelled class 0 (same-class, small distance).
    desc2 = np.concatenate([base, base ^ 1], axis=0)  # xor -> tiny offset
    pts2 = np.concatenate([pts, pts + 0.001], axis=0)
    seg2 = SemanticData(
        np.concatenate(
            [np.ones(n, dtype=np.int32), np.zeros(n, dtype=np.int32)]
        ),
        None, ["sky", "road"],
    )
    data.save_features(
        "im2.jpg",
        FeaturesData(pts2, desc2, np.full((2 * n, 3), 128.0), seg2),
    )

    cam = None  # match_descriptors does not project for BRUTEFORCE

    clear_cache()
    plain = match_descriptors(
        "im1.jpg", "im2.jpg", cam, cam, data,
        {"matcher_type": "BRUTEFORCE", "lowes_ratio": 0.95,
         "matching_use_segmentation": False},
    )
    clear_cache()
    seg = match_descriptors(
        "im1.jpg", "im2.jpg", cam, cam, data,
        {"matcher_type": "BRUTEFORCE", "lowes_ratio": 0.95,
         "matching_use_segmentation": True},
    )
    clear_cache()

    # Without segmentation the exact-duplicate cross-class feature wins.
    plain_targets = dict(plain.tolist())
    assert sum(1 for i, j in plain_targets.items() if j == i) > n // 2
    # With segmentation every surviving match lands on the same-class copy.
    assert len(seg) > n // 2
    for i, j in seg.tolist():
        assert j == i + n, f"cross-class match {i}->{j} survived"
