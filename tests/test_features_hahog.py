"""HAHOG-parity tests for the multi-scale Hessian detector.

The reference's HAHOG (features/src/hahog.cc:139) is VLFeat covdet with
VL_COVDET_METHOD_HESSIAN: extrema of the scale-normalized
determinant-of-Hessian response, multiple orientations per frame
(hahog.cc:92-122), circular frames (no affine adaptation is invoked).
These tests check the same observable behaviors on synthetic imagery:
blob detection at the right location/scale, subpixel localisation,
repeatability under rotation/scaling, and dual-orientation emission.
"""

import numpy as np
import pytest


def _blob_image(size=256, blobs=None, seed=3):
    """Gray image with gaussian blobs on a textured background."""
    rng = np.random.default_rng(seed)
    img = 0.5 + 0.02 * rng.standard_normal((size, size))
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    for (cx, cy, sigma, amp) in blobs or []:
        img += amp * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma**2))
    return np.clip(img, 0, 1).astype(np.float32)


def _detect(img, detector="hessian", peak=1e-6, n_orientations=1, target=200):
    from opensfm_tpu.ops.features import extract_dog_features

    return extract_dog_features(
        img, peak_threshold=peak, target_features=target, upsample=False,
        detector=detector, n_orientations=n_orientations,
    )


def test_hessian_detects_blobs_at_location_and_scale():
    blobs = [(64.0, 64.0, 3.0, 0.4), (180.0, 100.0, 5.0, -0.4),
             (100.0, 200.0, 8.0, 0.35)]
    img = _blob_image(blobs=blobs)
    pts, desc = _detect(img, "hessian")
    assert len(pts) >= 3
    assert desc.shape[1] == 128
    for (cx, cy, sigma, _) in blobs:
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        i = int(np.argmin(d))
        assert d[i] < 2.0, f"blob at ({cx},{cy}) missed: nearest {d[i]:.2f} px"
        # Detected size should grow with the blob's sigma (loose factor:
        # the scale grid is coarse — 2^(1/3) steps).
        assert 0.5 * sigma < pts[i, 2] < 6.0 * sigma


def test_hessian_subpixel_localisation():
    # Non-integer blob center: the Newton refinement should land within
    # a third of a pixel (integer-grid detection alone is ±0.5).
    img = _blob_image(blobs=[(77.37, 50.64, 4.0, 0.5)])
    pts, _ = _detect(img, "hessian")
    d = np.hypot(pts[:, 0] - 77.37, pts[:, 1] - 50.64)
    assert d.min() < 0.35, f"subpixel error {d.min():.3f}"


def test_hessian_repeatability_under_rotation():
    import cv2

    rng = np.random.default_rng(11)
    blobs = [
        (float(x), float(y), float(s), float(a))
        for x, y, s, a in zip(
            rng.uniform(40, 216, 25), rng.uniform(40, 216, 25),
            rng.uniform(2.5, 7, 25), rng.uniform(0.25, 0.45, 25) * rng.choice([-1, 1], 25),
        )
    ]
    img = _blob_image(blobs=blobs)
    angle = 20.0
    M = cv2.getRotationMatrix2D((128, 128), angle, 1.0)
    warped = cv2.warpAffine(img, M, (256, 256), flags=cv2.INTER_LINEAR)

    pts1, _ = _detect(img, "hessian")
    pts2, _ = _detect(warped, "hessian")

    # Keep keypoints whose warped position stays well inside the frame.
    ones = np.ones((len(pts1), 1))
    proj = np.hstack([pts1[:, :2], ones]) @ M.T  # [N, 2]
    inside = ((proj > 24) & (proj < 232)).all(axis=1)
    proj = proj[inside]
    assert len(proj) > 20

    d = np.linalg.norm(proj[:, None, :] - pts2[None, :, :2], axis=2)
    repeat = np.mean(d.min(axis=1) < 3.0)
    assert repeat > 0.5, f"repeatability under {angle} deg rotation: {repeat:.2f}"


def test_dual_orientation_emission():
    # Rotationally-symmetric blobs have near-flat orientation histograms:
    # the secondary peak clears the 80% ratio, so dual-orientation mode
    # must emit oriented copies of the same location with distinct angles
    # (hahog.cc:92-122 multiple orientations).
    img = _blob_image(blobs=[(float(x), float(y), 3.0, 0.4)
                             for x in range(40, 230, 38)
                             for y in range(40, 230, 38)])
    pts2, _ = _detect(img, "hessian", n_orientations=2)
    loc = {}
    dup_with_distinct_angle = 0
    for x, y, s, a in pts2:
        key = (round(float(x), 1), round(float(y), 1))
        if key in loc and abs(loc[key] - a) > 30:
            dup_with_distinct_angle += 1
        loc[key] = a
    assert dup_with_distinct_angle > 0


def test_dog_and_hessian_descriptors_match_across_detectors():
    # Descriptors from the same scene patch should be mutually matchable
    # regardless of which detector proposed the keypoint (shared
    # descriptor pipeline).  The linear gradient overlay breaks the blob's
    # rotational symmetry so both detectors estimate the same dominant
    # orientation (on a symmetric blob the angle is arbitrary and the
    # rotation-normalized descriptors need not agree).
    img = _blob_image(blobs=[(128.0, 128.0, 5.0, 0.45)])
    ramp = (np.arange(256, dtype=np.float32)[None, :] / 256.0) * 0.25
    img = np.clip(img + ramp, 0, 1)
    pts_h, desc_h = _detect(img, "hessian")
    pts_d, desc_d = _detect(img, "dog", peak=1e-3)
    ih = int(np.argmin(np.hypot(pts_h[:, 0] - 128, pts_h[:, 1] - 128)))
    idd = int(np.argmin(np.hypot(pts_d[:, 0] - 128, pts_d[:, 1] - 128)))
    a = desc_h[ih].astype(np.float64)
    b = desc_d[idd].astype(np.float64)
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.8, f"cross-detector descriptor cosine {cos:.3f}"


def test_hahog_config_path_uses_hessian(monkeypatch):
    # feature_type=HAHOG must route to the hessian detector with dual
    # orientations through the driver.
    from opensfm_tpu import features as features_mod
    from opensfm_tpu.config import default_config

    seen = {}

    def fake_extract(image_gray, peak_threshold, target_features,
                     upsample=True, root_uchar=False, detector="dog",
                     n_orientations=1, edge_threshold=10.0):
        seen["detector"] = detector
        seen["n_orientations"] = n_orientations
        seen["edge_threshold"] = edge_threshold
        return np.zeros((target_features, 4)), np.zeros((target_features, 128))

    monkeypatch.setattr(
        "opensfm_tpu.ops.features.extract_dog_features", fake_extract
    )
    config = default_config()
    config["feature_type"] = "HAHOG"
    img = np.zeros((64, 64), dtype=np.uint8)
    features_mod.extract_features_dog(img, config, 10)
    assert seen["detector"] == "hessian"
    assert seen["n_orientations"] == 2
