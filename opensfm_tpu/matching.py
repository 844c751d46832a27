"""Pairwise descriptor matching + robust geometric filtering.

Mirrors reference `opensfm/matching.py` (match_images:28,
match_images_with_pairs:63, match:563-634, _match_descriptors_impl:341,
robust_match:906, robust_match_fundamental:780, robust_match_calibrated:871,
unfilter_matches:932) with the exact top-2 MXU matcher
(ops/matching.py) replacing FLANN and batched RANSAC replacing the
per-pair loops.
"""

from __future__ import annotations

import logging
from timeit import default_timer as timer
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from opensfm_tpu import feature_loader, pairs_selection, robust
from opensfm_tpu.ops.matching import match_brute_force_symmetric

logger = logging.getLogger(__name__)


def clear_cache() -> None:
    feature_loader.instance.clear_cache()


def match_images(
    data, config_override: Dict[str, Any],
    ref_images: List[str], cand_images: List[str],
) -> Tuple[Dict[Tuple[str, str], Any], Dict[str, Any]]:
    """Candidate selection + matching for ref x cand images
    (matching.py:28-60)."""
    all_images = list(set(ref_images + cand_images))
    exifs = {im: data.load_exif(im) for im in all_images}
    pairs, preport = pairs_selection.match_candidates_from_metadata(
        ref_images, cand_images, exifs, data, config_override
    )
    logger.info(
        "Matching %d image pairs (%d ref images)", len(pairs), len(ref_images)
    )
    return match_images_with_pairs(data, config_override, exifs, pairs), preport


def match_images_with_pairs(
    data, config_override: Dict[str, Any],
    exifs: Dict[str, Any], pairs: List[Tuple[str, str]],
) -> Dict[Tuple[str, str], Any]:
    """Match the given pairs (matching.py:63-130)."""
    config = dict(data.config)
    config.update(config_override)
    cameras = data.load_camera_models()

    matches_per_pair = {}
    start = timer()
    for i, (im1, im2) in enumerate(pairs):
        camera1 = cameras[exifs[im1]["camera"]]
        camera2 = cameras[exifs[im2]["camera"]]
        matches = match(im1, im2, camera1, camera2, data, config)
        matches_per_pair[im1, im2] = matches
        if (i + 1) % 50 == 0:
            logger.info("Matched %d / %d pairs", i + 1, len(pairs))
    logger.info(
        "Matched %d pairs in %.1f seconds", len(pairs), timer() - start
    )
    return matches_per_pair


def save_matches(data, images_ref: List[str], matched_pairs) -> None:
    """Group per-pair matches by first image and save (matching.py:132-160)."""
    matches_per_im1: Dict[str, Dict[str, np.ndarray]] = {
        im: {} for im in images_ref
    }
    for (im1, im2), m in matched_pairs.items():
        matches_per_im1[im1][im2] = np.asarray(m)
    for im1, im1_matches in matches_per_im1.items():
        data.save_matches(im1, im1_matches)


def match(
    im1: str, im2: str, camera1, camera2, data, config: Dict[str, Any]
) -> np.ndarray:
    """Descriptor matching + robust geometric filter for one pair
    (matching.py:563-634)."""
    time_start = timer()

    symmetric = config.get("symmetric_matching", True)
    ratio = config.get("lowes_ratio", 0.8)

    fd1 = feature_loader.instance.load_features_index(data, im1, masked=True)
    fd2 = feature_loader.instance.load_features_index(data, im2, masked=True)
    if fd1 is None or fd2 is None:
        return np.zeros((0, 2), dtype=int)
    features1, d1 = fd1
    features2, d2 = fd2

    matches = match_brute_force_symmetric(d1, d2, ratio, symmetric)
    time_2d = timer()

    min_matches = config.get("robust_matching_min_match", 20)
    if len(matches) < min_matches:
        logger.debug("Matching %s and %s.  Matcher: %d matches", im1, im2, len(matches))
        return np.zeros((0, 2), dtype=int)

    # Robust geometric filtering.
    p1 = features1.points
    p2 = features2.points
    rmatches = robust_match(p1, p2, camera1, camera2, matches, config)
    rmatches = np.array([[a, b] for a, b in rmatches])
    time_robust = timer()

    if len(rmatches) < min_matches:
        return np.zeros((0, 2), dtype=int)

    logger.debug(
        "Matching %s and %s.  Matcher: (%d) T-desc: %.3f "
        "Robust: (%d) T-robust: %.3f",
        im1, im2, len(matches), time_2d - time_start,
        len(rmatches), time_robust - time_2d,
    )
    return rmatches


def _all_undistorted_perspective(cameras) -> bool:
    """F-RANSAC applies only to undistorted perspective pairs
    (robust_match, matching.py:906-929)."""
    for camera in cameras:
        if camera.projection_type != "perspective":
            return False
        if abs(camera.k1) > 1e-8 or abs(camera.k2) > 1e-8:
            return False
    return True


def robust_match(
    p1: np.ndarray, p2: np.ndarray, camera1, camera2,
    matches: np.ndarray, config: Dict[str, Any],
) -> np.ndarray:
    """F-RANSAC for undistorted perspective pairs, E-RANSAC otherwise."""
    if len(matches) == 0:
        return matches
    if _all_undistorted_perspective([camera1, camera2]):
        return robust_match_fundamental(p1, p2, matches, config)[1]
    return robust_match_calibrated(p1, p2, camera1, camera2, matches, config)


def robust_match_fundamental(
    p1: np.ndarray, p2: np.ndarray, matches: np.ndarray, config: Dict[str, Any]
) -> Tuple[np.ndarray, np.ndarray]:
    """Filter with fundamental matrix RANSAC (matching.py:780-845)."""
    threshold = config["robust_matching_threshold"]
    x1 = p1[matches[:, 0], :2]
    x2 = p2[matches[:, 1], :2]
    result = robust.ransac_fundamental(x1, x2, threshold, iterations=1000)
    if result.model is None or result.num_inliers < 8:
        return np.zeros((3, 3)), np.zeros((0, 2), dtype=int)
    return np.asarray(result.model), matches[result.inliers_indices]


def robust_match_calibrated(
    p1: np.ndarray, p2: np.ndarray, camera1, camera2,
    matches: np.ndarray, config: Dict[str, Any],
) -> np.ndarray:
    """Filter with essential matrix RANSAC on bearings
    (matching.py:871-903)."""
    threshold = config["robust_matching_calib_threshold"]
    b1 = camera1.bearings_many(p1[matches[:, 0], :2])
    b2 = camera2.bearings_many(p2[matches[:, 1], :2])
    result = robust.ransac_essential(b1, b2, threshold, iterations=1000)
    if result.model is None:
        return np.zeros((0, 2), dtype=int)
    return matches[result.inliers_indices]


def unfilter_matches(matches, m1, m2) -> np.ndarray:
    """Remap masked-feature indices to full-feature indices
    (matching.py:932-938)."""
    i1 = np.flatnonzero(m1)
    i2 = np.flatnonzero(m2)
    return np.array(
        [(i1[match[0]], i2[match[1]]) for match in matches], dtype=int
    )
