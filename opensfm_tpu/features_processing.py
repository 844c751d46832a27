"""Feature extraction harness: read images, detect, mask, save.

Mirrors reference `opensfm/features_processing.py:48-344` — the
producer/consumer memory throttling becomes a simple thread pool feeding the
batched device detector (host IO overlaps device compute through JAX's
async dispatch).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Any, Dict, List, Optional

import numpy as np

from opensfm_tpu import features
from opensfm_tpu.features import FeaturesData, SemanticData

logger = logging.getLogger(__name__)


def run_features_processing(data, images: List[str], force: bool) -> None:
    """Extract features for all images (features_processing.py:48-109)."""
    need_words = (
        data.config.get("matcher_type", "").upper() == "WORDS"
        or data.config.get("matching_bow_neighbors", 0) > 0
    )
    to_process = [
        im for im in images if force or not data.features_exist(im)
    ]
    if not to_process:
        logger.info("All features already extracted.")
        if need_words:
            _assign_words(data, images, force)
        return

    read_queue: "queue.Queue" = queue.Queue(maxsize=4)

    def producer() -> None:
        for image in to_process:
            try:
                array = data.load_image(image)
            except Exception as e:
                logger.error("Failed loading %s: %s", image, e)
                array = None
            read_queue.put((image, array))
        read_queue.put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    processed = 0
    while True:
        item = read_queue.get()
        if item is None:
            break
        image, array = item
        if array is None:
            continue
        detect(data, image, array)
        processed += 1
        logger.info("Extracted features for %s (%d/%d)", image, processed,
                    len(to_process))
    thread.join()

    if need_words:
        _assign_words(data, images, force)


def _assign_words(data, images: List[str], force: bool) -> None:
    """Assign each image's descriptors to their closest vocabulary words
    (features_processing.py:269-336).

    The reference maps against a pretrained FLANN vocabulary per image during
    detection; here the vocabulary is trained from the dataset's own
    descriptors (bow.py), so word assignment is a second pass after all
    features exist."""
    from opensfm_tpu import bow

    to_assign = [im for im in images if force or not data.words_exist(im)]
    if not to_assign:
        return
    bows = bow.load_vocabulary(data)
    n_closest = data.config.get("bow_words_to_match", 50)
    for image in to_assign:
        fd = data.load_features(image)
        if fd is None or fd.descriptors is None:
            continue
        words = bows.map_to_words(
            fd.descriptors, n_closest, data.config.get("bow_matcher_type", "FLANN")
        )
        data.save_words(image, words)
        logger.info("Assigned %d-closest words for %s", n_closest, image)


def detect(data, image: str, image_array: np.ndarray) -> None:
    """Detect features for one image, apply masks, sort by scale, save
    (features_processing.py:259-344)."""
    config = data.config
    exif = data.load_exif(image) if data.exif_exists(image) else {}
    is_panorama = exif.get("projection_type") in ("equirectangular", "spherical")

    features_data = features.extract_features(image_array, config, is_panorama)

    # Bake segmentation if requested and available.
    if config.get("features_bake_segmentation"):
        segmentation = data.load_segmentation(image)
        instances = data.load_instances(image)
        if segmentation is not None:
            from opensfm_tpu.features import denormalized_image_coordinates

            px = denormalized_image_coordinates(
                features_data.points[:, :2],
                segmentation.shape[1], segmentation.shape[0],
            )
            xs = np.clip(px[:, 0].astype(int), 0, segmentation.shape[1] - 1)
            ys = np.clip(px[:, 1].astype(int), 0, segmentation.shape[0] - 1)
            seg_values = segmentation[ys, xs]
            inst_values = instances[ys, xs] if instances is not None else None
            features_data.semantic = SemanticData(
                seg_values, inst_values, data.segmentation_labels()
            )

    # Apply the binary mask.
    mask = data.load_features_mask(image, features_data.points[:, :2])
    if mask is not None and len(mask) == len(features_data.points):
        features_data = features_data.mask(mask)

    # Sort by decreasing scale (features_processing.py:314-318).
    if len(features_data.points):
        order = np.argsort(-features_data.points[:, 2])
        features_data = features_data.mask(order)

    data.save_features(image, features_data)
