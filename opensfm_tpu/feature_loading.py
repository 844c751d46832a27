"""Cached feature loading: masked views, bearings, descriptor indices.

Mirrors reference `opensfm/feature_loading.py:21-214` (FeatureLoader with
lru caches) + the singleton in feature_loader.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from opensfm_tpu.features import FeaturesData


class FeatureLoader:
    """lru-cached accessors over per-image feature files."""

    def clear_cache(self) -> None:
        self._load_all_data_unmasked.cache_clear()
        self._load_all_data_masked.cache_clear()

    def load_mask(self, data, image: str) -> Optional[np.ndarray]:
        features_data = self._load_all_data_unmasked(data, image)
        if features_data is None:
            return None
        return data.load_features_mask(image, features_data.points[:, :2])

    def load_points_colors_segmentations_instances(self, data, image: str):
        features_data = self._load_all_data_masked(data, image)
        if features_data is None:
            return None
        return (
            features_data.points,
            features_data.colors,
            features_data.semantic.segmentation if features_data.semantic else None,
            features_data.semantic.instances if features_data.semantic else None,
        )

    def load_all_data(
        self, data, image: str, masked: bool
    ) -> Optional[FeaturesData]:
        if masked:
            return self._load_all_data_masked(data, image)
        return self._load_all_data_unmasked(data, image)

    def load_bearings(
        self, data, image: str, masked: bool, camera
    ) -> Optional[np.ndarray]:
        """Unit bearings of the (masked) features (feature_loading.py:88)."""
        features_data = self.load_all_data(data, image, masked)
        if features_data is None:
            return None
        return camera.bearings_many(features_data.points[:, :2])

    def load_features_index(
        self, data, image: str, masked: bool
    ) -> Optional[Tuple[FeaturesData, np.ndarray]]:
        """(features, descriptor matrix) — the exact-NN 'index'
        (feature_loading.py:176)."""
        features_data = self.load_all_data(data, image, masked)
        if features_data is None or features_data.descriptors is None:
            return None
        desc = features_data.descriptors
        # Keep uchar-quantized descriptors uint8: the device matcher
        # upcasts after upload (4x less host->device traffic).
        dtype = np.uint8 if desc.dtype == np.uint8 else np.float32
        return features_data, np.ascontiguousarray(desc, dtype=dtype)

    def load_words(self, data, image: str, masked: bool) -> Optional[np.ndarray]:
        if not data.words_exist(image):
            return None
        words = data.load_words(image)
        if masked:
            mask = self.load_mask(data, image)
            if mask is not None:
                words = words[mask]
        return words

    @lru_cache(maxsize=200)
    def _load_all_data_unmasked(self, data, image: str) -> Optional[FeaturesData]:
        return data.load_features(image)

    @lru_cache(maxsize=200)
    def _load_all_data_masked(self, data, image: str) -> Optional[FeaturesData]:
        features_data = self._load_all_data_unmasked(data, image)
        if features_data is None:
            return None
        mask = data.load_features_mask(image, features_data.points[:, :2])
        if mask is not None and len(mask) == len(features_data.points):
            if not mask.all():
                return features_data.mask(mask)
        return features_data
