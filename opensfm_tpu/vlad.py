"""VLAD image descriptors + distances.

Mirrors reference `opensfm/vlad.py:11-81` + the C++ kernels
(`compute_vlad_descriptor`/`compute_vlad_distances`, features/matching.h):
residual aggregation and the distance matrix are batched matmuls.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Iterable, List, Optional, Set, Tuple

import numpy as np

logger = logging.getLogger(__name__)

VLAD_WORDS = 64


def unnormalized_vlad(features: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Sum of residuals to each feature's nearest center (vlad.py:11-22)."""
    from opensfm_tpu.ops.kmeans import assign_words_topk
    import jax.numpy as jnp

    assignments = np.asarray(
        assign_words_topk(
            jnp.asarray(features, dtype=jnp.float32),
            jnp.asarray(centers, dtype=jnp.float32), 1,
        )
    )[:, 0]
    vlad = np.zeros(centers.shape, dtype=np.float64)
    for i in range(centers.shape[0]):
        mask = assignments == i
        if mask.any():
            vlad[i] = (features[mask] - centers[i]).sum(axis=0)
    return vlad.reshape(-1)


def signed_square_root_normalize(v: np.ndarray) -> np.ndarray:
    """SSR + L2 normalization (vlad.py:25-32)."""
    v = np.sign(v) * np.sqrt(np.abs(v))
    norm = np.linalg.norm(v)
    return v / norm if norm > 0 else v


def vlad_distances(
    image: str, other_images: Iterable[str], histograms: Dict[str, np.ndarray]
) -> Tuple[str, List[float], List[str]]:
    """L2 distances from one image to others (vlad.py:35-51)."""
    if image not in histograms:
        return image, [], []
    distances = []
    others = []
    h = histograms[image]
    for other in other_images:
        if other != image and other in histograms:
            distances.append(float(np.linalg.norm(h - histograms[other])))
            others.append(other)
    return image, distances, others


class VladCache:
    """Centers + per-image VLAD histograms (vlad.py:54-81)."""

    def __init__(self) -> None:
        self._centers: Optional[np.ndarray] = None
        self._histograms: Dict[str, np.ndarray] = {}

    def clear_cache(self) -> None:
        self._centers = None
        self._histograms = {}

    def load_words(self, data) -> np.ndarray:
        if self._centers is None:
            from opensfm_tpu.bow import (
                descriptor_domain_matches_packaged_vocab,
                resolve_vocabulary_path,
            )

            # Precedence: (1) an existing dataset-local trained cache —
            # keeps neighbor ordering stable for datasets processed before
            # the packaged vocabulary shipped; (2) the pretrained vocabulary
            # (config["vlad_file"], reference vlad.py:57 load_words) when
            # the descriptor domain matches it; (3) train locally.
            cache = os.path.join(data.data_path, "vlad_vocabulary.npz")
            filename = data.config.get("vlad_file", "")
            local = os.path.join(data.data_path, filename) if filename else ""
            if local and os.path.isfile(local):
                # Explicit user-supplied vocabulary always wins.
                self._centers = np.load(local)["words"].astype(np.float32)
                return self._centers
            pretrained = (
                resolve_vocabulary_path(filename, data)
                if descriptor_domain_matches_packaged_vocab(data.config)
                else None
            )
            if os.path.isfile(cache):
                self._centers = np.load(cache)["words"]
            elif pretrained is not None:
                self._centers = np.load(pretrained)["words"].astype(np.float32)
            else:
                from opensfm_tpu.bow import TRAIN_SAMPLE
                from opensfm_tpu.ops.kmeans import train_kmeans

                rng = np.random.default_rng(7)
                sample = []
                for image in data.images():
                    fd = data.load_features(image)
                    if fd is None or fd.descriptors is None:
                        continue
                    d = fd.descriptors.astype(np.float32)
                    take = min(len(d), 2000)
                    sample.append(d[rng.choice(len(d), take, replace=False)])
                descriptors = np.concatenate(sample)
                self._centers = train_kmeans(descriptors, VLAD_WORDS)
                np.savez_compressed(cache, words=self._centers)
        return self._centers

    def vlad_histogram(self, data, image: str) -> Optional[np.ndarray]:
        if image not in self._histograms:
            from opensfm_tpu import feature_loader

            features_data = feature_loader.instance.load_all_data(
                data, image, masked=True
            )
            if features_data is None or features_data.descriptors is None:
                return None
            words = self.load_words(data)
            v = unnormalized_vlad(
                features_data.descriptors.astype(np.float64), words
            )
            self._histograms[image] = signed_square_root_normalize(v)
        return self._histograms[image]


instance = VladCache()
