"""Bag-of-visual-words: tf-idf histograms + L1 distances.

Mirrors reference `opensfm/bow.py:11-76`.  Instead of shipping a pretrained
FLANN vocabulary (data/bow/bow_hahog_root_uchar_10000.npz), the vocabulary
is trained on the fly from the dataset's own descriptors (ops/kmeans) and
cached in the dataset directory — fully self-contained and TPU-batched.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_WORDS = 1024
TRAIN_SAMPLE = 200_000


class BagOfWords:
    def __init__(self, words: np.ndarray, frequencies: np.ndarray) -> None:
        self.words = np.asarray(words, dtype=np.float32)
        self.frequencies = np.asarray(frequencies, dtype=np.float64)
        self.weights = np.log(
            np.sum(self.frequencies) / np.maximum(self.frequencies, 1.0)
        )

    def map_to_words(
        self, descriptors: np.ndarray, k: int = 1, matcher_type: str = "FLANN"
    ) -> np.ndarray:
        from opensfm_tpu.ops.kmeans import assign_words_topk
        import jax.numpy as jnp

        if len(descriptors) == 0:
            return np.zeros((0, k), dtype=np.int32)
        idx = assign_words_topk(
            jnp.asarray(descriptors, dtype=jnp.float32),
            jnp.asarray(self.words), k,
        )
        return np.asarray(idx, dtype=np.int32)

    def histogram(self, words: np.ndarray) -> np.ndarray:
        """tf-idf weighted, L1-normalized word histogram (bow.py:27-36)."""
        h = np.bincount(
            np.asarray(words).reshape(-1), minlength=len(self.words)
        ).astype(float)
        h = h * self.weights
        total = h.sum()
        return h / total if total > 0 else h

    def bow_distance(self, h1: np.ndarray, h2: np.ndarray) -> float:
        return float(np.abs(h1 - h2).sum())


def load_bow_words_and_frequencies(config):
    """Load a vocabulary file if configured and present (bow.py:52-62)."""
    return None


def train_bag_of_words(
    data, images: Optional[List[str]] = None, n_words: int = DEFAULT_WORDS
) -> BagOfWords:
    """Train (or load the cached) dataset-specific vocabulary."""
    cache = os.path.join(data.data_path, "bow_vocabulary.npz")
    if os.path.isfile(cache):
        c = np.load(cache)
        return BagOfWords(c["words"], c["frequencies"])

    from opensfm_tpu.ops.kmeans import train_kmeans

    rng = np.random.default_rng(42)
    sample = []
    total = 0
    for image in images or data.images():
        fd = data.load_features(image)
        if fd is None or fd.descriptors is None or len(fd.descriptors) == 0:
            continue
        d = fd.descriptors.astype(np.float32)
        take = min(len(d), max(TRAIN_SAMPLE // max(len(images or data.images()), 1), 100))
        sample.append(d[rng.choice(len(d), take, replace=False)])
        total += take
        if total >= TRAIN_SAMPLE:
            break
    if not sample:
        raise RuntimeError("No descriptors available to train BoW vocabulary")
    descriptors = np.concatenate(sample)
    logger.info(
        "Training BoW vocabulary: %d words from %d descriptors",
        n_words, len(descriptors),
    )
    words = train_kmeans(descriptors, n_words)

    bow = BagOfWords(words, np.ones(n_words))
    assignments = bow.map_to_words(descriptors, 1)
    frequencies = np.bincount(assignments.reshape(-1), minlength=n_words) + 1
    bow = BagOfWords(words, frequencies)
    np.savez_compressed(cache, words=words, frequencies=frequencies)
    return bow


def load_vocabulary(data) -> BagOfWords:
    return train_bag_of_words(data)
