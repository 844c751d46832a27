"""Bag-of-visual-words: tf-idf histograms + L1 distances.

Mirrors reference `opensfm/bow.py:11-76` including the pretrained
vocabulary path: a shipped vocabulary (``opensfm_tpu/data/bow/``, named by
``config["bow_file"]`` like the reference's
``data/bow/bow_hahog_root_uchar_10000.npz``) is loaded when present —
first from the dataset directory (user override), then from the package
data directory.  When neither exists the vocabulary is trained on the fly
from the dataset's own descriptors (ops/kmeans) and cached in the dataset
directory — fully self-contained and TPU-batched.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_WORDS = 1024
TRAIN_SAMPLE = 200_000

PACKAGE_VOCAB_DIR = os.path.join(os.path.dirname(__file__), "data", "bow")


def resolve_vocabulary_path(filename: str, data=None) -> Optional[str]:
    """Find a vocabulary file: dataset dir first (user override), then the
    package data dir (reference: opensfm/context.py BOW_PATH)."""
    if not filename:
        return None
    candidates = []
    if data is not None:
        candidates.append(os.path.join(data.data_path, filename))
    candidates.append(os.path.join(PACKAGE_VOCAB_DIR, filename))
    for path in candidates:
        if os.path.isfile(path):
            return path
    return None


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


def load_bow_words_and_frequencies(config, data=None):
    """Load the configured pretrained vocabulary if present (reference
    bow.py:52-62 ``load_bow_words_and_frequencies``)."""
    path = resolve_vocabulary_path(config.get("bow_file", ""), data)
    if path is None:
        return None
    c = np.load(path)
    logger.debug("Loaded BoW vocabulary %s", path)
    return c["words"].astype(np.float32), c["frequencies"]


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


def descriptor_domain_matches_packaged_vocab(config) -> bool:
    """The packaged vocabularies are trained on root+uchar HAHOG/SIFT
    descriptors (uint8 scale, x362 quantization).  Float-scale configs
    (feature_root off, SIFT_CV/ORB/AKAZE/SURF) live on a different scale
    where those centroids degrade pair ranking — train locally instead."""
    feature_type = str(config.get("feature_type", "HAHOG")).upper()
    return (
        feature_type in ("HAHOG", "SIFT")
        and bool(config.get("feature_root", True))
        and bool(config.get("hahog_normalize_to_uchar", True))
    )


def load_vocabulary(data) -> BagOfWords:
    """Pretrained vocabulary when available (config["bow_file"], reference
    semantics), else the dataset-trained one.

    A dataset-local vocabulary file always wins (explicit user override);
    the packaged vocabulary is used only when the descriptor domain matches
    what it was trained on (root-uchar HAHOG/SIFT)."""
    filename = data.config.get("bow_file", "")
    local = (
        os.path.join(data.data_path, filename) if filename else None
    )
    if local and os.path.isfile(local):
        c = np.load(local)
        return BagOfWords(c["words"].astype(np.float32), c["frequencies"])
    if descriptor_domain_matches_packaged_vocab(data.config):
        pretrained = load_bow_words_and_frequencies(data.config, data)
        if pretrained is not None:
            return BagOfWords(*pretrained)
    return train_bag_of_words(data)
