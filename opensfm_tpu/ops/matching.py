"""Exact top-2 descriptor matching as blocked matmul (the FLANN killer).

TPU-native replacement for FLANN kNN + BoW word matching
(pyfeatures MatchUsingWords, cv2.flann — SURVEY.md §2.2): squared L2
distances via one MXU matmul, top-2 via lax.top_k, Lowe ratio + symmetry on
device.  Shapes are padded to power-of-two buckets so a few compiles serve
all image pairs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _top2_sqdist(d1: jnp.ndarray, d2: jnp.ndarray, valid2: jnp.ndarray):
    """For each row of d1: indices and squared L2 distances of the two
    nearest rows of d2.  d1 [N, D], d2 [M, D], valid2 [M]."""
    n1 = jnp.sum(d1 * d1, axis=1, keepdims=True)  # [N,1]
    n2 = jnp.sum(d2 * d2, axis=1)  # [M]
    dist = n1 + n2[None, :] - 2.0 * (d1 @ d2.T)
    dist = jnp.where(valid2[None, :], dist, jnp.inf)
    neg_top2, idx = jax.lax.top_k(-dist, 2)
    return idx, -neg_top2  # [N,2] indices, [N,2] distances


def _pad_pow2(x: np.ndarray, minimum: int = 64) -> Tuple[np.ndarray, int]:
    n = len(x)
    n_pad = max(minimum, 1 << int(max(n - 1, 0)).bit_length())
    if n_pad > n:
        pad = np.zeros((n_pad - n,) + x.shape[1:], dtype=x.dtype)
        x = np.concatenate([x, pad])
    return x, n


def match_brute_force_symmetric(
    d1: np.ndarray, d2: np.ndarray, ratio: float, symmetric: bool = True
) -> np.ndarray:
    """Lowe-ratio matches (optionally mutual) between descriptor sets.

    Mirrors matching.py:683-778 (FLANN/brute-force + symmetry) with exact
    top-2 search.  Returns [K, 2] index pairs.
    """
    if len(d1) < 2 or len(d2) < 2:
        return np.zeros((0, 2), dtype=np.int64)
    f1 = np.ascontiguousarray(d1, dtype=np.float32)
    f2 = np.ascontiguousarray(d2, dtype=np.float32)
    f1p, n1 = _pad_pow2(f1)
    f2p, n2 = _pad_pow2(f2)
    valid1 = np.arange(len(f1p)) < n1
    valid2 = np.arange(len(f2p)) < n2

    idx12, dist12 = _top2_sqdist(
        jnp.asarray(f1p), jnp.asarray(f2p), jnp.asarray(valid2)
    )
    idx12 = np.asarray(idx12)[:n1]
    dist12 = np.asarray(dist12)[:n1]
    # Lowe ratio on distances (squared -> ratio on sqrt).
    good12 = np.sqrt(np.maximum(dist12[:, 0], 0)) < ratio * np.sqrt(
        np.maximum(dist12[:, 1], 1e-20)
    )

    if not symmetric:
        rows = np.flatnonzero(good12)
        return np.column_stack([rows, idx12[rows, 0]])

    idx21, dist21 = _top2_sqdist(
        jnp.asarray(f2p), jnp.asarray(f1p), jnp.asarray(valid1)
    )
    idx21 = np.asarray(idx21)[:n2]
    dist21 = np.asarray(dist21)[:n2]
    good21 = np.sqrt(np.maximum(dist21[:, 0], 0)) < ratio * np.sqrt(
        np.maximum(dist21[:, 1], 1e-20)
    )

    matches = []
    best21 = idx21[:, 0]
    for i in np.flatnonzero(good12):
        j = idx12[i, 0]
        if good21[j] and best21[j] == i:
            matches.append((i, j))
    return np.asarray(matches, dtype=np.int64).reshape(-1, 2)
