"""Exact top-2 descriptor matching as blocked matmul (the FLANN killer).

TPU-native replacement for FLANN kNN + BoW word matching
(pyfeatures MatchUsingWords, cv2.flann — SURVEY.md §2.2): squared L2
distances via one MXU matmul, top-2 via lax.top_k, Lowe ratio + symmetry on
device.  Shapes are padded to power-of-two buckets so a few compiles serve
all image pairs.  Candidate restriction (guided epipolar masks, BoW word
compatibility) is a boolean mask on the full distance matrix — the matmul
stays dense and MXU-shaped instead of the reference's per-feature inverted
file loops.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _top2_sqdist(d1: jnp.ndarray, d2: jnp.ndarray, valid2: jnp.ndarray):
    """For each row of d1: indices and squared L2 distances of the two
    nearest rows of d2.  d1 [N, D], d2 [M, D], valid2 [M].  uint8 inputs
    (uchar-quantized descriptors) upcast on-device — 4x less transfer."""
    d1 = d1.astype(jnp.float32)
    d2 = d2.astype(jnp.float32)
    n1 = jnp.sum(d1 * d1, axis=1, keepdims=True)  # [N,1]
    n2 = jnp.sum(d2 * d2, axis=1)  # [M]
    dist = n1 + n2[None, :] - 2.0 * (d1 @ d2.T)
    dist = jnp.where(valid2[None, :], dist, jnp.inf)
    neg_top2, idx = jax.lax.top_k(-dist, 2)
    return idx, -neg_top2  # [N,2] indices, [N,2] distances


@jax.jit
def _top2_sqdist_masked(
    d1: jnp.ndarray, d2: jnp.ndarray, valid2: jnp.ndarray, mask: jnp.ndarray
):
    """Masked variant: mask [N, M] marks allowed candidate pairs."""
    d1 = d1.astype(jnp.float32)
    d2 = d2.astype(jnp.float32)
    n1 = jnp.sum(d1 * d1, axis=1, keepdims=True)
    n2 = jnp.sum(d2 * d2, axis=1)
    dist = n1 + n2[None, :] - 2.0 * (d1 @ d2.T)
    dist = jnp.where(valid2[None, :] & mask, dist, jnp.inf)
    neg_top2, idx = jax.lax.top_k(-dist, 2)
    return idx, -neg_top2




def _pad_pow2(x: np.ndarray, minimum: int = 64) -> Tuple[np.ndarray, int]:
    n = len(x)
    n_pad = max(minimum, 1 << int(max(n - 1, 0)).bit_length())
    if n_pad > n:
        pad = np.zeros((n_pad - n,) + x.shape[1:], dtype=x.dtype)
        x = np.concatenate([x, pad])
    return x, n


def _pad_mask(mask: np.ndarray, n1_pad: int, n2_pad: int) -> np.ndarray:
    out = np.zeros((n1_pad, n2_pad), dtype=bool)
    out[: mask.shape[0], : mask.shape[1]] = mask
    return out


# Above this many distance-matrix cells the jnp path's [N, M] HBM
# intermediate (cells*4 bytes, read+written around lax.top_k) dominates; the
# fused Pallas kernel streams tiles through VMEM instead.
_PALLAS_MIN_CELLS = 4096 * 4096


def _use_pallas_top2(n1_pad: int, n2_pad: int) -> bool:
    import jax

    if jax.default_backend() != "tpu":
        return False
    from opensfm_tpu.ops.pallas_kernels import top2 as _p

    return (
        n1_pad * n2_pad >= _PALLAS_MIN_CELLS
        and n1_pad % _p.TILE_N == 0
        and n2_pad % _p.TILE_M == 0
    )


def _one_way(
    f1p: np.ndarray, f2p: np.ndarray, n1: int, n2: int,
    ratio: float, mask: Optional[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """(best index, ratio-test pass) for each of the first n1 rows."""
    if mask is not None and mask.shape != (n1, n2):
        raise ValueError(
            f"candidate mask shape {mask.shape} != ({n1}, {n2})"
        )
    if _use_pallas_top2(len(f1p), len(f2p)):
        from opensfm_tpu.ops.pallas_kernels import top2_sqdist_pallas

        pmask = (
            None
            if mask is None
            else jnp.asarray(
                _pad_mask(mask, len(f1p), len(f2p)).astype(np.float32)
            )
        )
        idx2, dist = top2_sqdist_pallas(
            jnp.asarray(f1p), jnp.asarray(f2p), n2, pmask
        )
        idx = np.repeat(np.asarray(idx2)[:n1], 2, axis=1)
        dist = np.asarray(dist)[:n1]
        dist = np.where(np.isinf(dist), np.inf, dist)
        good = np.sqrt(np.maximum(dist[:, 0], 0)) < ratio * np.sqrt(
            np.maximum(dist[:, 1], 1e-20)
        )
        good &= np.isfinite(dist[:, 1])
        return idx[:, 0], good
    valid2 = np.arange(len(f2p)) < n2
    if mask is None:
        idx, dist = _top2_sqdist(
            jnp.asarray(f1p), jnp.asarray(f2p), jnp.asarray(valid2)
        )
    else:
        idx, dist = _top2_sqdist_masked(
            jnp.asarray(f1p), jnp.asarray(f2p), jnp.asarray(valid2),
            jnp.asarray(_pad_mask(mask, len(f1p), len(f2p))),
        )
    idx = np.asarray(idx)[:n1]
    dist = np.asarray(dist)[:n1]
    # Lowe ratio on distances (squared -> ratio on sqrt).  Rows with fewer
    # than two allowed candidates are dropped, like the reference's
    # `len(match) == 2` check (matching.py:751).
    good = np.sqrt(np.maximum(dist[:, 0], 0)) < ratio * np.sqrt(
        np.maximum(dist[:, 1], 1e-20)
    )
    good &= np.isfinite(dist[:, 1])
    return idx[:, 0], good


def match_brute_force_symmetric(
    d1: np.ndarray, d2: np.ndarray, ratio: float, symmetric: bool = True,
    mask12: Optional[np.ndarray] = None, mask21: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Lowe-ratio matches (optionally mutual) between descriptor sets.

    Mirrors matching.py:683-778 (FLANN/brute-force + symmetry) with exact
    top-2 search.  mask12/mask21 restrict candidates per direction (guided
    epipolar or word-compatibility masks).  Returns [K, 2] index pairs.
    """
    if len(d1) < 2 or len(d2) < 2:
        return np.zeros((0, 2), dtype=np.int64)
    f1 = np.ascontiguousarray(d1, dtype=np.float32)
    f2 = np.ascontiguousarray(d2, dtype=np.float32)
    f1p, n1 = _pad_pow2(f1)
    f2p, n2 = _pad_pow2(f2)

    best12, good12 = _one_way(f1p, f2p, n1, n2, ratio, mask12)

    if not symmetric:
        rows = np.flatnonzero(good12)
        return np.column_stack([rows, best12[rows]]).astype(np.int64)

    if mask21 is None and mask12 is not None:
        mask21 = mask12.T
    best21, good21 = _one_way(f2p, f1p, n2, n1, ratio, mask21)

    rows = np.flatnonzero(good12)
    js = best12[rows]
    mutual = good21[js] & (best21[js] == rows)
    return np.column_stack([rows[mutual], js[mutual]]).astype(np.int64)


def match_brute_force(
    d1: np.ndarray, d2: np.ndarray, ratio: float,
    mask12: Optional[np.ndarray] = None,
) -> np.ndarray:
    """One-way Lowe-ratio matching (matching.py:723-756)."""
    return match_brute_force_symmetric(
        d1, d2, ratio, symmetric=False, mask12=mask12
    )


def word_compatibility_mask(
    words1: np.ndarray, words2: np.ndarray, num_checks: int
) -> np.ndarray:
    """Candidate mask for WORDS matching: allow (i, j) when feature j's best
    word is among feature i's first `num_checks` words
    (pyfeatures match_using_words semantics — SURVEY.md §2.2).

    Host-side bitset gather: build the [N1, vocab] membership table with one
    scatter, then read it at the best word of every j — O(N1*C + N1*N2) in
    numpy with no device round-trip (the mask is consumed by the padded
    device matcher, which is where the FLOPs are)."""
    w1 = np.asarray(words1[:, : max(1, num_checks)], dtype=np.int64)
    best2 = np.asarray(words2[:, 0], dtype=np.int64)
    vocab = int(max(w1.max(initial=0), best2.max(initial=0))) + 1
    member = np.zeros((len(w1), vocab), dtype=bool)
    member[np.arange(len(w1))[:, None], w1] = True
    return member[:, best2]
