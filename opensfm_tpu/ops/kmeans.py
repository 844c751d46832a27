"""Batched Lloyd k-means on device (vocabulary training).

Replaces the reference's pretrained FLANN vocabularies: visual words are
trained on the dataset's own descriptors with matmul-based assignment —
one MXU matmul per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_clusters", "iterations"))
def _lloyd(x: jnp.ndarray, init: jnp.ndarray, n_clusters: int, iterations: int):
    def body(_, centers):
        # Squared distances via matmul; assign; recompute means.
        d = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * x @ centers.T
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)  # [N,K]
        counts = jnp.sum(one_hot, axis=0)  # [K]
        sums = one_hot.T @ x  # [K,D]
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        # Keep empty clusters where they were.
        return jnp.where(counts[:, None] > 0, new_centers, centers)

    return jax.lax.fori_loop(0, iterations, body, init)


def train_kmeans(
    descriptors: np.ndarray, n_clusters: int, iterations: int = 30, seed: int = 42
) -> np.ndarray:
    """K-means centers for descriptor vocabulary training."""
    x = np.asarray(descriptors, dtype=np.float32)
    rng = np.random.default_rng(seed)
    if len(x) < n_clusters:
        reps = int(np.ceil(n_clusters / max(len(x), 1)))
        x = np.tile(x, (reps, 1))
    init = x[rng.choice(len(x), n_clusters, replace=False)]
    centers = _lloyd(jnp.asarray(x), jnp.asarray(init), n_clusters, iterations)
    return np.asarray(centers)


@partial(jax.jit, static_argnames=("k",))
def assign_words_topk(descriptors: jnp.ndarray, centers: jnp.ndarray, k: int = 1):
    """Indices of the k nearest words per descriptor (matmul + top_k)."""
    d = (
        jnp.sum(descriptors * descriptors, axis=1, keepdims=True)
        - 2.0 * descriptors @ centers.T
        + jnp.sum(centers * centers, axis=1)[None, :]
    )
    _, idx = jax.lax.top_k(-d, k)
    return idx
