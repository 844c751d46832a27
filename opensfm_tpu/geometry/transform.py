"""Point-set registration: rotation (Kabsch) and similarity (Umeyama).

Equivalent of reference geometry/transform.h (`RotationBetweenPoints`,
`SimilarityBetweenPoints`) used by the relative-rotation and similarity
RANSAC models and submodel alignment.  Batched (leading dims) and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp

from opensfm_tpu.ops import linalg as tpu_linalg


def _proper_rotation_from_svd(U, Vt):
    """Closest rotation U @ diag(1,1,det) @ Vt with det = +1."""
    d = tpu_linalg.det3(U @ Vt)
    D = jnp.stack(
        [jnp.ones_like(d), jnp.ones_like(d), d], axis=-1
    )
    return (U * D[..., None, :]) @ Vt


def rotation_between_points(x: jnp.ndarray, y: jnp.ndarray, mask=None):
    """Rotation R minimizing sum ||R x_i - y_i||^2 (Kabsch).

    x, y: [..., N, 3].  Returns [..., 3, 3].
    """
    if mask is not None:
        w = mask.astype(x.dtype)[..., None]
        x = x * w
        y = y * w
    H = jnp.swapaxes(x, -1, -2) @ y  # [...,3,3] = sum x_i y_i^T
    U, _, Vt = jnp.linalg.svd(H)
    # R = V diag(1,1,det(VU^T)) U^T maps x -> y
    R = _proper_rotation_from_svd(jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2))
    return R


def similarity_between_points(x: jnp.ndarray, y: jnp.ndarray, mask=None):
    """Umeyama similarity: (s, R, t) minimizing sum ||s R x_i + t - y_i||^2.

    x, y: [..., N, 3].  Returns 4x4 homogeneous transform [..., 4, 4]
    mapping x into y, matching the reference Similarity RANSAC model's
    `Type = Eigen::Matrix4d`.
    """
    if mask is not None:
        w = mask.astype(x.dtype)
    else:
        w = jnp.ones(x.shape[:-1], dtype=x.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)[..., None]  # [...,1,1]
    wx = w[..., None]

    mx = jnp.sum(x * wx, axis=-2, keepdims=True) / n
    my = jnp.sum(y * wx, axis=-2, keepdims=True) / n
    xc = (x - mx) * wx
    yc = (y - my) * wx
    var_x = jnp.sum(xc * xc, axis=(-1, -2)) / jnp.squeeze(n, (-1, -2))
    H = (jnp.swapaxes(xc, -1, -2) @ yc) / n
    U, S, Vt = jnp.linalg.svd(H)
    d = tpu_linalg.det3(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    R = (jnp.swapaxes(Vt, -1, -2) * D[..., None, :]) @ jnp.swapaxes(U, -1, -2)
    scale = jnp.sum(S * D, axis=-1) / jnp.maximum(var_x, 1e-18)
    t = jnp.squeeze(my, -2) - scale[..., None] * jnp.einsum(
        "...ij,...j->...i", R, jnp.squeeze(mx, -2)
    )

    T = jnp.zeros(x.shape[:-2] + (4, 4), dtype=x.dtype)
    T = T.at[..., :3, :3].set(scale[..., None, None] * R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
