"""Batched, differentiable rotation math (angle-axis <-> matrix) in JAX.

TPU-native replacement for the Rodrigues/ceres rotation helpers used by the
reference's pose machinery (reference: opensfm/src/geometry/pose.h,
transformations_functions.h:1-320).  Every function broadcasts over leading
batch dimensions and is safe to differentiate at the identity (guarded
small-angle Taylor branches with nan-free gradients).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS2 = 1e-14


def hat(r: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix of r[..., 3] -> [..., 3, 3]."""
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rotvec_to_matrix(r: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues).

    R = I + sinc(t) K + ((1-cos t)/t^2) K^2  with K = hat(r), t = |r|.
    Small angles use 2nd-order Taylor terms; the double-where trick keeps
    gradients finite at r = 0.
    """
    theta2 = jnp.sum(r * r, axis=-1)
    small = theta2 < _EPS2
    # Guard the argument so sqrt/div never see 0 on the branch not taken.
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    K = hat(r)
    # K^2 = r r^T - |r|^2 I: avoids a batched 3x3 matmul, which lowers to
    # one tiny MXU dispatch per element on TPU.
    rrT = r[..., :, None] * r[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    K2 = rrT - theta2[..., None, None] * eye
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def matrix_to_rotvec(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> angle-axis [..., 3].

    Via unit quaternion extraction (numerically stable across the full
    rotation range, including angles near pi).
    """
    q = matrix_to_quat(R)
    return quat_to_rotvec(q)


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), w >= 0.

    Branch-free Shepperd method: compute all four candidate quaternions and
    pick the best-conditioned one, which vectorizes cleanly on TPU.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, scaled by 4*q_i^2 = 1 + 2*m_ii - tr (or 1 + tr for w).
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4, 4]
    # Leading element of each candidate is 4*q_i^2; choose the largest.
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> angle-axis [..., 3].

    Differentiable at the identity: the norm is computed through a guarded
    sqrt so gradients stay finite at v = 0.
    """
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    n2 = jnp.sum(v * v, axis=-1)
    small = n2 < 1e-18
    safe_n2 = jnp.where(small, jnp.ones_like(n2), n2)
    sin_half = jnp.sqrt(safe_n2)
    half = jnp.arctan2(jnp.where(small, jnp.zeros_like(sin_half), sin_half), w)
    # theta/sin(theta/2) ~ 2 + theta^2/12 for small angles
    scale = jnp.where(small, 2.0 + (2.0 * half) ** 2 / 12.0, 2.0 * half / sin_half)
    return v * scale[..., None]


def rotate(r: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Rotate points x[..., 3] by angle-axis r[..., 3] without forming R.

    Rodrigues applied directly to the vector:
    x' = x cos t + (k×x) sin t + k (k·x)(1-cos t), k = r/t.
    Cheaper than materializing the matrix inside vmapped residuals.
    """
    theta2 = jnp.sum(r * r, axis=-1, keepdims=True)
    small = theta2 < _EPS2
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe2)
    cos_t = jnp.where(small, 1.0 - theta2 / 2.0, jnp.cos(theta))
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    # (1 - cos t) / t^2
    ccos = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    rx = jnp.cross(r, x)
    rdx = jnp.sum(r * x, axis=-1, keepdims=True)
    return x * cos_t + rx * sinc + r * (rdx * ccos)
