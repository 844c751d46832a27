"""Essential matrix estimation and relative pose extraction, batched in JAX.

TPU-native equivalent of reference geometry/essential.h and
relative_pose.h: hypothesis generation is an N-point (>=8) linear solve
projected onto the essential manifold (SVD — TPU-supported), pose extraction
tests the four (R, t) decompositions by cheirality, and refinement is a
fixed-iteration Gauss-Newton on the epipolar-geodesic residual.

Convention (matches the reference): bearings x in camera 1, y in camera 2
with y ~ R x + t (world-to-cam2 relative to cam1), E = [t]x R and
y^T E x = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opensfm_tpu.geometry import rotation as rot
from opensfm_tpu.geometry.triangulation import triangulate_two_bearings_midpoint

from opensfm_tpu.ops import linalg as tpu_linalg


def essential_n_points(x: jnp.ndarray, y: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Least-squares essential matrix from N>=8 bearing pairs.

    x, y: [..., N, 3] unit bearings.  Returns [..., 3, 3] projected onto the
    essential manifold (equal singular values), mirroring EssentialNPoints
    (essential.h:167).
    """
    # Row per correspondence: flatten(y x^T) since y^T E x = sum E_jk y_j x_k.
    A = jnp.einsum("...nj,...nk->...njk", y, x).reshape(x.shape[:-1] + (9,))
    if mask is not None:
        A = A * mask[..., None].astype(A.dtype)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[..., -1, :].reshape(x.shape[:-2] + (3, 3))
    # Project to the essential manifold: singular values (s, s, 0).
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) / 2.0
    D = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return (U * D[..., None, :]) @ Vt2


def decompose_essential(E: jnp.ndarray):
    """Four candidate (R, t) with |t| = 1 from E = [t]x R.

    Returns (Rs[..., 4, 3, 3], ts[..., 4, 3]).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    detU = tpu_linalg.det3(U)
    detVt = tpu_linalg.det3(Vt)
    U = U * detU[..., None, None]
    Vt = Vt * detVt[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def relative_pose_from_essential(
    E: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, mask=None
) -> jnp.ndarray:
    """[R|t] with the most cheirality-consistent decomposition
    (RelativePoseFromEssential, relative_pose.h:13).

    x, y: [N, 3] bearing pairs used to vote.  Not batched over E (vmap it).
    """
    Rs, ts = decompose_essential(E)  # [4,3,3], [4,3]

    def count_front(R, t):
        ok, X = triangulate_two_bearings_midpoint(x, y, R, t)
        if mask is not None:
            ok = ok & mask
        return jnp.sum(ok.astype(jnp.int32))

    counts = jax.vmap(count_front)(Rs, ts)
    best = jnp.argmax(counts)
    R = Rs[best]
    t = ts[best]
    return jnp.concatenate([R, t[:, None]], axis=1)  # [3,4]


def epipolar_geodesic_error(
    E: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """asin(y . E x) per pair — EpipolarGeodesic (essential_model.h:22-28)."""
    Ex = jnp.einsum("...ij,...nj->...ni", E, x)
    val = jnp.sum(y * Ex, axis=-1)
    return jnp.arcsin(jnp.clip(val, -1.0, 1.0))


def essential_from_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = [t]x R (unit-normalized translation)."""
    tn = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-15)
    return rot.hat(tn) @ R


def relative_pose_error(Rt: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """1 - mean bearing agreement after midpoint triangulation — the
    RelativePose RANSAC error (relative_pose_model.h:39-65).

    Rt: [3,4]; x, y: [N,3].  Returns [N] errors (1.0 where triangulation
    fails, like the reference).
    """
    R = Rt[..., :3, :3]
    t = Rt[..., :3, 3]
    ok, X = triangulate_two_bearings_midpoint(x, y, R, t)
    px = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-15)
    Xc2 = X @ R.T + t
    py = Xc2 / jnp.maximum(jnp.linalg.norm(Xc2, axis=-1, keepdims=True), 1e-15)
    err = 1.0 - 0.5 * (jnp.sum(px * x, axis=-1) + jnp.sum(py * y, axis=-1))
    return jnp.where(ok, err, 1.0)


def refine_relative_pose(
    Rt: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask=None,
    iterations: int = 10,
) -> jnp.ndarray:
    """Gauss-Newton refinement of [R|t] on the epipolar geodesic residual
    (RelativePoseRefinement, relative_pose.h:155).  Translation is
    renormalized to unit length each step (scale is unobservable)."""
    r0 = rot.matrix_to_rotvec(Rt[:3, :3])
    t0 = Rt[:3, 3]
    t0 = t0 / jnp.maximum(jnp.linalg.norm(t0), 1e-15)
    params0 = jnp.concatenate([r0, t0])
    w = None if mask is None else mask.astype(Rt.dtype)

    def residuals(params):
        R = rot.rotvec_to_matrix(params[:3])
        E = essential_from_pose(R, params[3:6])
        r = epipolar_geodesic_error(E, x, y)
        return r if w is None else r * w

    def body(_, params):
        r = residuals(params)
        J = jax.jacfwd(residuals)(params)  # [N, 6]
        JtJ = J.T @ J
        Jtr = J.T @ r
        step = tpu_linalg.solve_spd(
            JtJ + 1e-9 * jnp.eye(6, dtype=params.dtype), Jtr
        )
        new = params - step
        tn = new[3:6] / jnp.maximum(jnp.linalg.norm(new[3:6]), 1e-15)
        return jnp.concatenate([new[:3], tn])

    params = jax.lax.fori_loop(0, iterations, body, params0)
    R = rot.rotvec_to_matrix(params[:3])
    return jnp.concatenate([R, params[3:6, None]], axis=1)
