"""Triangulation: midpoint / DLT solvers + point refinement, batched in JAX.

TPU-native equivalent of reference geometry/triangulation.h and
src/triangulation.cc:1-235.  All functions are mask-aware (padded tracks keep
static shapes) and vmap over leading batch dimensions; validity checks
(min ray angle, angular reprojection threshold, min depth) reproduce the
reference's accept/reject semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opensfm_tpu.ops import linalg as tpu_linalg


def angle_between_vectors(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Unsigned angle, 0 when |cos| >= 1 (triangulation.cc:67-74)."""
    c = jnp.sum(u * v, axis=-1) / jnp.sqrt(
        jnp.sum(u * u, axis=-1) * jnp.sum(v * v, axis=-1)
    )
    return jnp.where(jnp.abs(c) >= 1.0, 0.0, jnp.arccos(jnp.clip(c, -1.0, 1.0)))


def _pairwise_angle_ok(bearings: jnp.ndarray, mask: jnp.ndarray, min_angle: float):
    """True if ANY valid bearing pair subtends an angle in [min, pi-min]."""
    dots = bearings @ bearings.T  # unit bearings assumed
    ang = jnp.where(jnp.abs(dots) >= 1.0, 0.0, jnp.arccos(jnp.clip(dots, -1.0, 1.0)))
    pair_mask = mask[:, None] & mask[None, :]
    k = bearings.shape[0]
    pair_mask = pair_mask & ~jnp.eye(k, dtype=bool)
    ok = (ang >= min_angle) & (ang <= jnp.pi - min_angle) & pair_mask
    return jnp.any(ok)


def triangulate_bearings_midpoint(
    centers: jnp.ndarray,  # [K, 3] camera origins (world)
    bearings: jnp.ndarray,  # [K, 3] unit bearings (world)
    mask: jnp.ndarray,  # [K] bool — valid rays
    thresholds: jnp.ndarray,  # [K] per-ray angular reprojection threshold
    min_angle: float,
    min_depth: float = 1e-3,
):
    """Least-squares midpoint of K rays + validity (triangulation.cc:138-178).

    Solves sum_i (I - b_i b_i^T) (X - o_i) = 0.  Returns (ok, X).
    """
    maskf = mask.astype(centers.dtype)[:, None]
    b = bearings * maskf
    # A = sum (I - b b^T), rhs = sum (I - b b^T) o
    eye = jnp.eye(3, dtype=centers.dtype)
    BBt = jnp.einsum("ki,kj->kij", b, b)
    P = maskf[..., None] * eye - BBt  # [K,3,3]
    A = jnp.sum(P, axis=0)
    rhs = jnp.einsum("kij,kj->i", P, centers)
    X = tpu_linalg.solve3(A + 1e-12 * eye, rhs)

    angle_ok = _pairwise_angle_ok(bearings, mask, min_angle)
    rays = X[None, :] - centers
    ang_err = angle_between_vectors(rays, bearings)
    depth = jnp.sum(rays * bearings, axis=-1)
    per_ray_ok = (ang_err <= thresholds) & (depth >= min_depth)
    ok = angle_ok & jnp.all(per_ray_ok | ~mask)
    return ok, X


def triangulate_two_bearings_midpoint(
    b1: jnp.ndarray, b2: jnp.ndarray, rotation: jnp.ndarray, translation: jnp.ndarray
):
    """Closed-form two-ray midpoint, batched over leading dims.

    Camera 1 at origin with bearings b1; camera 2 with world-to-cam [R|t]
    (center -R^T t, bearings R^T b2), mirroring
    TriangulateTwoBearingsMidpointMany (triangulation.cc:180-194).
    Returns (ok, X[...,3]) — ok is False when rays are near-parallel or the
    midpoint lies behind either camera.
    """
    o2 = -rotation.T @ translation
    b2w = b2 @ rotation  # R^T b2 for each row
    # Solve for depths [l1, l2]: l1*b1 - l2*b2w = o2 (least squares 2x2).
    a11 = jnp.sum(b1 * b1, axis=-1)
    a12 = -jnp.sum(b1 * b2w, axis=-1)
    a22 = jnp.sum(b2w * b2w, axis=-1)
    r1 = jnp.sum(b1 * o2, axis=-1)
    r2 = -jnp.sum(b2w * o2, axis=-1)
    det = a11 * a22 - a12 * a12
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    l1 = (a22 * r1 - a12 * r2) / safe_det
    l2 = (-a12 * r1 + a11 * r2) / safe_det
    X = 0.5 * (b1 * l1[..., None] + (o2 + b2w * l2[..., None]))
    ok = (jnp.abs(det) >= 1e-12) & (l1 > 0) & (l2 > 0)
    return ok, X


def triangulate_bearings_dlt(
    Rts: jnp.ndarray,  # [K, 3, 4] world-to-camera matrices
    bearings: jnp.ndarray,  # [K, 3] unit bearings (camera frames)
    mask: jnp.ndarray,  # [K]
    threshold: float,
    min_angle: float,
    min_depth: float = 1e-3,
):
    """Homogeneous DLT over K views + validity (triangulation.cc:76-136)."""
    # Rows: x*P3 - z*P1, y*P3 - z*P2 per view.
    P1, P2, P3 = Rts[:, 0, :], Rts[:, 1, :], Rts[:, 2, :]
    x, y, z = bearings[:, 0:1], bearings[:, 1:2], bearings[:, 2:3]
    rows = jnp.concatenate([x * P3 - z * P1, y * P3 - z * P2], axis=0)  # [2K,4]
    rows_mask = jnp.concatenate([mask, mask]).astype(rows.dtype)[:, None]
    A = rows * rows_mask
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Xh = Vt[-1]
    X = Xh[:3] / jnp.where(jnp.abs(Xh[3]) < 1e-15, 1e-15, Xh[3])

    world_bearings = jnp.einsum("kji,kj->ki", Rts[:, :, :3], bearings)
    angle_ok = _pairwise_angle_ok(
        world_bearings / jnp.linalg.norm(world_bearings, axis=-1, keepdims=True),
        mask,
        min_angle,
    )
    proj = jnp.einsum("kij,j->ki", Rts, jnp.append(X, 1.0))
    ang_err = angle_between_vectors(proj, bearings)
    depth = jnp.sum(proj * bearings, axis=-1)
    per_ray_ok = (ang_err <= threshold) & (depth >= min_depth)
    ok = angle_ok & jnp.all(per_ray_ok | ~mask)
    return ok, X


def point_refinement(
    centers: jnp.ndarray,  # [K, 3]
    bearings: jnp.ndarray,  # [K, 3] unit
    point: jnp.ndarray,  # [3]
    mask: jnp.ndarray,  # [K]
    iterations: int = 10,
):
    """Gauss-Newton refinement of a 3D point minimizing bearing residuals
    r_i = normalize(X - o_i) - b_i  (PointRefinement, triangulation.cc:222-234).
    Fixed iteration count; LM damping keeps steps finite for degenerate rays.
    """
    maskf = mask.astype(point.dtype)

    def body(_, X):
        v = X[None, :] - centers  # [K,3]
        norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        norm = jnp.maximum(norm, 1e-12)
        n = v / norm
        r = (n - bearings) * maskf[:, None]  # [K,3]
        # d normalize(v) / dv = (I - n n^T) / |v|
        eye = jnp.eye(3, dtype=X.dtype)
        J = (eye[None] - jnp.einsum("ki,kj->kij", n, n)) / norm[..., None]
        J = J * maskf[:, None, None]
        JtJ = jnp.einsum("kij,kil->jl", J, J)
        Jtr = jnp.einsum("kij,ki->j", J, r)
        step = tpu_linalg.solve3(JtJ + 1e-9 * eye, Jtr)
        return X - step

    return jax.lax.fori_loop(0, iterations, body, point)


def epipolar_angle_two_bearings_many(
    bearings1: jnp.ndarray,  # [N1, 3]
    bearings2: jnp.ndarray,  # [N2, 3]
    rotation: jnp.ndarray,  # [3, 3]
    translation: jnp.ndarray,  # [3]
):
    """Symmetric epipolar angle matrix [N1, N2]
    (EpipolarAngleTwoBearingsMany, triangulation.cc:196-220).  Used by guided
    matching: one big matmul-shaped op, ideal for the MXU.

    Convention: [R|t] world-to-cam2 relative to cam1 (y ~ R x + t); the
    epipole direction in cam1's frame is the second camera's center
    -R^T t."""
    epipole = -(rotation.T @ translation)
    t = epipole / jnp.linalg.norm(epipole)
    b2w = bearings2 @ rotation  # R^T applied to each row -> cam1 frame
    epi1 = jnp.cross(jnp.broadcast_to(t, bearings1.shape), bearings1)
    epi1 = epi1 / jnp.linalg.norm(epi1, axis=-1, keepdims=True)
    epi2 = jnp.cross(jnp.broadcast_to(t, b2w.shape), b2w)
    epi2 = epi2 / jnp.linalg.norm(epi2, axis=-1, keepdims=True)
    sym = (jnp.abs(epi1 @ b2w.T) + jnp.abs(bearings1 @ epi2.T)) / 2.0
    return jnp.pi / 2.0 - jnp.arccos(jnp.clip(sym, -1.0, 1.0))
