"""Absolute pose solvers: P3P and N-point refinement, batched in JAX.

TPU-native equivalent of reference geometry/absolute_pose.h
(`AbsolutePoseThreePoints`:16 — the Ke-Roumeliotis algebraic P3P,
`TranslationBetweenPoints`:125, `AbsolutePoseNPoints`:145,
`AbsolutePoseNPointsKnownRotation`:192).  The P3P quartic is solved with the
batched Durand-Kerner iteration (polynomial.py) instead of the reference's
closed-form quartic, keeping everything vmappable on TPU; every step is
branch-free.

Convention: bearings b (unit, camera frame), world points P, pose [R|t]
world-to-camera so that b ~ normalize(R P + t).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opensfm_tpu.geometry import rotation as rot
from opensfm_tpu.geometry.polynomial import real_roots

from opensfm_tpu.ops import linalg as tpu_linalg


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-15)


def _closest_rotation(M):
    U, _, Vt = jnp.linalg.svd(M)
    d = tpu_linalg.det3(U @ Vt)
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    return (U * D[..., None, :]) @ Vt


def p3p(bearings: jnp.ndarray, points: jnp.ndarray):
    """Algebraic P3P: up to 4 camera poses from 3 bearing<->point pairs.

    bearings: [3, 3] unit camera-frame bearings; points: [3, 3] world points.
    Returns (Rts[4, 3, 4] world-to-camera, valid[4]).
    Mirrors AbsolutePoseThreePoints (absolute_pose.h:16-122).
    """
    b1, b2, b3 = bearings[0], bearings[1], bearings[2]
    p1, p2, p3 = points[0], points[1], points[2]

    k1 = _normalize(p1 - p2)
    k3 = _normalize(jnp.cross(b1, b2))

    u1 = p1 - p3
    u2 = p2 - p3
    v1 = jnp.cross(b1, b3)
    v2 = jnp.cross(b2, b3)

    u1_k1 = jnp.cross(u1, k1)
    sigma = jnp.linalg.norm(u1_k1)
    safe_sigma = jnp.maximum(sigma, 1e-15)
    k3_second = u1_k1 / safe_sigma

    k3_b3 = jnp.dot(k3, b3)
    b1_b2 = jnp.linalg.norm(jnp.cross(b1, b2))
    b1_dot_b2 = jnp.dot(b1, b2)

    f11 = sigma * k3_b3
    f21 = sigma * b1_dot_b2 * k3_b3
    f22 = sigma * k3_b3 * b1_b2
    f13 = sigma * jnp.dot(v1, k3)
    f23 = sigma * jnp.dot(v2, k3)
    f24 = jnp.dot(u2, k1) * k3_b3 * b1_b2
    f15 = -jnp.dot(u1, k1) * k3_b3
    f25 = -jnp.dot(u2, k1) * b1_dot_b2 * k3_b3

    g1 = f13 * f22
    g2 = f13 * f25 - f15 * f23
    g3 = f11 * f23 - f13 * f21
    g4 = -f13 * f24
    g5 = f11 * f22
    g6 = f11 * f25 - f15 * f21
    g7 = -f15 * f24

    alpha4 = g5 * g5 + g1 * g1 + g3 * g3
    alpha3 = 2.0 * (g5 * g6 + g1 * g2 + g3 * g4)
    alpha2 = g6 * g6 + 2.0 * g5 * g7 + g2 * g2 + g4 * g4 - g1 * g1 - g3 * g3
    alpha1 = 2.0 * (g6 * g7 - g1 * g2 - g3 * g4)
    alpha0 = g7 * g7 - g2 * g2 - g4 * g4

    coeffs = jnp.stack([alpha4, alpha3, alpha2, alpha1, alpha0])
    cos_thetas, is_real = real_roots(coeffs, iterations=80, imag_tol=1e-6)

    # Frames: c_bar has columns (k1, k3'', k1 x k3''); c_bbar has rows
    # (b1, k3, b1 x k3).
    c_bar = jnp.stack([k1, k3_second, jnp.cross(k1, k3_second)], axis=1)
    c_bbar = jnp.stack([b1, k3, jnp.cross(b1, k3)], axis=0)
    sign_k3b3 = jnp.where(k3_b3 >= 0, 1.0, -1.0)

    def pose_from_root(cos_t1):
        sin_t1 = sign_k3b3 * jnp.sqrt(jnp.maximum(1.0 - cos_t1 * cos_t1, 0.0))
        denom = g5 * cos_t1 * cos_t1 + g6 * cos_t1 + g7
        denom = jnp.where(jnp.abs(denom) < 1e-18, 1e-18, denom)
        t = sin_t1 / denom
        cos_t3 = t * (g1 * cos_t1 + g2)
        sin_t3 = t * (g3 * cos_t1 + g4)

        # The reference's RotationMatrixAroundAxis (absolute_pose.cc:3-18) is
        # the transpose of standard Rodrigues (clockwise rotation).
        one = jnp.ones_like(cos_t1)
        zero = jnp.zeros_like(cos_t1)
        c1 = jnp.stack(
            [
                jnp.stack([one, zero, zero]),
                jnp.stack([zero, cos_t1, sin_t1]),
                jnp.stack([zero, -sin_t1, cos_t1]),
            ]
        )
        c2 = jnp.stack(
            [
                jnp.stack([cos_t3, zero, -sin_t3]),
                jnp.stack([zero, one, zero]),
                jnp.stack([sin_t3, zero, cos_t3]),
            ]
        )

        rotation = _closest_rotation(c_bar @ c1 @ c2 @ c_bbar)  # cam-to-world
        translation = p3 - (sigma * sin_t1) / k3_b3 * (rotation @ b3)
        R_wc = rotation.T
        t_wc = -rotation.T @ translation
        return jnp.concatenate([R_wc, t_wc[:, None]], axis=1)

    Rts = jax.vmap(pose_from_root)(cos_thetas)  # [4, 3, 4]
    degenerate = (sigma < 1e-12) | (jnp.abs(k3_b3) < 1e-12)
    valid = is_real & ~degenerate & jnp.all(jnp.isfinite(Rts.reshape(4, -1)), axis=-1)
    return Rts, valid


def translation_between_points(
    bearings: jnp.ndarray, points: jnp.ndarray, R_cw: jnp.ndarray, mask=None
) -> jnp.ndarray:
    """Optimal world-to-camera translation given world-to-camera rotation,
    minimizing Lu et al.'s object-space error
    (TranslationBetweenPoints, absolute_pose.h:125-142)."""
    w = (
        jnp.ones(bearings.shape[0], dtype=bearings.dtype)
        if mask is None
        else mask.astype(bearings.dtype)
    )
    n = jnp.maximum(jnp.sum(w), 1.0)
    F = jnp.einsum("ni,nj->nij", bearings, bearings) / jnp.sum(
        bearings * bearings, axis=-1
    )[:, None, None]
    F = F * w[:, None, None]
    F1 = jnp.sum(F, axis=0) / n
    eye = jnp.eye(3, dtype=bearings.dtype)
    RP = points @ R_cw.T
    F2 = jnp.einsum("nij,nj->i", F - w[:, None, None] * eye, RP) / n
    return tpu_linalg.solve3(eye - F1, F2)


def absolute_pose_known_rotation_n_points(
    bearings: jnp.ndarray, points: jnp.ndarray, R: jnp.ndarray, mask=None
) -> jnp.ndarray:
    """World-to-cam translation given rotation
    (AbsolutePoseNPointsKnownRotation, absolute_pose.h:192):
    minimize || [b]x (R P + t) ||^2 -> linear in t."""
    RP = points @ R.T  # [N,3]
    Bx = rot.hat(bearings)  # [N,3,3]
    if mask is not None:
        Bx = Bx * mask[:, None, None].astype(Bx.dtype)
    A = Bx.reshape(-1, 3)
    rhs = -jnp.einsum("nij,nj->ni", Bx, RP).reshape(-1)
    AtA = A.T @ A
    Atb = A.T @ rhs
    return tpu_linalg.solve3(AtA + 1e-12 * jnp.eye(3, dtype=A.dtype), Atb)


def absolute_pose_gn_refine(
    Rt: jnp.ndarray,
    bearings: jnp.ndarray,
    points: jnp.ndarray,
    mask=None,
    iterations: int = 10,
) -> jnp.ndarray:
    """Gauss-Newton on the bearing residual normalize(R P + t) - b — the
    non-minimal absolute-pose polish (AbsolutePoseNPoints semantics,
    absolute_pose.h:145 'Fast and Globally Convergent Pose Estimation')."""
    params0 = jnp.concatenate([rot.matrix_to_rotvec(Rt[:3, :3]), Rt[:3, 3]])
    w = None if mask is None else mask.astype(Rt.dtype)

    def residuals(params):
        pc = rot.rotate(jnp.broadcast_to(params[:3], points.shape), points) + params[3:6]
        r = (_normalize(pc) - bearings)
        if w is not None:
            r = r * w[:, None]
        return r.reshape(-1)

    def body(_, params):
        r = residuals(params)
        J = jax.jacfwd(residuals)(params)
        JtJ = J.T @ J
        step = tpu_linalg.solve_spd(
            JtJ + 1e-9 * jnp.eye(6, dtype=params.dtype), J.T @ r
        )
        return params - step

    params = jax.lax.fori_loop(0, iterations, body, params0)
    R = rot.rotvec_to_matrix(params[:3])
    return jnp.concatenate([R, params[3:6, None]], axis=1)


def absolute_pose_error(Rt: jnp.ndarray, bearings: jnp.ndarray, points: jnp.ndarray):
    """1 - b . normalize(R P + t) — AbsolutePose RANSAC error
    (absolute_pose_model.h:34-44)."""
    pc = points @ Rt[:3, :3].T + Rt[:3, 3]
    return 1.0 - jnp.sum(bearings * _normalize(pc), axis=-1)
