"""TPU-safe small linear algebra.

The TPU backend has no LU decomposition path for f64 (and ``jnp.linalg.det``
/ ``solve`` / ``inv`` all lower through LU), so every device-side small
solve in the framework routes through here instead:

- SPD systems (damped Gauss-Newton/LM normal equations, Schur complements)
  use Cholesky + two triangular solves — both supported natively on TPU in
  f32 and f64, batched.
- 3x3 systems use the closed-form adjugate (nine fused multiplies on the
  VPU; also ~4x faster than batched LU on TPU even where LU exists).

Reference parity: these replace Eigen's ``.inverse()``/``.ldlt().solve()``
calls inside the C++ solvers (e.g. triangulation.cc:59, relative_pose.h:155,
absolute_pose.h:192 — see SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_spd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for symmetric positive-definite A (batched).

    A: [..., N, N]; b: [..., N] or [..., N, K].  Cholesky + triangular
    solves — the only dense direct solver path TPU supports in f64.
    """
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    L = jax.lax.linalg.cholesky(A)
    y = jax.lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=False
    )
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0] if vec else x


def solve_qr(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b via QR (batched) — for symmetric systems that may be
    slightly indefinite from f32 roundoff (e.g. Schur complements assembled
    with large dynamic range), where Cholesky would produce NaNs.  QR is
    supported on TPU in f32 and f64; ~2x the flops of Cholesky.
    """
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    q, r_ = jnp.linalg.qr(A)
    y = jnp.einsum("...ji,...jk->...ik", q, b)
    x = jax.lax.linalg.triangular_solve(r_, y, left_side=True, lower=False)
    return x[..., 0] if vec else x


def inv_spd(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a symmetric positive-definite matrix via Cholesky."""
    eye = jnp.broadcast_to(
        jnp.eye(A.shape[-1], dtype=A.dtype), A.shape
    )
    return solve_spd(A, eye)


def solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve general small n x n systems A x = b (batched, any dtype).

    Unrolled Gaussian elimination with partial pivoting — TPU has no LU
    kernel at all in f64 (``jnp.linalg.solve`` fails to compile:
    "Only F32 and C64 types are implemented in LuDecomposition"), and for
    the n <= ~16 systems the solvers need, an unrolled elimination is
    also faster than a batched LU dispatch.  Singular systems yield
    inf/nan like ``jnp.linalg.solve`` — callers keep their isfinite
    guards.  A: [..., n, n]; b: [..., n] or [..., n, k].
    """
    n = A.shape[-1]
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    M = jnp.concatenate([A, b.astype(A.dtype)], axis=-1)  # [..., n, n+k]
    rows = jnp.arange(n)
    for i in range(n):
        # Partial pivot: strongest remaining row in column i.
        col = jnp.abs(M[..., :, i])
        col = jnp.where(rows >= i, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)  # [...]
        perm = jnp.where(
            rows == i, p[..., None],
            jnp.where(rows == p[..., None], i, rows),
        )
        M = jnp.take_along_axis(M, perm[..., :, None], axis=-2)
        # Normalize the pivot row, eliminate every other row (Gauss-
        # Jordan: leaves the left block as the identity, so back-
        # substitution is just reading the right block).
        row_i = M[..., i:i + 1, :] / M[..., i:i + 1, i:i + 1]
        factors = M[..., :, i:i + 1]
        elim = (rows != i)[:, None]
        M = jnp.where(elim, M - factors * row_i, row_i)
    x = M[..., n:]
    return x[..., 0] if vec else x


def det3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form determinant of [..., 3, 3] (jnp.linalg.det needs LU)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def adjugate3(A: jnp.ndarray) -> jnp.ndarray:
    """Adjugate (transposed cofactor matrix) of [..., 3, 3]."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    rows = [
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def inv3(A: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (general, not just SPD)."""
    det = det3(A)
    if eps:
        det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps, det)
    return adjugate3(A) / det[..., None, None]


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve general 3x3 systems A x = b closed-form (batched).

    A: [..., 3, 3]; b: [..., 3].
    """
    det = det3(A)
    adj = adjugate3(A)
    return jnp.einsum("...ij,...j->...i", adj, b) / det[..., None]
