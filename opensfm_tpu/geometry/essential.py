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

import numpy as np

import jax
import jax.numpy as jnp

from opensfm_tpu.geometry import rotation as rot
from opensfm_tpu.geometry.polynomial import real_roots
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


# ---------------------------------------------------------------------------
# 5-point minimal solver (Nistér / Stewénius), batched & branch-free.
#
# TPU-native parity with the reference's EssentialFivePoints
# (geometry/essential.h:100-164): nullspace basis from the 5x9 epipolar
# system, the ten cubic manifold constraints expanded over the 20-monomial
# basis, reduction to a 10x10 Gröbner action matrix, and — instead of a
# nonsymmetric eigensolver, which XLA/TPU lacks — the action matrix's
# characteristic polynomial (Faddeev–LeVerrier) fed to the existing
# Durand-Kerner simultaneous root iteration, with inverse iteration
# recovering the eigenvectors that carry the (x, y, z) solution coordinates.
# Every step is fixed-shape and vmappable: one call yields all 10 candidate
# essential matrices plus a validity mask.
# ---------------------------------------------------------------------------

# Monomial bases (exponent tuples over (x, y, z)).  Degree-3 ordering matches
# the reference's coefficient enum (essential.h:41-62) for auditability.
_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]  # x y z 1
_DEG2 = [
    (2, 0, 0), (1, 1, 0), (0, 2, 0), (1, 0, 1), (0, 1, 1),
    (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]  # xx xy yy xz yz zz x y z 1
_DEG3 = [
    (3, 0, 0), (2, 1, 0), (1, 2, 0), (0, 3, 0), (2, 0, 1),
    (1, 1, 1), (0, 2, 1), (1, 0, 2), (0, 1, 2), (0, 0, 3),
    (2, 0, 0), (1, 1, 0), (0, 2, 0), (1, 0, 1), (0, 1, 1),
    (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]  # xxx xxy xyy yyy xxz xyz yyz xzz yzz zzz xx xy yy xz yz zz x y z 1


def _product_table(basis_a, basis_b, basis_out) -> np.ndarray:
    """T[i, j, k] = 1 where monomial_a[i] * monomial_b[j] == monomial_out[k]."""
    index = {e: i for i, e in enumerate(basis_out)}
    T = np.zeros((len(basis_a), len(basis_b), len(basis_out)))
    for i, a in enumerate(basis_a):
        for j, b in enumerate(basis_b):
            T[i, j, index[tuple(p + q for p, q in zip(a, b))]] = 1.0
    return T


_O1_TABLE = _product_table(_DEG1, _DEG1, _DEG2)  # deg1 * deg1 -> deg2
_O2_TABLE = _product_table(_DEG2, _DEG1, _DEG3)  # deg2 * deg1 -> deg3


def _o1(a, b):
    """Product of two degree-1 polynomials ([..., 4] -> [..., 10])."""
    return jnp.einsum("...i,...j,ijk->...k", a, b, jnp.asarray(_O1_TABLE, a.dtype))


def _o2(a, b):
    """deg-2 [..., 10] times deg-1 [..., 4] -> deg-3 [..., 20]."""
    return jnp.einsum("...i,...j,ijk->...k", a, b, jnp.asarray(_O2_TABLE, a.dtype))


def _charpoly(A: jnp.ndarray) -> jnp.ndarray:
    """Characteristic polynomial coefficients (monic, highest first) of a
    square matrix via the Faddeev–LeVerrier recursion — branch-free, so it
    runs batched on device where nonsymmetric eig is unavailable."""
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    coeffs = [jnp.ones(A.shape[:-2], dtype=A.dtype)]
    M = jnp.broadcast_to(eye, A.shape)
    for k in range(1, n + 1):
        AM = A @ M
        c = -jnp.trace(AM, axis1=-2, axis2=-1) / k
        coeffs.append(c)
        M = AM + c[..., None, None] * eye
    return jnp.stack(coeffs, axis=-1)  # [..., n+1]


def _inverse_iteration(A: jnp.ndarray, lam: jnp.ndarray, steps: int = 4):
    """Approximate eigenvector of A for (near-)eigenvalue lam via shifted
    inverse iteration.  A: [n, n]; lam scalar.  Returns (v[n], residual)."""
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    scale = 1.0 + jnp.abs(lam)
    shifted = A - (lam + 1e-10 * scale) * eye
    v0 = jnp.ones((n,), dtype=A.dtype) / jnp.sqrt(jnp.asarray(n, A.dtype))

    def body(_, v):
        # solve_small, not jnp.linalg.solve: TPU has no f64 LU kernel
        # (x64 CLI runs compile this through the axon AOT service).
        w = tpu_linalg.solve_small(shifted, v)
        w = jnp.where(jnp.all(jnp.isfinite(w)), w, v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, steps, body, v0)
    residual = jnp.linalg.norm(A @ v - lam * v)
    return v, residual


def essential_five_points(x: jnp.ndarray, y: jnp.ndarray):
    """All essential matrices through 5 bearing pairs (Nistér's minimal case).

    x, y: [5, 3] unit bearings with y^T E x = 0.  Returns
    (Es[10, 3, 3] Frobenius-normalized, valid[10] bool).  Invalid slots are
    complex/degenerate solutions.  Parity target: reference
    EssentialFivePoints (essential.h:100-164); this formulation swaps the
    Eigen nonsymmetric eigensolver for charpoly + Durand-Kerner + inverse
    iteration so the whole solver vmaps across RANSAC hypotheses on TPU.
    """
    dtype = x.dtype
    # Step 1: nullspace basis of the epipolar system (essential.h:77-83).
    A = jnp.einsum("nj,nk->njk", y, x).reshape(x.shape[0], 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    basis = Vt[5:9, :]  # [4, 9]: E = xs*basis[0] + ys*basis[1] + zs*basis[2] + basis[3]

    # E entries as degree-1 polynomials over [x, y, z, 1]: P[3, 3, 4].
    P = jnp.transpose(basis.reshape(4, 3, 3), (1, 2, 0))

    # Step 2: the ten cubic constraints (essential.h:94 semantics).
    # EE^T entries are degree-2; the trace constraint rows are
    # (EE^T - tr(EE^T)/2 I) E = 0, plus det(E) = 0.
    EEt = jnp.einsum("ijm,kjn,mnp->ikp", P, P, jnp.asarray(_O1_TABLE, dtype))
    trace = EEt[0, 0] + EEt[1, 1] + EEt[2, 2]
    L = EEt - 0.5 * trace[None, None, :] * jnp.eye(3, dtype=dtype)[..., None]
    singular_rows = jnp.einsum(
        "ikp,klq,pqr->ilr", L, P, jnp.asarray(_O2_TABLE, dtype)
    ).reshape(9, 20)
    det_row = (
        _o2(_o1(P[0, 0], P[1, 1]) - _o1(P[0, 1], P[1, 0]), P[2, 2])
        + _o2(_o1(P[0, 2], P[1, 0]) - _o1(P[0, 0], P[1, 2]), P[2, 1])
        + _o2(_o1(P[0, 1], P[1, 2]) - _o1(P[0, 2], P[1, 1]), P[2, 0])
    )
    M = jnp.concatenate([singular_rows, det_row[None]], axis=0)  # [10, 20]

    # Step 3: Gauss-Jordan -> [I | B].  Row order is irrelevant because the
    # reduced row echelon form is unique; LU-with-pivoting solve replaces the
    # reference's explicit elimination (essential.h:97,107-110).
    M1, M2 = M[:, :10], M[:, 10:]
    B = tpu_linalg.solve_small(M1, M2)  # TPU-safe (no f64 LU kernel)
    gj_ok = jnp.all(jnp.isfinite(B))
    B = jnp.where(gj_ok, B, jnp.zeros_like(B))

    # Step 4: multiplication-by-x action matrix on the quotient basis
    # [xx xy yy xz yz zz x y z 1] (essential.h:115-126).
    At = jnp.zeros((10, 10), dtype=dtype)
    At = At.at[0].set(-B[0])
    At = At.at[1].set(-B[1])
    At = At.at[2].set(-B[2])
    At = At.at[3].set(-B[4])
    At = At.at[4].set(-B[5])
    At = At.at[5].set(-B[7])
    At = At.at[6, 0].set(1.0)
    At = At.at[7, 1].set(1.0)
    At = At.at[8, 3].set(1.0)
    At = At.at[9, 6].set(1.0)

    # Step 5: eigenvalues via charpoly + Durand-Kerner (balanced by the
    # largest entry so root magnitudes stay O(1) for the iteration).
    s = jnp.maximum(jnp.max(jnp.abs(At)), 1e-12)
    coeffs = _charpoly(At / s)
    lam_scaled, is_real = real_roots(coeffs, iterations=80, imag_tol=1e-6)
    lams = lam_scaled * s  # [10]

    # Step 6: eigenvectors carry the solutions: v = [.., x, y, z, 1] ratios
    # (essential.h:129-136).
    vs, residuals = jax.vmap(lambda l: _inverse_iteration(At, l))(lams)
    denom = vs[:, 9]
    safe = jnp.abs(denom) > 1e-12 * jnp.linalg.norm(vs, axis=1)
    d = jnp.where(safe, denom, 1.0)
    sol = jnp.stack(
        [vs[:, 6] / d, vs[:, 7] / d, vs[:, 8] / d, jnp.ones_like(d)], axis=1
    )  # [10, 4] = (x, y, z, 1)

    Evec = sol @ basis  # [10, 9]
    norm = jnp.linalg.norm(Evec, axis=1, keepdims=True)
    Es = (Evec / jnp.maximum(norm, 1e-30)).reshape(10, 3, 3)

    valid = (
        is_real
        & gj_ok
        & safe
        & (residuals < 1e-3 * (1.0 + jnp.abs(lams)))
        & jnp.all(jnp.isfinite(Es.reshape(10, 9)), axis=1)
        & (norm[:, 0] > 1e-12)
    )
    return Es, valid


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
