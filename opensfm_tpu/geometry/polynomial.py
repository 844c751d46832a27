"""Batched polynomial root finding (Durand-Kerner / Weierstrass iteration).

TPU-native replacement for the reference's closed-form / companion-matrix
root solving inside the minimal solvers (P3P quartic in
geometry/absolute_pose.h:16, the 10th-degree 5-point polynomial in
geometry/essential.h:100).  Nonsymmetric eigendecomposition is unavailable on
TPU; Durand-Kerner is a fixed-iteration, branch-free, vmappable simultaneous
root iteration in complex arithmetic that converges to machine precision for
the low-degree well-conditioned polynomials that arise here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polyval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sum coeffs[i] * x^(D-i) (numpy convention, highest first)."""
    out = jnp.zeros_like(x) + coeffs[..., 0:1]
    for i in range(1, coeffs.shape[-1]):
        out = out * x + coeffs[..., i : i + 1]
    return out


def roots(coeffs: jnp.ndarray, iterations: int = 60) -> jnp.ndarray:
    """All (complex) roots of polynomial(s) with leading coefficient first.

    coeffs: [..., D+1] real or complex.  Returns [..., D] complex roots.
    Leading coefficient must be nonzero (normalized internally; callers are
    responsible for degree-degeneracy handling).
    """
    degree = coeffs.shape[-1] - 1
    cdtype = jnp.complex128 if coeffs.dtype == jnp.float64 else jnp.complex64
    c = coeffs.astype(cdtype)
    lead = c[..., 0:1]
    lead = jnp.where(jnp.abs(lead) < 1e-30, 1e-30 + 0j, lead)
    monic = c / lead  # [..., D+1]

    # Scale roots to O(1): Cauchy-style radius from coefficient magnitudes.
    radius = 1.0 + jnp.max(jnp.abs(monic[..., 1:]), axis=-1, keepdims=True)
    radius = radius.astype(cdtype)

    # Standard non-real seed angles (avoids symmetry stalls).
    k = jnp.arange(degree)
    seed = (0.4 + 0.9j) ** (k + 1)
    z = jnp.broadcast_to(seed, coeffs.shape[:-1] + (degree,)).astype(cdtype)
    z = z * radius

    def body(_, z):
        p = polyval(monic, z)  # [..., D]
        diff = z[..., :, None] - z[..., None, :]  # [..., D, D]
        diff = diff + jnp.eye(degree, dtype=cdtype)  # kill the diagonal zeros
        denom = jnp.prod(diff, axis=-1)
        denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30 + 0j, denom)
        return z - p / denom

    return jax.lax.fori_loop(0, iterations, body, z)


def real_roots(
    coeffs: jnp.ndarray, iterations: int = 60, imag_tol: float = 1e-8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(roots_real[..., D], is_real[..., D]) — real parts + realness mask."""
    z = roots(coeffs, iterations)
    scale = 1.0 + jnp.abs(z)
    is_real = jnp.abs(z.imag) <= imag_tol * scale
    return z.real, is_real
