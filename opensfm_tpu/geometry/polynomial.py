"""Batched polynomial root finding (Durand-Kerner / Weierstrass iteration).

TPU-native replacement for the reference's closed-form / companion-matrix
root solving inside the minimal solvers (P3P quartic in
geometry/absolute_pose.h:16, the 10th-degree 5-point polynomial in
geometry/essential.h:100).  Nonsymmetric eigendecomposition is unavailable on
TPU; Durand-Kerner is a fixed-iteration, branch-free, vmappable simultaneous
root iteration that converges to machine precision for the low-degree
well-conditioned polynomials that arise here.

The iteration is written in split real/imaginary f64 arithmetic rather than
complex dtypes: the TPU f64 emulation layer (x64 rewriter) supports real
f64 ops but not complex128, so complex math must be spelled out as (re, im)
pairs to run on device.
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


def _polyval_ri(cr, ci, xr, xi):
    """Horner evaluation with split re/im: coeffs [..., D+1], x [..., D]."""
    outr = jnp.zeros_like(xr) + cr[..., 0:1]
    outi = jnp.zeros_like(xi) + ci[..., 0:1]
    for i in range(1, cr.shape[-1]):
        nr = outr * xr - outi * xi + cr[..., i : i + 1]
        ni = outr * xi + outi * xr + ci[..., i : i + 1]
        outr, outi = nr, ni
    return outr, outi


def roots_ri(
    coeffs: jnp.ndarray, iterations: int = 60
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All roots of real polynomial(s), highest coefficient first, as a
    (real[..., D], imag[..., D]) pair of real arrays — the TPU-safe core."""
    degree = coeffs.shape[-1] - 1
    lead = coeffs[..., 0:1]
    lead = jnp.where(jnp.abs(lead) < 1e-30, 1e-30, lead)
    cr = coeffs / lead  # monic, [..., D+1]
    ci = jnp.zeros_like(cr)

    # Scale roots to O(1): Cauchy-style radius from coefficient magnitudes.
    radius = 1.0 + jnp.max(jnp.abs(cr[..., 1:]), axis=-1, keepdims=True)

    # Standard non-real seed angles (avoids symmetry stalls): (0.4+0.9i)^k.
    k = jnp.arange(1, degree + 1)
    ang = jnp.arctan2(0.9, 0.4) * k
    mag = (0.4 ** 2 + 0.9 ** 2) ** (0.5 * k)
    seedr = (mag * jnp.cos(ang)).astype(coeffs.dtype)
    seedi = (mag * jnp.sin(ang)).astype(coeffs.dtype)
    shape = coeffs.shape[:-1] + (degree,)
    zr = jnp.broadcast_to(seedr, shape) * radius
    zi = jnp.broadcast_to(seedi, shape) * radius

    eye = jnp.eye(degree, dtype=coeffs.dtype)

    def body(_, z):
        zr, zi = z
        pr, pi = _polyval_ri(cr, ci, zr, zi)
        # denom_i = prod_{j != i} (z_i - z_j); the eye kills diagonal zeros.
        dr = zr[..., :, None] - zr[..., None, :] + eye
        di = zi[..., :, None] - zi[..., None, :]
        # Complex product along the last axis, unrolled (degree <= ~10).
        qr = dr[..., 0]
        qi = di[..., 0]
        for j in range(1, degree):
            nr = qr * dr[..., j] - qi * di[..., j]
            ni = qr * di[..., j] + qi * dr[..., j]
            qr, qi = nr, ni
        mag2 = qr * qr + qi * qi
        mag2 = jnp.maximum(mag2, 1e-60)
        # z - p/q  with  p/q = p * conj(q) / |q|^2
        stepr = (pr * qr + pi * qi) / mag2
        stepi = (pi * qr - pr * qi) / mag2
        return (zr - stepr, zi - stepi)

    zr, zi = jax.lax.fori_loop(0, iterations, body, (zr, zi))
    return zr, zi


def roots(coeffs: jnp.ndarray, iterations: int = 60) -> jnp.ndarray:
    """All (complex) roots of polynomial(s) with leading coefficient first.

    coeffs: [..., D+1] real.  Returns [..., D] complex roots.  Prefer
    `roots_ri`/`real_roots` on device — complex dtypes don't lower through
    the TPU f64 emulator.
    """
    zr, zi = roots_ri(coeffs, iterations)
    return jax.lax.complex(zr, zi)


def real_roots(
    coeffs: jnp.ndarray, iterations: int = 60, imag_tol: float = 1e-8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(roots_real[..., D], is_real[..., D]) — real parts + realness mask."""
    zr, zi = roots_ri(coeffs, iterations)
    scale = 1.0 + jnp.sqrt(zr * zr + zi * zi)
    is_real = jnp.abs(zi) <= imag_tol * scale
    return zr, is_real
