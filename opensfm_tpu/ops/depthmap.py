"""PatchMatch multi-view stereo as batched checkerboard propagation.

TPU-native counterpart of the reference's PatchMatch estimator
(dense/src/depthmap.cc: RandomInitialization:241, PatchMatchForwardPass/
BackwardPass:288-309, PatchMatchUpdatePixel:310-380, ComputePlaneScore /
plane-induced homography depthmap.h:25).  The reference's strictly
sequential forward/backward raster passes become red-black checkerboard
half-iterations: every same-parity pixel consumes its 4-neighbors' planes
(the other parity) in parallel — the standard massively-parallel PatchMatch
schedule, which maps to pure gathers + elementwise math on the TPU.

Planes are stored as the reference's 3-vector nu with 1/z(q) = nu . r(q)
where r(q) = (x_n/f, y_n/f, 1) is the homogeneous ray of pixel q in the
reference camera.  Copying nu between pixels IS slanted-plane propagation;
the plane-induced warp falls out by evaluating z at each patch offset.

All jitted kernels live at module level and key only on shapes, so one
compile serves every shot of a dataset at a given depthmap resolution.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _patch_offsets(patch_size: int) -> np.ndarray:
    hp = patch_size // 2
    dys, dxs = np.mgrid[-hp : hp + 1, -hp : hp + 1]
    return np.stack([dys.ravel(), dxs.ravel()], axis=1)  # [P*P, 2]


def _score_candidate(nu, rays_off, ref_patch, ref_mean, ref_var,
                     nb_gray, R_rel, t_rel, nb_f, min_depth, max_depth,
                     min_patch_variance):
    """Best NCC over neighbors for plane field nu [H,W,3].

    Returns (score [H,W], nghbr [H,W], depth [H,W])."""
    inv_z = jnp.einsum("phwc,hwc->phw", rays_off, nu)  # [P2,H,W]
    z = 1.0 / jnp.where(jnp.abs(inv_z) > 1e-9, inv_z, 1e-9)
    Xc = rays_off * z[..., None]  # [P2,H,W,3] ref-cam patch points
    nbH, nbW = nb_gray.shape[1], nb_gray.shape[2]
    size = float(max(nbH, nbW))

    def one_neighbor(args):
        Rr, tr, f, gray = args
        Xn = jnp.einsum("ij,phwj->phwi", Rr, Xc) + tr
        zc = jnp.where(jnp.abs(Xn[..., 2]) > 1e-9, Xn[..., 2], 1e-9)
        px = f * Xn[..., 0] / zc * size + (nbW - 1) / 2.0
        py = f * Xn[..., 1] / zc * size + (nbH - 1) / 2.0
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, nbW - 2)
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, nbH - 2)
        fx = jnp.clip(px - x0, 0.0, 1.0)
        fy = jnp.clip(py - y0, 0.0, 1.0)
        warped = (
            gray[y0, x0] * (1 - fy) * (1 - fx)
            + gray[y0, x0 + 1] * (1 - fy) * fx
            + gray[y0 + 1, x0] * fy * (1 - fx)
            + gray[y0 + 1, x0 + 1] * fy * fx
        )  # [P2,H,W]
        inside = (
            (px >= 0) & (px < nbW - 1) & (py >= 0) & (py < nbH - 1)
            & (Xn[..., 2] > 0)
        )
        valid = jnp.all(inside, axis=0)  # whole patch visible
        wmean = jnp.mean(warped, axis=0)
        wvar = jnp.mean(warped**2, axis=0) - wmean**2
        cov = jnp.mean(warped * ref_patch, axis=0) - wmean * ref_mean
        ncc = cov / jnp.sqrt(
            jnp.maximum(ref_var * wvar, min_patch_variance**2)
        )
        return jnp.where(valid, ncc, -1.0)

    scores = jax.lax.map(one_neighbor, (R_rel, t_rel, nb_f, nb_gray))
    score = jnp.max(scores, axis=0)
    nghbr = jnp.argmax(scores, axis=0).astype(jnp.int32)
    # z at the patch center (last axis ordering puts the center at P2//2).
    center = rays_off.shape[0] // 2
    depth = z[center]
    bad_depth = (depth <= min_depth) | (depth >= max_depth)
    score = jnp.where(bad_depth, -1.0, score)
    return score, nghbr, depth


@partial(jax.jit, static_argnames=("min_depth", "max_depth",
                                   "min_patch_variance"))
def _pm_half_iteration(state, parity, noise_d, noise_n, rays, rays_off,
                       ref_patch, ref_mean, ref_var, nb_gray, R_rel, t_rel,
                       nb_f, min_depth, max_depth, min_patch_variance):
    """One red/black half-step: propagate 4-neighbor planes + random
    refinements with shrinking ranges (PatchMatchUpdatePixel:310-380)."""
    nu, depth, score, nghbr = state
    H, W = depth.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    mask = ((ys + xs) % 2) == parity

    def consider(nu_cand, st):
        nu0, d0, s0, n0 = st
        s_c, n_c, d_c = _score_candidate(
            nu_cand, rays_off, ref_patch, ref_mean, ref_var, nb_gray,
            R_rel, t_rel, nb_f, min_depth, max_depth, min_patch_variance,
        )
        ok = mask & (s_c > s0)
        return (
            jnp.where(ok[..., None], nu_cand, nu0),
            jnp.where(ok, d_c, d0),
            jnp.where(ok, s_c, s0),
            jnp.where(ok, n_c, n0),
        )

    st = (nu, depth, score, nghbr)
    # Propagation: the 4 axis neighbors' planes (other parity by masking).
    for shift, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
        st = consider(jnp.roll(st[0], shift, axis=axis), st)
    # Random refinement around the current plane.
    for k in range(noise_d.shape[0]):
        d_new = st[1] * jnp.exp(noise_d[k])
        nu0 = st[0]
        nz = jnp.where(jnp.abs(nu0[..., 2]) > 1e-9, nu0[..., 2], 1e-9)
        nx = -nu0[..., 0] / nz + noise_n[k, 0]
        ny = -nu0[..., 1] / nz + noise_n[k, 1]
        n_vec = jnp.stack([nx, ny, -jnp.ones_like(nx)], axis=-1)
        # nu for the perturbed (depth, normal): X = d r(q); nu = n / (n.X).
        X = rays * d_new[..., None]
        ndotX = jnp.einsum("hwc,hwc->hw", n_vec, X)
        nu_cand = n_vec / jnp.where(
            jnp.abs(ndotX) > 1e-9, ndotX, 1e-9
        )[..., None]
        st = consider(nu_cand, st)
    return st


@partial(jax.jit, static_argnames=("min_depth", "max_depth",
                                   "min_patch_variance"))
def _pm_init_score(nu, rays_off, ref_patch, ref_mean, ref_var, nb_gray,
                   R_rel, t_rel, nb_f, min_depth, max_depth,
                   min_patch_variance):
    return _score_candidate(
        nu, rays_off, ref_patch, ref_mean, ref_var, nb_gray, R_rel, t_rel,
        nb_f, min_depth, max_depth, min_patch_variance,
    )


def patch_match_depthmap(
    ref_gray: np.ndarray,
    ref_rays: np.ndarray,  # [H, W, 3] homogeneous rays (z = 1), cam frame
    R_ref: np.ndarray,  # [3,3] world->cam
    t_ref: np.ndarray,  # [3]
    neighbor_grays: List[np.ndarray],
    neighbor_Rs: List[np.ndarray],
    neighbor_ts: List[np.ndarray],
    neighbor_focals: List[float],
    min_depth: float,
    max_depth: float,
    iterations: int = 3,
    patch_size: int = 7,
    min_patch_variance: float = 1e-5,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (depth[H,W], plane nu [H,W,3], score[H,W], nghbr[H,W])."""
    H, W = ref_gray.shape
    rng = np.random.default_rng(seed)

    rays = jnp.asarray(ref_rays, dtype=jnp.float32)
    ref = jnp.asarray(ref_gray, dtype=jnp.float32)
    offsets = _patch_offsets(patch_size)

    ys, xs = np.mgrid[0:H, 0:W]
    oy = jnp.asarray(np.clip(ys[None] + offsets[:, 0, None, None], 0, H - 1))
    ox = jnp.asarray(np.clip(xs[None] + offsets[:, 1, None, None], 0, W - 1))

    ref_patch = ref[oy, ox]  # [P2, H, W]
    ref_mean = jnp.mean(ref_patch, axis=0)
    ref_var = jnp.mean(ref_patch**2, axis=0) - ref_mean**2
    rays_off = rays[oy, ox]  # [P2, H, W, 3]

    nb_gray = jnp.asarray(np.stack(neighbor_grays), dtype=jnp.float32)
    R_rel = jnp.asarray(
        np.stack([Rn @ R_ref.T for Rn in neighbor_Rs]), dtype=jnp.float32
    )
    t_rel = jnp.asarray(
        np.stack(
            [tn - Rn @ R_ref.T @ t_ref
             for Rn, tn in zip(neighbor_Rs, neighbor_ts)]
        ),
        dtype=jnp.float32,
    )
    nb_f = jnp.asarray(np.asarray(neighbor_focals), dtype=jnp.float32)

    statics = dict(
        min_depth=float(min_depth), max_depth=float(max_depth),
        min_patch_variance=float(min_patch_variance),
    )
    arrays = (ref_patch, ref_mean, ref_var, nb_gray, R_rel, t_rel, nb_f)

    # --- random initialization (RandomInitialization:241-260) --------------
    depth0 = np.exp(
        rng.uniform(np.log(min_depth), np.log(max_depth), size=(H, W))
    ).astype(np.float32)
    normal0 = np.stack(
        [
            rng.uniform(-1, 1, size=(H, W)),
            rng.uniform(-1, 1, size=(H, W)),
            -np.ones((H, W)),
        ],
        axis=-1,
    ).astype(np.float32)
    X0 = np.asarray(ref_rays) * depth0[..., None]
    ndotX = np.einsum("hwc,hwc->hw", normal0, X0)
    nu0 = normal0 / np.where(np.abs(ndotX) > 1e-9, ndotX, 1e-9)[..., None]

    nu = jnp.asarray(nu0)
    score, nghbr, depth = _pm_init_score(nu, rays_off, *arrays, **statics)

    state = (nu, depth, score, nghbr)
    n_rand = 6
    for _it in range(iterations):
        for parity in (0, 1):
            noise_d = (
                (0.02 * (0.3 ** np.arange(n_rand)))[:, None, None]
                * rng.standard_normal((n_rand, H, W))
            )
            noise_n = (
                (0.5 * (0.8 ** np.arange(n_rand)))[:, None, None, None]
                * rng.standard_normal((n_rand, 2, H, W))
            )
            state = _pm_half_iteration(
                state, parity,
                jnp.asarray(noise_d, dtype=jnp.float32),
                jnp.asarray(noise_n, dtype=jnp.float32),
                rays, rays_off, *arrays, **statics,
            )

    nu, depth, score, nghbr = state
    # Low-variance reference patches are unreliable (ComputeIgnoreMask:262).
    bad = ref_var < min_patch_variance
    depth = jnp.where(bad, 0.0, depth)
    score = jnp.where(bad, -1.0, score)
    return (
        np.asarray(depth), np.asarray(nu), np.asarray(score),
        np.asarray(nghbr),
    )
