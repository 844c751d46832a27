"""Schur-complement Levenberg-Marquardt bundle adjustment core (JAX).

Parameters (mirroring bundle_adjuster.h data blocks :306-313):
- rig instance poses   inst[NI, 6]   (angle-axis + translation, world-to-inst)
- rig camera poses     rigcam[NR, 6] (instance-to-camera)
- camera intrinsics    cam[NC, Pmax] (padded per-type layouts)
- points               points[NP, 3]

Residuals:
- point projections (ReprojectionError2D, error/projection_errors.h:31-57):
  (project(cam, rigcam ∘ inst ∘ X) - uv) / std_dev with a robust loss
  applied as an IRLS weight;
- GPS position priors on rig instances (bundle_adjuster.cc:745-778);
- camera parameter priors, log-scale for focal (bundle_adjuster.cc:568-593);
- rig camera pose priors;
- point position priors (GCPs).

The camera-point block structure is eliminated with an explicit batched
Schur complement: per-point 3x3 inverses + scatter-added pair products into
the reduced camera system S (dense over camera-side params — the analog of
Ceres SPARSE_SCHUR at bundle_adjuster.cc:42).  All hot math is batched over
observations and points; shapes are static given the problem's
(O, NP, T, Dc) signature, so jit recompiles only on bucket changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opensfm_tpu.geometry import cameras as cam_lib
from opensfm_tpu.geometry import rotation as rot

# ---------------------------------------------------------------------------
# Robust losses (Ceres semantics: rho(s) on squared norm s, scale a applies
# as a^2 * rho(s / a^2)).  IRLS weight = rho'(s).
# ---------------------------------------------------------------------------

LOSSES = {
    "TrivialLoss": (lambda u: u, lambda u: jnp.ones_like(u)),
    "SoftLOneLoss": (
        lambda u: 2.0 * (jnp.sqrt(1.0 + u) - 1.0),
        lambda u: 1.0 / jnp.sqrt(1.0 + u),
    ),
    "CauchyLoss": (lambda u: jnp.log1p(u), lambda u: 1.0 / (1.0 + u)),
    "HuberLoss": (
        lambda u: jnp.where(u <= 1.0, u, 2.0 * jnp.sqrt(jnp.maximum(u, 1.0)) - 1.0),
        lambda u: jnp.where(u <= 1.0, 1.0, 1.0 / jnp.sqrt(jnp.maximum(u, 1.0))),
    ),
    "TukeyLoss": (
        lambda u: jnp.where(u <= 1.0, (1.0 - (1.0 - u) ** 3) / 3.0, 1.0 / 3.0),
        lambda u: jnp.where(u <= 1.0, (1.0 - u) ** 2, 0.0),
    ),
}


@dataclass
class BAProblem:
    """Flat, device-ready BA problem.  Build via `opensfm_tpu.ba.problem`."""

    # Parameters
    inst: np.ndarray  # [NI, 6]
    rigcam: np.ndarray  # [NR, 6]
    cam: np.ndarray  # [NC, Pmax]
    points: np.ndarray  # [NP, 3]

    # Observations
    obs_uv: np.ndarray  # [O, 2]
    obs_inv_sd: np.ndarray  # [O] 1/std_deviation (0 disables)
    obs_point: np.ndarray  # [O] int
    obs_inst: np.ndarray  # [O] int
    obs_rigcam: np.ndarray  # [O] int
    obs_cam: np.ndarray  # [O] int

    # Point -> observation CSR (padded with O = trash slot)
    point_obs: np.ndarray  # [NP, T] int

    # Priors (inv_sd == 0 disables a row/dim)
    gps_pos: np.ndarray  # [NI, 3]
    gps_inv_sd: np.ndarray  # [NI]
    cam_prior: np.ndarray  # [NC, Pmax]
    cam_prior_inv_sd: np.ndarray  # [NC, Pmax]
    cam_log_mask: np.ndarray  # [NC, Pmax] bool (log-scale prior dims: focal)
    rigcam_prior: np.ndarray  # [NR, 6]
    rigcam_prior_inv_sd: np.ndarray  # [NR, 6]
    point_prior: np.ndarray  # [NP, 3]
    point_prior_inv_sd: np.ndarray  # [NP, 3]

    # Optimization masks
    opt_inst: np.ndarray  # [NI] bool
    opt_rigcam: np.ndarray  # [NR] bool
    opt_cam: np.ndarray  # [NC, Pmax] bool (padding dims False)
    opt_points: np.ndarray  # [NP] bool

    # Static config
    ptype: str = "perspective"
    loss: str = "SoftLOneLoss"
    loss_threshold: float = 1.0

    def counts(self):
        return (
            len(self.inst), len(self.rigcam), len(self.cam), len(self.points),
            len(self.obs_uv), self.point_obs.shape[1],
        )


@dataclass
class BAResult:
    inst: np.ndarray
    rigcam: np.ndarray
    cam: np.ndarray
    points: np.ndarray
    initial_cost: float = 0.0
    final_cost: float = 0.0
    iterations: int = 0
    lam: float = 0.0


# ---------------------------------------------------------------------------
# Jitted core
# ---------------------------------------------------------------------------


def _transform_rig(inst6, rigcam6, X):
    """World -> camera through the rig: Xc = R_rc (R_i X + t_i) + t_rc."""
    Xi = rot.rotate(inst6[..., :3], X) + inst6[..., 3:6]
    return rot.rotate(rigcam6[..., :3], Xi) + rigcam6[..., 3:6]


def _origin(pose6):
    """Camera/instance center: -R^T t."""
    return -rot.rotate(-pose6[..., :3], pose6[..., 3:6])


@partial(jax.jit, static_argnames=("ptype", "loss", "loss_threshold", "pmax"))
def _residual_data(state, data, ptype, loss, loss_threshold, pmax):
    """Per-observation weighted residuals + Jacobians + robust IRLS weights.

    `ptype` is either a single projection type string or a tuple of
    (type, start, end) static segments over type-sorted observations
    (mixed-camera problems).  Returns r[O,2], Jc[O,2,28], Jp[O,2,3] already
    scaled by sqrt(w), plus the per-obs robust cost for the objective.
    """
    inst, rigcam, cam, points = state
    d = data

    def make_one(pt):
        def one(uv, inv_sd, pi, ii, ri, ci):
            combo = jnp.concatenate([inst[ii], rigcam[ri], cam[ci]])

            def res_fn(combo_, X_):
                Xc = _transform_rig(combo_[0:6], combo_[6:12], X_)
                pred = cam_lib.project(pt, Xc, combo_[12 : 12 + pmax], xp=jnp)
                diff = pred - uv
                if pt == "spherical":
                    # Wrap the panorama seam (the reference instead uses a 3D
                    # bearing residual, ErrorTraits bundle_adjuster.cc:446).
                    diff = diff - jnp.round(diff)
                return diff * inv_sd

            X = points[pi]
            r = res_fn(combo, X)
            Jc = jax.jacfwd(res_fn, argnums=0)(combo, X)
            Jp = jax.jacfwd(res_fn, argnums=1)(combo, X)
            return r, Jc, Jp

        return one

    segments = ((ptype, 0, d["obs_uv"].shape[0]),) if isinstance(ptype, str) else ptype
    rs, Jcs, Jps = [], [], []
    for pt, start, end in segments:
        sl = slice(start, end)
        r_, Jc_, Jp_ = jax.vmap(make_one(pt))(
            d["obs_uv"][sl], d["obs_inv_sd"][sl], d["obs_point"][sl],
            d["obs_inst"][sl], d["obs_rigcam"][sl], d["obs_cam"][sl],
        )
        rs.append(r_)
        Jcs.append(Jc_)
        Jps.append(Jp_)
    r = jnp.concatenate(rs) if len(rs) > 1 else rs[0]
    Jc = jnp.concatenate(Jcs) if len(Jcs) > 1 else Jcs[0]
    Jp = jnp.concatenate(Jps) if len(Jps) > 1 else Jps[0]

    rho, drho = LOSSES[loss]
    a2 = loss_threshold * loss_threshold
    s = jnp.sum(r * r, axis=-1)
    cost = 0.5 * a2 * rho(s / a2)
    w = drho(s / a2)
    sw = jnp.sqrt(jnp.maximum(w, 1e-12))[:, None]
    return r * sw, Jc * sw[..., None], Jp * sw[..., None], cost


def _prior_residuals(state, data):
    """Prior residual/Jacobian blocks (quadratic loss).

    Returns list of (r[N,K], J[N,K,D], block_kind, idx) per prior family.
    """
    inst, rigcam, cam, points = state
    d = data
    out = []

    # GPS on instance origins (AddRigInstancePositionPrior semantics).
    def gps_res(inst6, pos, inv_sd):
        return (_origin(inst6) - pos) * inv_sd

    r = jax.vmap(gps_res)(inst, d["gps_pos"], d["gps_inv_sd"][:, None])
    J = jax.vmap(jax.jacfwd(gps_res, argnums=0))(
        inst, d["gps_pos"], d["gps_inv_sd"][:, None]
    )
    out.append((r, J, "inst"))

    # Camera parameter priors (log-scale for focal, bundle_adjuster.cc:568).
    def cam_res(camP, prior, inv_sd, log_mask):
        safe = jnp.maximum(jnp.abs(camP), 1e-12)
        safe_prior = jnp.maximum(jnp.abs(prior), 1e-12)
        rlog = jnp.log(safe) - jnp.log(safe_prior)
        rlin = camP - prior
        return jnp.where(log_mask, rlog, rlin) * inv_sd

    r = jax.vmap(cam_res)(cam, d["cam_prior"], d["cam_prior_inv_sd"], d["cam_log_mask"])
    J = jax.vmap(jax.jacfwd(cam_res, argnums=0))(
        cam, d["cam_prior"], d["cam_prior_inv_sd"], d["cam_log_mask"]
    )
    out.append((r, J, "cam"))

    # Rig camera pose priors (value-space, DataPriorError on Pose).
    def rc_res(rc6, prior, inv_sd):
        return (rc6 - prior) * inv_sd

    r = jax.vmap(rc_res)(rigcam, d["rigcam_prior"], d["rigcam_prior_inv_sd"])
    J = jax.vmap(jax.jacfwd(rc_res, argnums=0))(
        rigcam, d["rigcam_prior"], d["rigcam_prior_inv_sd"]
    )
    out.append((r, J, "rigcam"))

    return out


def _make_col_index(data, ni, nr, nc, pmax):
    """Per-obs global column indices [O, 28] into the camera-side vector,
    with fixed/padded dims routed to the trash column Dc."""
    dc = ni * 6 + nr * 6 + nc * pmax
    o_inst = data["obs_inst"]
    o_rig = data["obs_rigcam"]
    o_cam = data["obs_cam"]
    ar6 = jnp.arange(6)
    arp = jnp.arange(pmax)
    cols_i = o_inst[:, None] * 6 + ar6[None, :]
    cols_r = ni * 6 + o_rig[:, None] * 6 + ar6[None, :]
    cols_c = ni * 6 + nr * 6 + o_cam[:, None] * pmax + arp[None, :]
    # Mask fixed blocks/dims.
    cols_i = jnp.where(data["opt_inst"][o_inst][:, None], cols_i, dc)
    cols_r = jnp.where(data["opt_rigcam"][o_rig][:, None], cols_r, dc)
    cols_c = jnp.where(data["opt_cam"][o_cam], cols_c, dc)
    return jnp.concatenate([cols_i, cols_r, cols_c], axis=1)  # [O, 28]


@partial(
    jax.jit,
    static_argnames=("ptype", "loss", "loss_threshold", "pmax", "ni", "nr", "nc"),
)
def _lm_step(state, data, lam, ptype, loss, loss_threshold, pmax, ni, nr, nc):
    """One damped LM step: assemble, Schur-eliminate points, solve, update.

    Returns (new_state, predicted_ok) — acceptance is decided by the caller
    from the recomputed cost.
    """
    inst, rigcam, cam, points = state
    np_pts = points.shape[0]
    dc = ni * 6 + nr * 6 + nc * pmax
    dtype = points.dtype

    r, Jc, Jp, _ = _residual_data(state, data, ptype, loss, loss_threshold, pmax)

    # Zero jacobians of fixed points.
    opt_p = data["opt_points"][data["obs_point"]].astype(dtype)
    Jp = Jp * opt_p[:, None, None]

    cols = _make_col_index(data, ni, nr, nc, pmax)  # [O, 28]

    # --- camera-side normal equations (scatter-added dense S) -------------
    S = jnp.zeros((dc + 1, dc + 1), dtype=dtype)
    b = jnp.zeros((dc + 1,), dtype=dtype)

    JcTJc = jnp.einsum("oki,okj->oij", Jc, Jc)  # [O,28,28]
    JcTr = jnp.einsum("oki,ok->oi", Jc, r)  # [O,28]
    S = S.at[cols[:, :, None], cols[:, None, :]].add(JcTJc)
    b = b.at[cols].add(JcTr)

    # --- priors ------------------------------------------------------------
    for pr, pJ, kind in _prior_residuals(state, data):
        n = pJ.shape[0]
        if kind == "inst":
            base = jnp.arange(n)[:, None] * 6 + jnp.arange(6)[None, :]
            pcols = jnp.where(data["opt_inst"][:, None], base, dc)
        elif kind == "rigcam":
            base = ni * 6 + jnp.arange(n)[:, None] * 6 + jnp.arange(6)[None, :]
            pcols = jnp.where(data["opt_rigcam"][:, None], base, dc)
        else:  # cam
            base = ni * 6 + nr * 6 + jnp.arange(n)[:, None] * pmax + jnp.arange(pmax)[None, :]
            pcols = jnp.where(data["opt_cam"], base, dc)
        S = S.at[pcols[:, :, None], pcols[:, None, :]].add(
            jnp.einsum("nki,nkj->nij", pJ, pJ)
        )
        b = b.at[pcols].add(jnp.einsum("nki,nk->ni", pJ, pr))

    # --- point system ------------------------------------------------------
    Hpp = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", Jp, Jp), data["obs_point"], num_segments=np_pts
    )
    bp = jax.ops.segment_sum(
        jnp.einsum("oki,ok->oi", Jp, r), data["obs_point"], num_segments=np_pts
    )
    # Point priors (GCP): diagonal contributions.
    pp_r = (points - data["point_prior"]) * data["point_prior_inv_sd"]
    pp_w = data["point_prior_inv_sd"] ** 2
    Hpp = Hpp + jax.vmap(jnp.diag)(pp_w)
    bp = bp + pp_r * data["point_prior_inv_sd"]

    # LM damping (Marquardt: scale diagonals).
    diag_S = jnp.diagonal(S)
    S = S + jnp.diag(lam * diag_S + 1e-12)
    eyep = jnp.eye(3, dtype=dtype)
    Hpp = Hpp + lam * jax.vmap(jnp.diag)(jnp.diagonal(Hpp, axis1=1, axis2=2)) \
        + 1e-12 * eyep
    opt_p_pts = data["opt_points"].astype(dtype)[:, None, None]
    Hpp_inv = jnp.linalg.inv(Hpp) * opt_p_pts  # fixed points: no update/Schur

    # --- Schur complement --------------------------------------------------
    G = jnp.einsum("oki,okj->oij", Jc, Jp)  # [O, 28, 3]
    Hib = jnp.einsum("pij,pj->pi", Hpp_inv, bp)  # [NP,3]
    b = b.at[cols].add(-jnp.einsum("oij,oj->oi", G, Hib[data["obs_point"]]))

    T = data["point_obs"].shape[1]
    num_obs = r.shape[0]
    # Trash observation slot: index num_obs with zero G / cols -> dc.
    G_pad = jnp.concatenate([G, jnp.zeros((1, G.shape[1], 3), dtype=dtype)])
    cols_pad = jnp.concatenate([cols, jnp.full((1, cols.shape[1]), dc)])
    po = data["point_obs"]  # [NP, T], padded with num_obs

    def pair_body(k, S):
        a, bb = k // T, k % T
        o1 = po[:, a]
        o2 = po[:, bb]
        G1 = G_pad[o1]  # [NP,28,3]
        G2 = G_pad[o2]
        M = jnp.einsum("pij,pjk,plk->pil", G1, Hpp_inv, G2)  # [NP,28,28]
        c1 = cols_pad[o1]  # [NP,28]
        c2 = cols_pad[o2]
        return S.at[c1[:, :, None], c2[:, None, :]].add(-M)

    S = jax.lax.fori_loop(0, T * T, pair_body, S)

    # --- solve -------------------------------------------------------------
    # Decouple the trash row/col (fixed & padded dims scatter there).
    S = 0.5 * (S + S.T)
    S = S.at[dc, :].set(0.0).at[:, dc].set(0.0).at[dc, dc].set(1.0)
    b = b.at[dc].set(0.0)
    dx_c = jnp.linalg.solve(S, b)

    # Back-substitute points: dx_p = Hpp_inv (bp - sum_o G_o^T dx_c[cols_o]).
    u = jnp.einsum("oij,oi->oj", G, dx_c[cols])  # [O,3]
    su = jax.ops.segment_sum(u, data["obs_point"], num_segments=np_pts)
    dx_p = jnp.einsum("pij,pj->pi", Hpp_inv, bp - su)

    # --- update ------------------------------------------------------------
    dxc = dx_c[:dc]
    d_inst = dxc[: ni * 6].reshape(ni, 6)
    d_rig = dxc[ni * 6 : ni * 6 + nr * 6].reshape(nr, 6)
    d_cam = dxc[ni * 6 + nr * 6 :].reshape(nc, pmax)
    new_state = (
        inst - d_inst,
        rigcam - d_rig,
        cam - d_cam,
        points - dx_p,
    )
    return new_state


@partial(
    jax.jit, static_argnames=("ptype", "loss", "loss_threshold", "pmax")
)
def _total_cost(state, data, ptype, loss, loss_threshold, pmax):
    _, _, _, obs_cost = _residual_data(state, data, ptype, loss, loss_threshold, pmax)
    total = jnp.sum(obs_cost)
    for pr, _, _ in _prior_residuals(state, data):
        total = total + 0.5 * jnp.sum(pr * pr)
    # Point priors.
    points = state[3]
    pp_r = (points - data["point_prior"]) * data["point_prior_inv_sd"]
    total = total + 0.5 * jnp.sum(pp_r * pp_r)
    return total


def bundle_adjust(
    problem: BAProblem,
    max_iterations: int = 50,
    initial_lambda: float = 1e-4,
    tol: float = 1e-10,
    dtype=np.float64,
) -> BAResult:
    """Run LM to convergence (host-controlled damping loop; each trial step
    and cost evaluation is one fused jitted device call)."""
    ni, nr, nc, npts, num_obs, T = problem.counts()
    pmax = problem.cam.shape[1]

    state = (
        jnp.asarray(problem.inst, dtype=dtype),
        jnp.asarray(problem.rigcam, dtype=dtype),
        jnp.asarray(problem.cam, dtype=dtype),
        jnp.asarray(problem.points, dtype=dtype),
    )
    data = {
        "obs_uv": jnp.asarray(problem.obs_uv, dtype=dtype),
        "obs_inv_sd": jnp.asarray(problem.obs_inv_sd, dtype=dtype),
        "obs_point": jnp.asarray(problem.obs_point, dtype=jnp.int32),
        "obs_inst": jnp.asarray(problem.obs_inst, dtype=jnp.int32),
        "obs_rigcam": jnp.asarray(problem.obs_rigcam, dtype=jnp.int32),
        "obs_cam": jnp.asarray(problem.obs_cam, dtype=jnp.int32),
        "point_obs": jnp.asarray(problem.point_obs, dtype=jnp.int32),
        "gps_pos": jnp.asarray(problem.gps_pos, dtype=dtype),
        "gps_inv_sd": jnp.asarray(problem.gps_inv_sd, dtype=dtype),
        "cam_prior": jnp.asarray(problem.cam_prior, dtype=dtype),
        "cam_prior_inv_sd": jnp.asarray(problem.cam_prior_inv_sd, dtype=dtype),
        "cam_log_mask": jnp.asarray(problem.cam_log_mask, dtype=bool),
        "rigcam_prior": jnp.asarray(problem.rigcam_prior, dtype=dtype),
        "rigcam_prior_inv_sd": jnp.asarray(problem.rigcam_prior_inv_sd, dtype=dtype),
        "point_prior": jnp.asarray(problem.point_prior, dtype=dtype),
        "point_prior_inv_sd": jnp.asarray(problem.point_prior_inv_sd, dtype=dtype),
        "opt_inst": jnp.asarray(problem.opt_inst, dtype=bool),
        "opt_rigcam": jnp.asarray(problem.opt_rigcam, dtype=bool),
        "opt_cam": jnp.asarray(problem.opt_cam, dtype=bool),
        "opt_points": jnp.asarray(problem.opt_points, dtype=bool),
    }
    statics = dict(
        ptype=problem.ptype, loss=problem.loss,
        loss_threshold=float(problem.loss_threshold), pmax=pmax,
    )

    cost = float(_total_cost(state, data, **statics))
    initial_cost = cost
    lam = initial_lambda
    iters_done = 0
    for it in range(max_iterations):
        accepted = False
        for _trial in range(8):
            new_state = _lm_step(
                state, data, lam, ni=ni, nr=nr, nc=nc, **statics
            )
            new_cost = float(_total_cost(new_state, data, **statics))
            if np.isfinite(new_cost) and new_cost < cost:
                rel = (cost - new_cost) / max(cost, 1e-30)
                state = new_state
                cost = new_cost
                lam = max(lam / 3.0, 1e-12)
                accepted = True
                break
            lam = min(lam * 10.0, 1e8)
        iters_done = it + 1
        if not accepted:
            break
        if accepted and rel < tol:
            break

    return BAResult(
        inst=np.asarray(state[0]),
        rigcam=np.asarray(state[1]),
        cam=np.asarray(state[2]),
        points=np.asarray(state[3]),
        initial_cost=initial_cost,
        final_cost=cost,
        iterations=iters_done,
        lam=lam,
    )
