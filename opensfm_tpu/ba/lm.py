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

from opensfm_tpu.ops import linalg as tpu_linalg

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

    # Up-vector priors (AddAbsoluteUpVector, bundle_adjuster.cc:957-972):
    # residual (R_cam_to_world(shot) @ up_vec - z_world) / sd, Cauchy(1).
    up_inst: Optional[np.ndarray] = None  # [KU] int
    up_rigcam: Optional[np.ndarray] = None  # [KU] int
    up_vec: Optional[np.ndarray] = None  # [KU, 3] unit, camera frame
    up_inv_sd: Optional[np.ndarray] = None  # [KU]

    # Absolute pan/tilt/roll priors (bundle_adjuster.cc:974-1027): angle of
    # the shot's world-frame viewing direction, Cauchy(1).
    ang_kind: Optional[np.ndarray] = None  # [KA] int: 0 pan, 1 tilt, 2 roll
    ang_inst: Optional[np.ndarray] = None  # [KA] int
    ang_rigcam: Optional[np.ndarray] = None  # [KA] int
    ang_value: Optional[np.ndarray] = None  # [KA] radians
    ang_inv_sd: Optional[np.ndarray] = None  # [KA]

    # Per-observation depth priors (RelativeDepthError,
    # error/relative_depth_error.h:11-45): (depth(Xc) - depth) / sd with the
    # projection robust loss; inv_sd == 0 disables a row.
    obs_depth: Optional[np.ndarray] = None  # [O]
    obs_depth_inv_sd: Optional[np.ndarray] = None  # [O]
    obs_depth_radial: Optional[np.ndarray] = None  # [O] bool

    # Optional per-point Cauchy threshold (in weighted-residual units) for
    # the position prior rows; 0/None = plain quadratic (reference behavior,
    # AddPointPrior carries no loss).  Used for GCP priors: their std is
    # scaled by the reference's gcp global weight (~5x below the survey
    # noise), so one bad GCP draw otherwise deforms the whole model.
    point_prior_loss: Optional[np.ndarray] = None  # [NP]

    # ------------------------------------------------------------------
    # Cluster-SfM scale variables (bundle_adjuster.h:206-212): one entry
    # per (reconstruction, instance) scale -- or one shared entry per
    # reconstruction with SetScaleSharing.  Instances reference a scale
    # through the rm_si/rm_sj indices below.
    scales: Optional[np.ndarray] = None       # [NS]
    opt_scales: Optional[np.ndarray] = None   # [NS] bool

    # Relative motion constraints (AddRelativeMotion, bundle_adjuster.h:220;
    # RelativeMotionError, error/relative_motion_errors.h:13-68): 7 rows
    # (rotation log, scaled translation, scale ratio) between two rig
    # instances, Cauchy(loss_threshold * robust_multiplier).
    rm_i: Optional[np.ndarray] = None         # [KM] instance idx i
    rm_j: Optional[np.ndarray] = None         # [KM] instance idx j
    rm_si: Optional[np.ndarray] = None        # [KM] scale idx of i
    rm_sj: Optional[np.ndarray] = None        # [KM] scale idx of j
    rm_rvec: Optional[np.ndarray] = None      # [KM,3] observed rotation (c2w)
    rm_tvec: Optional[np.ndarray] = None      # [KM,3] observed translation
    rm_scale: Optional[np.ndarray] = None     # [KM] observed scale ratio
    rm_inv_sd: Optional[np.ndarray] = None    # [KM,7] scale-matrix diagonal
    rm_obs_scale: Optional[np.ndarray] = None  # [KM] bool
    rm_loss_c: Optional[np.ndarray] = None    # [KM] Cauchy threshold

    # Relative rotation constraints (AddRelativeRotation; 3 rows between
    # two shots incl. rig-camera composition, Cauchy(threshold)).
    rr_i: Optional[np.ndarray] = None         # [KR] instance idx i
    rr_j: Optional[np.ndarray] = None         # [KR] instance idx j
    rr_ri: Optional[np.ndarray] = None        # [KR] rig camera idx i
    rr_rj: Optional[np.ndarray] = None        # [KR] rig camera idx j
    rr_rvec: Optional[np.ndarray] = None      # [KR,3] observed rotation (c2w)
    rr_inv_sd: Optional[np.ndarray] = None    # [KR,3] scale-matrix diagonal
    rr_loss_c: Optional[np.ndarray] = None    # [KR] Cauchy threshold

    # Common position constraints (AddCommonPosition; Tukey(1)).
    cp_i: Optional[np.ndarray] = None         # [KC] instance idx i
    cp_j: Optional[np.ndarray] = None         # [KC] instance idx j
    cp_ri: Optional[np.ndarray] = None        # [KC] rig camera idx i
    cp_rj: Optional[np.ndarray] = None        # [KC] rig camera idx j
    cp_margin: Optional[np.ndarray] = None    # [KC]
    cp_inv_sd: Optional[np.ndarray] = None    # [KC]

    # Linear motion priors (AddLinearMotion; LinearMotionError,
    # error/motion_prior_errors.h:12-78; 6 rows over three shots,
    # Cauchy(1)).
    lin_i0: Optional[np.ndarray] = None       # [KL] instance idx shot0
    lin_i1: Optional[np.ndarray] = None
    lin_i2: Optional[np.ndarray] = None
    lin_r0: Optional[np.ndarray] = None       # [KL] rig camera idx shot0
    lin_r1: Optional[np.ndarray] = None
    lin_r2: Optional[np.ndarray] = None
    lin_alpha: Optional[np.ndarray] = None    # [KL]
    lin_pos_inv_sd: Optional[np.ndarray] = None   # [KL]
    lin_rot_inv_sd: Optional[np.ndarray] = None   # [KL]

    # Absolute position heatmaps (AddAbsolutePositionHeatmap;
    # HeatmapdCostFunctor, error/absolute_motion_errors.h:135-180): 1 row =
    # bicubic lookup of a cost grid at the shot position, no loss.
    hm_inst: Optional[np.ndarray] = None      # [KH] instance idx
    hm_rigcam: Optional[np.ndarray] = None    # [KH] rig camera idx
    hm_map: Optional[np.ndarray] = None       # [KH] heatmap idx
    hm_offset: Optional[np.ndarray] = None    # [KH,2] (x_offset, y_offset)
    hm_inv_sd: Optional[np.ndarray] = None    # [KH]
    heatmaps: Optional[np.ndarray] = None     # [NH,H,W] grids
    hm_res: Optional[np.ndarray] = None       # [NH] meters per cell

    # Gauge fixing (SetGaugeFixShots; TranslationPriorError,
    # error/absolute_motion_errors.h:182-203): log(|o_i - o_j| / norm).
    gauge_i: Optional[np.ndarray] = None      # [KG] instance idx
    gauge_j: Optional[np.ndarray] = None      # [KG] instance idx
    gauge_norm: Optional[np.ndarray] = None   # [KG]

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
    scales: Optional[np.ndarray] = None
    initial_cost: float = 0.0
    final_cost: float = 0.0
    iterations: int = 0
    lam: float = 0.0
    # Marginal 6x6 covariances per rig instance (ComputeCovariances,
    # bundle_adjuster.cc:1123-1194); None unless requested.
    covariances: Optional[np.ndarray] = None  # [NI, 6, 6]
    covariance_valid: bool = False


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


@partial(
    jax.jit,
    static_argnames=("ptype", "loss", "loss_threshold", "pmax", "with_depth",
                     "rig_transform", "rig_jac", "canonical", "dense"),
)
def _residual_data(state, data, ptype, loss, loss_threshold, pmax,
                   with_depth=False, rig_transform=True, rig_jac=True,
                   canonical=False, dense=False):
    """Per-observation weighted residuals + Jacobians + robust IRLS weights.

    `ptype` is either a single projection type string or a tuple of
    (type, start, end) static segments over type-sorted observations
    (mixed-camera problems).  Returns r[O,K], Jc[O,K,28], Jp[O,K,3] already
    scaled by sqrt(w), plus the per-obs robust cost for the objective.
    K = 2, or 3 when `with_depth` adds the depth-prior row
    (RelativeDepthError: a separate Ceres block sharing the projection loss,
    so it carries its own IRLS weight).

    `rig_transform=False` (all rig cameras identity — the mono-pipeline
    case) drops the rig rotation from the chain; `rig_jac=False` (no rig
    camera is optimized — identity OR calibrated-and-locked rigs) drops its
    6 Jacobian columns: Jc is then [O, K, 6+pmax] and the caller skips every
    r-family block."""
    inst, rigcam, cam, points = state[:4]
    d = data
    roff = 12 if rig_transform else 6  # camera-params offset inside combo

    # TPU fast path: the dominant configuration (mono perspective, f32, no
    # depth priors) has a fused Pallas kernel that computes residual + all
    # Jacobian columns + robust cost in one VMEM pass (~6x less HBM traffic
    # than XLA's schedule of the 12 JVP pushes below).
    if (
        ptype == "perspective"
        and not rig_transform
        and not rig_jac
        and not with_depth
        and pmax == 3
        and points.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        from opensfm_tpu.ops.pallas_kernels.ba_resjac import (
            fused_residual_jacobian,
        )

        num_obs = d["obs_uv"].shape[0]
        np_pts = points.shape[0]
        # Canonical (point, slot) layout: gathers lower to repeat/one-hot;
        # dense instance-slot layout: the instance table simply tiles.
        point_repeat = num_obs // np_pts if canonical else 0

        return fused_residual_jacobian(
            inst, cam, points, d["obs_inst"], d["obs_cam"], d["obs_point"],
            d["obs_uv"], d["obs_inv_sd"], loss=loss,
            loss_threshold=loss_threshold, point_repeat=point_repeat,
            dense_inst=dense,
        )

    def make_batched(pt):
        def res_fn(combo, X, uv, inv_sd, dep):
            # combo: [O, roff+pmax]; X: [O, 3] — fully vectorized over obs.
            Xi = rot.rotate(combo[:, 0:3], X) + combo[:, 3:6]
            if rig_transform:
                Xc = rot.rotate(combo[:, 6:9], Xi) + combo[:, 9:12]
            else:
                Xc = Xi
            pred = cam_lib.project(pt, Xc, combo[:, roff : roff + pmax], xp=jnp)
            diff = pred - uv
            if pt == "spherical":
                # Wrap the panorama seam (the reference instead uses a 3D
                # bearing residual, ErrorTraits bundle_adjuster.cc:446).
                diff = diff - jnp.round(diff)
            out = diff * inv_sd[:, None]
            if with_depth:
                depth_val, depth_inv_sd, radial = dep
                norm = jnp.sqrt(jnp.sum(Xc * Xc, axis=-1) + 1e-30)
                pred_depth = jnp.where(radial, norm, Xc[:, 2])
                r_d = (pred_depth - depth_val) * depth_inv_sd
                out = jnp.concatenate([out, r_d[:, None]], axis=1)
            return out

        return res_fn

    segments = ((ptype, 0, d["obs_uv"].shape[0]),) if isinstance(ptype, str) else ptype
    rs, Jcs, Jps = [], [], []
    D = roff + pmax
    # Tangent directions to push: skip the rig-camera block when unused.
    if rig_transform and not rig_jac:
        push_dirs = list(range(0, 6)) + list(range(12, D + 3))
    else:
        push_dirs = list(range(D + 3))
    for pt, start, end in segments:
        sl = slice(start, end)
        parts = [inst[d["obs_inst"][sl]]]
        if rig_transform:
            parts.append(rigcam[d["obs_rigcam"][sl]])
        parts.append(cam[d["obs_cam"][sl]])
        combo = jnp.concatenate(parts, axis=1)
        X = points[d["obs_point"][sl]]
        uv = d["obs_uv"][sl]
        inv_sd = d["obs_inv_sd"][sl]
        dep = (
            (d["obs_depth"][sl], d["obs_depth_inv_sd"][sl],
             d["obs_depth_radial"][sl])
            if with_depth else None
        )
        f = make_batched(pt)
        r_ = f(combo, X, uv, inv_sd, dep)

        # Jacobians as an unrolled loop of (D+3) fully-vectorized JVPs, one
        # per tangent-basis direction.  The unrolled form lets XLA CSE the
        # shared primal trig across directions and fuse each push into one
        # [O]-major elementwise kernel; the vmap-over-basis form instead
        # materializes [D+3, O, K] intermediates in T(1,128) layouts
        # (measured 2.2x slower on v5e), and an analytic chain-rule variant
        # (JVPs only through the projection head + closed-form pose chain)
        # was 3x slower again — [O,K,3,3] broadcast chains and transposes
        # lose to XLA's fusion of plain JVP pushes.
        basis = np.eye(D + 3, dtype=np.float32)

        def push(e):
            tc = jnp.broadcast_to(jnp.asarray(e[:D], dtype=combo.dtype), combo.shape)
            tx = jnp.broadcast_to(jnp.asarray(e[D:], dtype=X.dtype), X.shape)
            return jax.jvp(
                lambda c, x: f(c, x, uv, inv_sd, dep), (combo, X), (tc, tx)
            )[1]

        cols = [push(basis[k]) for k in push_dirs]  # per pushed dir: [O, K]
        n_cam_dirs = len(push_dirs) - 3
        Jc_ = jnp.stack(cols[:n_cam_dirs], axis=-1)  # [O, K, D or 6+pmax]
        Jp_ = jnp.stack(cols[n_cam_dirs:], axis=-1)  # [O, K, 3]
        rs.append(r_)
        Jcs.append(Jc_)
        Jps.append(Jp_)
    r = jnp.concatenate(rs) if len(rs) > 1 else rs[0]
    Jc = jnp.concatenate(Jcs) if len(Jcs) > 1 else Jcs[0]
    Jp = jnp.concatenate(Jps) if len(Jps) > 1 else Jps[0]

    rho, drho = LOSSES[loss]
    a2 = loss_threshold * loss_threshold
    s_proj = jnp.sum(r[:, :2] * r[:, :2], axis=-1)
    cost = 0.5 * a2 * rho(s_proj / a2)
    w_proj = drho(s_proj / a2)
    if with_depth:
        s_dep = r[:, 2] * r[:, 2]
        cost = cost + 0.5 * a2 * rho(s_dep / a2)
        w_dep = drho(s_dep / a2)
        w = jnp.stack([w_proj, w_proj, w_dep], axis=1)
    else:
        w = w_proj[:, None]
    sw = jnp.sqrt(jnp.maximum(w, 1e-12))
    if sw.shape[1] == 1:
        sw = jnp.broadcast_to(sw, r.shape)
    return r * sw, Jc * sw[..., None], Jp * sw[..., None], cost


def _prior_residuals(state, data):
    """Prior residual/Jacobian blocks (quadratic loss).

    Returns list of (r[N,K], J[N,K,D], block_kind, idx) per prior family.
    """
    inst, rigcam, cam, points = state[:4]
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


def _inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate / det).

    jnp.linalg.inv lowers to batched LU with pivoting, which serializes on
    TPU; the adjugate form is nine fused multiplies on the VPU (~4x faster
    at NP=8192, measured on v5e)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    adj = jnp.stack(
        [co00, co01, co02, co10, co11, co12, co20, co21, co22], axis=-1
    ).reshape(A.shape)
    return adj / det[..., None, None]


def canonicalize_problem(problem: "BAProblem") -> "BAProblem":
    """Reorder observations into padded (point, slot) flat layout.

    After this, `point_obs[p, t] == p*T + t` and every obs array has length
    NP*T (pad slots carry obs_inv_sd == 0, which zeroes their residual and
    Jacobian rows).  The jitted core can then reshape [NP*T] -> [NP, T]
    instead of gathering through the CSR index — the gather was ~1/3 of the
    LM step wall time on TPU.  Idempotent; cheap (one numpy fancy-index)."""
    if not isinstance(problem.ptype, str):
        # Mixed-camera problems keep type-sorted obs segments; the (point,
        # slot) order would interleave projection types.  Gather path stays.
        return problem
    NP, T = problem.point_obs.shape
    O = len(problem.obs_uv)
    po = np.asarray(problem.point_obs)
    if O == NP * T and np.array_equal(
        po, np.arange(NP * T, dtype=po.dtype).reshape(NP, T)
    ):
        return problem
    valid = po < O
    idx = np.where(valid, po, 0)

    def take(x, fill=0):
        out = np.asarray(x)[idx]
        out[~valid] = fill
        return out.reshape((NP * T,) + x.shape[1:])

    import dataclasses

    repl = dict(
        obs_uv=take(problem.obs_uv, 0.0),
        obs_inv_sd=take(problem.obs_inv_sd, 0.0),
        obs_point=np.repeat(
            np.arange(NP, dtype=problem.obs_point.dtype), T
        ),
        obs_inst=take(problem.obs_inst, 0),
        obs_rigcam=take(problem.obs_rigcam, 0),
        obs_cam=take(problem.obs_cam, 0),
        point_obs=np.arange(NP * T, dtype=po.dtype).reshape(NP, T),
    )
    if problem.obs_depth is not None:
        repl["obs_depth"] = take(problem.obs_depth, 0.0)
    if problem.obs_depth_inv_sd is not None:
        repl["obs_depth_inv_sd"] = take(problem.obs_depth_inv_sd, 0.0)
    if problem.obs_depth_radial is not None:
        repl["obs_depth_radial"] = take(problem.obs_depth_radial, False)
    return dataclasses.replace(problem, **repl)


def canonicalize_problem_dense(problem: "BAProblem", max_waste: int = 8,
                               max_slots: int = 1 << 22):
    """Re-layout observations on the dense [NP, NI] instance-slot grid.

    Slot index == rig-instance index, so `obs_inst == tile(arange(NI), NP)`
    and `obs_point == repeat(arange(NP), NI)` both become implicit: every
    one-hot selector in the reduced-system assembly degenerates to the
    identity and disappears (no [O, NI] selector traffic, no relayouts).
    Dead (point, instance) slots carry obs_inv_sd == 0.

    Applies only to mono single-camera problems (identity rig chain, one
    camera) whose densified size stays within `max_waste` x the real
    observation count (or `max_slots` slots); anything else falls back to
    `canonicalize_problem`.  The distributed dense-grid route passes
    larger caps: on the MXU the redundant zero-weight slots are cheaper
    than the sparse layout's index traffic up to far higher waste ratios
    (the fused Pallas assembly processes the 32x-padded 256-cam bench
    problem ~4x faster than the sparse assembled-Schur step).
    Returns (problem, dense_flag).
    """
    if not isinstance(problem.ptype, str):
        return canonicalize_problem(problem), False
    ni = len(problem.inst)
    np_pts = len(problem.points)
    O = len(problem.obs_uv)
    dense_O = np_pts * ni
    mono = (
        len(problem.cam) == 1
        and not bool(np.asarray(problem.opt_rigcam).any())
        and float(np.abs(np.asarray(problem.rigcam)).max(initial=0.0)) <= 1e-12
    )
    if not mono or O == 0 or (dense_O > max_waste * O
                              and dense_O > max_slots):
        return canonicalize_problem(problem), False
    o_new = (
        np.asarray(problem.obs_point, dtype=np.int64) * ni
        + np.asarray(problem.obs_inst, dtype=np.int64)
    )
    if np.unique(o_new).size != O:  # duplicate (point, instance) pair
        return canonicalize_problem(problem), False

    def scatter(x, fill=0.0):
        x = np.asarray(x)
        out = np.full((dense_O,) + x.shape[1:], fill, dtype=x.dtype)
        out[o_new] = x
        return out

    import dataclasses

    repl = dict(
        obs_uv=scatter(problem.obs_uv),
        obs_inv_sd=scatter(problem.obs_inv_sd),
        obs_point=np.repeat(
            np.arange(np_pts, dtype=np.int64), ni
        ).astype(np.asarray(problem.obs_point).dtype),
        obs_inst=np.tile(
            np.arange(ni, dtype=np.int64), np_pts
        ).astype(np.asarray(problem.obs_inst).dtype),
        obs_rigcam=np.zeros(dense_O, dtype=np.asarray(problem.obs_rigcam).dtype),
        obs_cam=np.zeros(dense_O, dtype=np.asarray(problem.obs_cam).dtype),
        point_obs=np.arange(dense_O, dtype=np.int64).reshape(np_pts, ni),
    )
    if problem.obs_depth is not None:
        repl["obs_depth"] = scatter(problem.obs_depth)
    if problem.obs_depth_inv_sd is not None:
        repl["obs_depth_inv_sd"] = scatter(problem.obs_depth_inv_sd)
    if problem.obs_depth_radial is not None:
        repl["obs_depth_radial"] = scatter(problem.obs_depth_radial, False)
    return dataclasses.replace(problem, **repl), True


def _wrap_angle(a):
    """Wrap to (-pi, pi] (DiffBetweenAngles, error_utils.h)."""
    return a - 2.0 * jnp.pi * jnp.round(a / (2.0 * jnp.pi))


def _point_prior_sqrt_weight(points, data):
    """Per-point sqrt(Cauchy IRLS weight) for the position-prior rows, or
    None when every prior is quadratic (`point_prior_loss` absent)."""
    c = data.get("point_prior_loss")
    if c is None:
        return None
    pp_r = (points - data["point_prior"]) * data["point_prior_inv_sd"]
    s = jnp.sum(pp_r * pp_r, axis=-1, keepdims=True)
    c2 = jnp.where(c[:, None] > 0, c[:, None] * c[:, None], 1.0)
    w = jnp.where(c[:, None] > 0, 1.0 / (1.0 + s / c2), 1.0)
    return jnp.sqrt(w)


def _point_prior_cost(points, data):
    """Total point-prior objective (quadratic or per-point Cauchy)."""
    pp_r = (points - data["point_prior"]) * data["point_prior_inv_sd"]
    s = jnp.sum(pp_r * pp_r, axis=-1)
    c = data.get("point_prior_loss")
    if c is None:
        return 0.5 * jnp.sum(s)
    c2 = jnp.where(c > 0, c * c, 1.0)
    per = jnp.where(c > 0, 0.5 * c2 * jnp.log1p(s / c2), 0.5 * s)
    return jnp.sum(per)


def _shot_prior_residuals(state, data, raw=False):
    """Up-vector and pan/tilt/roll rows on (instance, rig camera) pairs.

    Mirrors UpVectorError/PanAngleError/TiltAngleError/RollAngleError
    (error/absolute_motion_errors.h:12-130) translated to our world-to-cam
    parametrization: the reference's cam-to-world rotation action is
    R_i^T (R_rc^T v).  Cauchy(1) robust weights per row family
    (bundle_adjuster.cc:957-1027).

    Returns list of (r[K,M], Ji[K,M,6], Jr[K,M,6], idx_inst, idx_rigcam)
    with sqrt-IRLS weights applied; with raw=True, just the unweighted
    residuals [K,M] (for the true objective)."""
    inst, rigcam = state[0], state[1]
    d = data
    out = []
    cauchy_w = LOSSES["CauchyLoss"][1]

    def cam_to_world(i6, r6, v):
        return rot.rotate(-i6[:3], rot.rotate(-r6[:3], v))

    def emit(res_fn, args, idx_i, idx_r):
        r = jax.vmap(res_fn)(*args)
        if raw:
            out.append(r)
            return
        Ji = jax.vmap(jax.jacfwd(res_fn, argnums=0))(*args)
        Jr = jax.vmap(jax.jacfwd(res_fn, argnums=1))(*args)
        s = jnp.sum(r * r, axis=-1, keepdims=True)
        sw = jnp.sqrt(jnp.maximum(cauchy_w(s), 1e-12))
        out.append((r * sw, Ji * sw[..., None], Jr * sw[..., None], idx_i, idx_r))

    up_vec_arr = d.get("up_vec")
    if up_vec_arr is not None and up_vec_arr.shape[0] > 0:

        def up_res(i6, r6, vec, inv_sd):
            z_world = cam_to_world(i6, r6, vec)
            return (z_world - jnp.array([0.0, 0.0, 1.0], dtype=i6.dtype)) * inv_sd

        emit(
            up_res,
            (inst[d["up_inst"]], rigcam[d["up_rigcam"]],
             d["up_vec"], d["up_inv_sd"][:, None]),
            d["up_inst"], d["up_rigcam"],
        )

    ang_value_arr = d.get("ang_value")
    if ang_value_arr is not None and ang_value_arr.shape[0] > 0:

        def ang_res(i6, r6, kind, value, inv_sd):
            dt = i6.dtype
            ez = jnp.array([0.0, 0.0, 1.0], dtype=dt)
            ex = jnp.array([1.0, 0.0, 0.0], dtype=dt)
            zw = cam_to_world(i6, r6, ez)
            # pan (compass): bearing of the view direction in the ground plane
            horiz = jnp.sqrt(zw[0] ** 2 + zw[1] ** 2)
            pan_pred = jnp.arctan2(zw[0], zw[1])
            pan = jnp.where(horiz < 1e-8, 0.0, _wrap_angle(pan_pred - value))
            # tilt: elevation of the view direction
            tilt_pred = -jnp.arctan2(zw[2], horiz)
            tilt = _wrap_angle(tilt_pred - value)
            # roll: rotation about the view axis (RollAngleError:63-105)
            xw = cam_to_world(i6, r6, ex)
            a = jnp.stack([zw[1], -zw[0], 0.0 * zw[0]])
            la = jnp.sqrt(a[0] ** 2 + a[1] ** 2)
            a = a / jnp.maximum(la, 1e-12)
            b = jnp.cross(xw, a)
            sin_roll = jnp.clip(jnp.dot(zw, b), -1.0 + 1e-9, 1.0 - 1e-9)
            roll_pred = jnp.arcsin(sin_roll)
            roll = jnp.where(
                (la < 1e-5) | (sin_roll <= -(1.0 - 1e-5)),
                0.0, _wrap_angle(roll_pred - value),
            )
            res = jnp.where(kind == 0, pan, jnp.where(kind == 1, tilt, roll))
            return (res * inv_sd)[None]

        emit(
            ang_res,
            (inst[d["ang_inst"]], rigcam[d["ang_rigcam"]],
             d["ang_kind"], d["ang_value"], d["ang_inv_sd"]),
            d["ang_inst"], d["ang_rigcam"],
        )

    return out


# ---------------------------------------------------------------------------
# Pose-graph constraint rows (relative motion/rotation, common position,
# linear motion, heatmaps, gauge fix) — the bundle_adjuster.h:220-252
# families.  They couple 2-3 rig instances (plus scale variables), so they
# fold into the DENSE reduced system as scattered J^T J rows after the
# Schur-reduced projection blocks are assembled: the constraint counts are
# pose-graph sized (tens to thousands), never observation-sized.
# ---------------------------------------------------------------------------


def _rotmat_c2w(rvec_w2c):
    """Cam-to-world rotation matrix from our world-to-cam angle-axis."""
    return rot.rotvec_to_matrix(-rvec_w2c)


def _shot_pos(i6, r6=None):
    """Shot origin in world coords (ShotPositionFunctor,
    error/position_functors.h:12-38, translated to world-to-cam storage)."""
    o = _origin(i6)
    if r6 is None:
        return o
    return o + rot.rotate(-i6[:3], _origin(r6))


def _shot_rot_c2w(i6, r6=None):
    """Shot cam-to-world rotation matrix incl. rig camera composition
    (ShotRotationFunctor, position_functors.h:40-64)."""
    Ri = _rotmat_c2w(i6[:3])
    if r6 is None:
        return Ri
    return Ri @ _rotmat_c2w(r6[:3])


def _log_rot(Rm):
    """Rotation-matrix logarithm as angle-axis (MultRotations residuals)."""
    return rot.matrix_to_rotvec(Rm)


def _bicubic(grid, row, col):
    """Catmull-Rom bicubic interpolation of grid[H, W] at fractional
    (row, col), borders clamped — matches ceres::BiCubicInterpolator over
    Grid2D semantics used by the heatmap cost."""
    H, W = grid.shape
    r0 = jnp.floor(row)
    c0 = jnp.floor(col)
    tr = row - r0
    tc = col - c0

    def weights(t):
        return jnp.stack(
            [
                ((-0.5 * t + 1.0) * t - 0.5) * t,
                (1.5 * t - 2.5) * t * t + 1.0,
                ((-1.5 * t + 2.0) * t + 0.5) * t,
                (0.5 * t - 0.5) * t * t,
            ]
        )

    wr = weights(tr)  # [4]
    wc = weights(tc)
    offs = jnp.arange(-1, 3)
    ri = jnp.clip(r0.astype(jnp.int32) + offs, 0, H - 1)
    ci = jnp.clip(c0.astype(jnp.int32) + offs, 0, W - 1)
    patch = grid[ri[:, None], ci[None, :]]  # [4, 4]
    return wr @ patch @ wc


def _graph_residuals(state, data, raw=False):
    """All pose-graph constraint rows as (r_w, slots) blocks.

    Each block: r_w [K, M] sqrt-IRLS-weighted residual rows and `slots` a
    list of (family, idx[K], J_w [K, M, bdim]) Jacobian contributions with
    family in {"i": instances, "r": rig cameras, "s": scales}.  With
    raw=True returns (r_raw [K, M], (loss_kind, c[K]) or None) for the true
    objective.  Losses match bundle_adjuster.cc: Cauchy(threshold *
    robust_multiplier) for relative motion, Cauchy(threshold) for relative
    rotation, Tukey(1) for common position, Cauchy(1) for linear motion,
    none for heatmaps / gauge."""
    inst, rigcam = state[0], state[1]
    scales = state[4] if len(state) > 4 else jnp.zeros((0,), inst.dtype)
    d = data
    out = []

    def emit(res_fn, diff_args, const_args, slots_spec, loss):
        r = jax.vmap(lambda *a: res_fn(*a))(*diff_args, *const_args)  # [K,M]
        if raw:
            out.append((r, loss))
            return
        if loss is None:
            sw = jnp.ones((r.shape[0], 1), r.dtype)
        else:
            kind, c = loss
            s = jnp.sum(r * r, axis=-1, keepdims=True)
            c2 = jnp.where(c[:, None] > 0, c[:, None] * c[:, None], 1.0)
            w = LOSSES[kind][1](s / c2)
            sw = jnp.sqrt(jnp.maximum(jnp.where(c[:, None] > 0, w, 1.0), 1e-12))
        slots = []
        for argnum, (family, idx) in slots_spec:
            J = jax.vmap(jax.jacfwd(res_fn, argnums=argnum))(
                *diff_args, *const_args
            )  # [K, M, bdim] (or [K, M] for scalar args)
            if J.ndim == 2:
                J = J[..., None]
            slots.append((family, idx, J * sw[..., None]))
        out.append((r * sw, slots))

    dtype = inst.dtype

    # --- relative motion (7 rows, two instances + two scales) --------------
    if d.get("rm_i") is not None and d["rm_i"].shape[0] > 0:

        def rm_res(i6a, i6b, sa, sb, rvec, tvec, s_obs, inv_sd, obs_scale):
            rres = _log_rot(
                rot.rotvec_to_matrix(rvec)
                @ _rotmat_c2w(i6a[:3]).T
                @ _rotmat_c2w(i6b[:3])
            )
            oa = _origin(i6a)
            ob = _origin(i6b)
            # tij - s_j * R_j^(w2c) (o_i - o_j)  (relative_motion_errors.h:41)
            tres = tvec - sb * rot.rotate(i6b[:3], oa - ob)
            sres = jnp.where(obs_scale, s_obs - sb / jnp.where(
                jnp.abs(sa) < 1e-30, 1e-30, sa), 0.0)
            return jnp.concatenate([rres, tres, sres[None]]) * inv_sd

        emit(
            rm_res,
            (inst[d["rm_i"]], inst[d["rm_j"]],
             scales[d["rm_si"]], scales[d["rm_sj"]]),
            (d["rm_rvec"], d["rm_tvec"], d["rm_scale"], d["rm_inv_sd"],
             d["rm_obs_scale"]),
            [(0, ("i", d["rm_i"])), (1, ("i", d["rm_j"])),
             (2, ("s", d["rm_si"])), (3, ("s", d["rm_sj"]))],
            ("CauchyLoss", d["rm_loss_c"]),
        )

    # --- relative rotation (3 rows, two shots) -----------------------------
    if d.get("rr_i") is not None and d["rr_i"].shape[0] > 0:

        def rr_res(i6a, i6b, r6a, r6b, rvec, inv_sd):
            Ra = _shot_rot_c2w(i6a, r6a)
            Rb = _shot_rot_c2w(i6b, r6b)
            return _log_rot(rot.rotvec_to_matrix(rvec) @ Ra.T @ Rb) * inv_sd

        emit(
            rr_res,
            (inst[d["rr_i"]], inst[d["rr_j"]],
             rigcam[d["rr_ri"]], rigcam[d["rr_rj"]]),
            (d["rr_rvec"], d["rr_inv_sd"]),
            [(0, ("i", d["rr_i"])), (1, ("i", d["rr_j"])),
             (2, ("r", d["rr_ri"])), (3, ("r", d["rr_rj"]))],
            ("CauchyLoss", d["rr_loss_c"]),
        )

    # --- common position (3 rows, two shots; xy clamped by margin) ---------
    if d.get("cp_i") is not None and d["cp_i"].shape[0] > 0:

        def cp_res(i6a, i6b, r6a, r6b, margin, inv_sd):
            e = _shot_pos(i6a, r6a) - _shot_pos(i6b, r6b)
            exy = jnp.maximum(0.0, jnp.abs(e[:2]) - margin)
            return jnp.concatenate([exy, e[2:3]]) * inv_sd

        ones_c = jnp.ones_like(d["cp_inv_sd"])
        emit(
            cp_res,
            (inst[d["cp_i"]], inst[d["cp_j"]],
             rigcam[d["cp_ri"]], rigcam[d["cp_rj"]]),
            (d["cp_margin"], d["cp_inv_sd"][:, None]),
            [(0, ("i", d["cp_i"])), (1, ("i", d["cp_j"])),
             (2, ("r", d["cp_ri"])), (3, ("r", d["cp_rj"]))],
            ("TukeyLoss", ones_c),
        )

    # --- linear motion (6 rows, three shots) -------------------------------
    if d.get("lin_i0") is not None and d["lin_i0"].shape[0] > 0:

        def lin_res(i60, i61, i62, r60, r61, r62, alpha, pos_inv, rot_inv):
            t0 = _shot_pos(i60, r60)
            t1 = _shot_pos(i61, r61)
            t2 = _shot_pos(i62, r62)
            t20 = t2 - t0
            t10 = t1 - t0
            n20sq = jnp.sum(t20 * t20)
            n10sq = jnp.sum(t10 * t10)
            eps = 1e-15
            big = n20sq > eps * eps
            safe20 = jnp.sqrt(jnp.where(big, n20sq, 1.0))
            safe10 = jnp.sqrt(jnp.maximum(n10sq, 1e-30))
            ratio_form = (alpha - safe10 / safe20) * jnp.ones(3, i60.dtype)
            diff_form = alpha * t20 - t10
            pos = pos_inv * jnp.where(big, ratio_form, diff_form)
            R0 = _shot_rot_c2w(i60, r60)
            R1 = _shot_rot_c2w(i61, r61)
            R2 = _shot_rot_c2w(i62, r62)
            r20 = alpha * _log_rot(R2 @ R0.T)
            r01 = _log_rot(R0 @ R1.T)
            rres = rot_inv * _log_rot(
                rot.rotvec_to_matrix(r20) @ rot.rotvec_to_matrix(r01)
            )
            return jnp.concatenate([pos, rres])

        ones_l = jnp.ones_like(d["lin_alpha"])
        emit(
            lin_res,
            (inst[d["lin_i0"]], inst[d["lin_i1"]], inst[d["lin_i2"]],
             rigcam[d["lin_r0"]], rigcam[d["lin_r1"]], rigcam[d["lin_r2"]]),
            (d["lin_alpha"], d["lin_pos_inv_sd"], d["lin_rot_inv_sd"]),
            [(0, ("i", d["lin_i0"])), (1, ("i", d["lin_i1"])),
             (2, ("i", d["lin_i2"])), (3, ("r", d["lin_r0"])),
             (4, ("r", d["lin_r1"])), (5, ("r", d["lin_r2"]))],
            ("CauchyLoss", ones_l),
        )

    # --- heatmap positions (1 row per shot, no loss) -----------------------
    if d.get("hm_inst") is not None and d["hm_inst"].shape[0] > 0:
        heatmaps = d["heatmaps"]
        H, W = heatmaps.shape[1], heatmaps.shape[2]

        def hm_res(i6, r6, hmap, res, off, inv_sd):
            pos = _shot_pos(i6, r6)
            x = pos[0] - off[0]
            y = pos[1] - off[1]
            row = H / 2.0 - y / res
            col = W / 2.0 + x / res
            return (_bicubic(hmap, row, col) * inv_sd)[None]

        emit(
            hm_res,
            (inst[d["hm_inst"]], rigcam[d["hm_rigcam"]]),
            (heatmaps[d["hm_map"]], d["hm_res"][d["hm_map"]],
             d["hm_offset"], d["hm_inv_sd"]),
            [(0, ("i", d["hm_inst"])), (1, ("r", d["hm_rigcam"]))],
            None,
        )

    # --- gauge fix (1 row, two instances, no loss) -------------------------
    if d.get("gauge_i") is not None and d["gauge_i"].shape[0] > 0:

        def gauge_res(i6a, i6b, norm):
            e = _origin(i6a) - _origin(i6b)
            safe = jnp.sqrt(jnp.sum(e * e) + 1e-20)
            return jnp.log(safe / norm)[None]

        emit(
            gauge_res,
            (inst[d["gauge_i"]], inst[d["gauge_j"]]),
            (d["gauge_norm"],),
            [(0, ("i", d["gauge_i"])), (1, ("i", d["gauge_j"]))],
            None,
        )

    return out


def _graph_cost(state, data):
    """Total pose-graph constraint objective (for accept/reject trials)."""
    total = jnp.zeros((), state[3].dtype)
    for r, loss in _graph_residuals(state, data, raw=True):
        s = jnp.sum(r * r, axis=-1)
        if loss is None:
            total = total + 0.5 * jnp.sum(s)
        else:
            kind, c = loss
            c2 = jnp.where(c > 0, c * c, 1.0)
            rho = LOSSES[kind][0]
            per = jnp.where(c > 0, 0.5 * c2 * rho(s / c2), 0.5 * s)
            total = total + jnp.sum(per)
    return total


_GRAPH_KEYS = ("rm_i", "rr_i", "cp_i", "lin_i0", "hm_inst", "gauge_i")


def _has_graph(data) -> bool:
    return any(
        data.get(k) is not None and data[k].shape[0] > 0 for k in _GRAPH_KEYS
    )


def _fold_graph_rows(S, b, state, data, ni, nr, nc, pmax, ns):
    """Scatter the pose-graph J^T J rows into the dense reduced system."""
    dtype = state[3].dtype
    di, dr, dcam = ni * 6, nr * 6, nc * pmax
    D = di + dr + dcam + ns
    offs = {"i": 0, "r": di, "s": di + dr + dcam}
    n_of = {"i": ni, "r": nr, "s": ns}
    bdim_of = {"i": 6, "r": 6, "s": 1}
    opt_of = {
        "i": data["opt_inst"],
        "r": data["opt_rigcam"],
        "s": data.get("opt_scales"),
    }
    for r_w, slots in _graph_residuals(state, data):
        K, M = r_w.shape
        Jd = jnp.zeros((K, M, D), dtype)
        for family, idx, J in slots:
            opt = opt_of[family]
            if opt is not None:
                J = J * opt[idx].astype(dtype)[:, None, None]
            E = jax.nn.one_hot(idx, n_of[family], dtype=dtype)  # [K, n]
            dense_fam = jnp.einsum("ka,kmx->kmax", E, J).reshape(
                K, M, n_of[family] * bdim_of[family]
            )
            o = offs[family]
            Jd = Jd.at[:, :, o : o + dense_fam.shape[2]].add(dense_fam)
        Jf = Jd.reshape(K * M, D)
        S = S + Jf.T @ Jf
        b = b + Jf.T @ r_w.reshape(K * M)
    return S, b


def _build_reduced_system(state, data, lam, ptype, loss, loss_threshold,
                          pmax, ni, nr, nc, with_depth, canonical=False,
                          rig_transform=True, rig_jac=True, dense=False,
                          raw_blocks=False):
    """Assemble the Schur-reduced camera system.

    Scatter-free assembly (TPU scatters serialize): per-point structure
    comes from the padded (point, slot) layout — a free reshape when
    `canonical` (see `canonicalize_problem`), a CSR gather otherwise — and
    block families of the reduced camera system are contracted with one-hot
    selectors as flat [O, n] matmuls (MXU) over the SMALL index sets
    (instances, rig cameras, cameras).

    `dense` asserts the dense instance-slot layout
    (`canonicalize_problem_dense`: slot index == instance index, T == NI,
    nc == 1, mono): every one-hot selector is then the identity, so the
    E matmuls, their [NP,T,NI] materializations and the relayout copies all
    disappear — block contractions become plain dense reductions over
    [NP, NI, ...].  Implies `canonical`.

    Returns (S, b, back) where `back` carries what back-substitution needs.
    """
    inst, rigcam, cam, points = state[:4]
    np_pts = points.shape[0]
    dtype = points.dtype
    if dense:
        assert canonical and not rig_jac and nc == 1

    # TPU fast path 2: ONE Pallas kernel computes residuals, Jacobians,
    # per-point inverses AND every reduced-system contribution in VMEM
    # (ops/pallas_kernels/ba_assemble.py) — the XLA schedule of the same
    # assembly spends ~2 ms/iter on [O,·] relayout copies and staging.
    if (
        dense
        and ptype == "perspective"
        and not rig_transform
        and not with_depth
        and pmax == 3
        # VMEM ceiling: the kernel keeps the [6ni, 6ni] Schur accumulator
        # resident (9.4 MB at ni=256; vmem_limit_bytes raised accordingly
        # in ba_assemble.py).
        and ni <= 256
        and dtype == jnp.float32
        and np_pts % 128 == 0
        and jax.default_backend() == "tpu"
    ):
        return _build_reduced_system_fused(
            state, data, lam, loss, loss_threshold, ni, nr, nc, pmax,
            raw_blocks=raw_blocks)

    r, Jc, Jp, _ = _residual_data(
        state, data, ptype, loss, loss_threshold, pmax, with_depth,
        rig_transform=rig_transform, rig_jac=rig_jac, canonical=canonical,
        dense=dense,
    )
    num_obs = r.shape[0]

    # Mask Jacobians of fixed parameters (zero rows instead of index games).
    if canonical:
        opt_p = jnp.repeat(
            data["opt_points"].astype(dtype), num_obs // np_pts
        )
    else:
        opt_p = data["opt_points"][data["obs_point"]].astype(dtype)
    Jp = Jp * opt_p[:, None, None]
    if dense:
        # slot == instance: per-obs masks broadcast from the tiny tables.
        opt_i_o = jnp.broadcast_to(
            data["opt_inst"].astype(dtype)[None], (np_pts, ni)
        ).reshape(num_obs)
        opt_c_o = jnp.broadcast_to(
            data["opt_cam"].astype(dtype), (num_obs, pmax)
        )
    else:
        opt_i_o = data["opt_inst"][data["obs_inst"]].astype(dtype)
        opt_c_o = data["opt_cam"][data["obs_cam"]].astype(dtype)  # [O, pmax]
    Ji = Jc[:, :, 0:6] * opt_i_o[:, None, None]
    if rig_jac:
        opt_r_o = data["opt_rigcam"][data["obs_rigcam"]].astype(dtype)
        Jr = Jc[:, :, 6:12] * opt_r_o[:, None, None]
        Jcam = Jc[:, :, 12:] * opt_c_o[:, None, :]
    else:
        Jr = None
        Jcam = Jc[:, :, 6:] * opt_c_o[:, None, :]

    # Per-point layout [NP, T, ...]: reshape when canonical, gather otherwise
    # (trash slot -> zero row).
    if canonical:
        def padded(x):
            return x.reshape((np_pts, -1) + x.shape[1:])
    else:
        po = data["point_obs"]  # [NP, T], padded with O

        def padded(x):
            pad = jnp.zeros((1,) + x.shape[1:], dtype=x.dtype)
            return jnp.concatenate([x, pad])[po]

    r_pt = padded(r)  # [NP,T,2]
    Ji_pt = padded(Ji)  # [NP,T,2,6]
    Jr_pt = padded(Jr) if rig_jac else None
    Jc_pt = padded(Jcam)  # [NP,T,2,pmax]
    Jp_pt = padded(Jp)  # [NP,T,2,3]

    # Flat one-hots feed the direct (non-Schur) terms as [O, n] matmuls;
    # their point-layout views (reshape/gather) feed the Schur factors.
    # Every valid obs appears exactly once in the point layout, so flat sums
    # equal [NP,T] sums; gathered trash slots become all-zero selector rows.
    # 0/1 selectors are exact in bfloat16 — halves the [O, NI] HBM traffic
    # (134 MB at the bench size, read by several contractions); XLA fuses
    # the upconvert into each consuming matmul.
    if dense:
        # slot == instance: every selector is the identity — no one-hots.
        Ei_f = Er_f = Ec_f = None
        E_i = E_r = E_c = None
    else:
        e_dtype = jnp.bfloat16 if dtype == jnp.float32 else dtype
        Ei_f = jax.nn.one_hot(data["obs_inst"], ni, dtype=e_dtype)  # [O,NI]
        Er_f = jax.nn.one_hot(data["obs_rigcam"], nr, dtype=e_dtype)
        Ec_f = jax.nn.one_hot(data["obs_cam"], nc, dtype=e_dtype)
        E_i = padded(Ei_f)  # [NP,T,NI]
        E_r = padded(Er_f) if rig_jac else None
        E_c = padded(Ec_f)

    # --- point system (pure reshaped reductions) ---------------------------
    # Small contractions (k=2, j=3) are written as broadcast-sums throughout:
    # einsum lowers them to per-element MXU dispatches on TPU (measured 3-15x
    # slower than the fused VPU form at these shapes).
    Hpp = jnp.sum(
        Jp_pt[..., :, None] * Jp_pt[..., None, :], axis=(1, 2)
    )  # [NP,3,3]
    bp = jnp.sum(Jp_pt * r_pt[..., None], axis=(1, 2))  # [NP,3]
    pp_sw = _point_prior_sqrt_weight(points, data)
    pp_inv = (
        data["point_prior_inv_sd"]
        if pp_sw is None
        else data["point_prior_inv_sd"] * pp_sw
    )
    pp_r = (points - data["point_prior"]) * pp_inv
    Hpp = Hpp + jax.vmap(jnp.diag)(pp_inv ** 2)
    bp = bp + pp_r * pp_inv
    eyep = jnp.eye(3, dtype=dtype)
    Hpp = Hpp + lam * jax.vmap(jnp.diag)(jnp.diagonal(Hpp, axis1=1, axis2=2)) \
        + 1e-12 * eyep
    opt_p_pts = data["opt_points"].astype(dtype)[:, None, None]
    Hpp_inv = _inv3x3(Hpp) * opt_p_pts

    # --- camera-point couplings and Schur factors --------------------------
    blocks = [("i", Ji_pt, E_i, ni, 6), ("c", Jc_pt, E_c, nc, pmax)]
    if rig_jac:
        blocks.append(("r", Jr_pt, E_r, nr, 6))
    G = {}
    U = {}
    V = {}
    for name, J_pt, E, n_blk, bdim in blocks:
        if n_blk == 1:
            # Single block (typical for cameras/rig cameras): the selector is
            # identically 1, so the T axis collapses into the contraction —
            # one batched [bdim, T*K] @ [T*K, 3] matmul per point, skipping
            # the [NP, T, bdim, 3] Ga/Aa intermediates (~470 MB of HBM
            # traffic for the camera family at the bench size).
            Vg = jnp.einsum("ptkx,ptkj->pxj", J_pt, Jp_pt)  # [NP,bdim,3]
            Ug = jnp.einsum("pxk,pkj->pxj", Vg, Hpp_inv)
            G[name] = None
            U[name] = Ug[:, None]  # [NP,1,bdim,3]
            V[name] = Vg[:, None]
            continue
        Ga = jnp.sum(
            J_pt[..., :, :, None] * Jp_pt[..., :, None, :], axis=2
        )  # [NP,T,bdim,3]
        Aa = jnp.sum(
            Ga[..., None] * Hpp_inv[:, None, None, :, :], axis=-2
        )
        G[name] = Ga
        if dense:
            # slot t IS block index a: the E contraction is the identity.
            U[name] = Aa
            V[name] = Ga
            continue
        # Contractions over T are real matmuls — keep them on the MXU.
        U[name] = jnp.einsum("pta,ptxk->paxk", E, Aa)  # [NP,n,bdim,3]
        V[name] = jnp.einsum("pta,ptxk->paxk", E, Ga)

    # --- block families of S and b (flat MXU matmuls) -----------------------
    flat = {"i": (Ei_f, Ji.reshape(num_obs, -1, 6)),
            "c": (Ec_f, Jcam.reshape(num_obs, -1, pmax))}
    if rig_jac:
        flat["r"] = (Er_f, Jr.reshape(num_obs, -1, 6))

    pt_of = {"i": Ji_pt, "c": Jc_pt}
    if rig_jac:
        pt_of["r"] = Jr_pt

    def direct_diag(name):
        # Same-obs block-diagonal contributions (one block per obs).
        E, Jf = flat[name]
        x = Jf.shape[2]
        n_blk = {"i": ni, "c": nc, "r": nr}[name]
        if n_blk == 1:
            # Single block: sum_o J_o' J_o is ONE MXU matmul over the K-major
            # flattening — avoids the [O, x, x] outer-product intermediate
            # (472 MB of HBM traffic for the camera family at O=524k).
            J2 = Jf.reshape(-1, x)
            return (J2.T @ J2)[None]
        if dense:
            # Batched (p,k)-contraction straight off the 4D view — avoids
            # materializing + relayouting an [O, x, x] intermediate
            # (~1.5 ms/iter at the bench size).
            J4 = pt_of[name]
            return jnp.einsum(
                "pakx,paky->axy", J4, J4,
                precision=jax.lax.Precision.HIGHEST,
            )
        M = jnp.sum(Jf[:, :, :, None] * Jf[:, :, None, :], axis=1)
        return (E.T @ M.reshape(num_obs, x * x)).reshape(-1, x, x)

    def direct_cross(a, b_):
        """Cross block; family b_ must be the SMALL side (the [O, nb, x, y]
        intermediate stays bounded)."""
        E_a, J_a = flat[a]
        E_b, J_b = flat[b_]
        xa, yb = J_a.shape[2], J_b.shape[2]
        na = {"i": ni, "c": nc, "r": nr}[a]
        nb = {"i": ni, "c": nc, "r": nr}[b_]
        if na == 1 and nb == 1:
            # Both single-block: one matmul, no per-obs intermediates.
            A2 = J_a.reshape(-1, xa)
            B2 = J_b.reshape(-1, yb)
            return (A2.T @ B2)[None, :, None, :]
        if not (dense and nb == 1):
            M = jnp.sum(
                J_a[:, :, :, None] * J_b[:, :, None, :], axis=1
            )  # [O, xa, yb]
        if nb == 1:
            # Skip the [O, nb, xa, yb] broadcast: E_b is identically 1.
            if dense:
                out = jnp.einsum(
                    "pakx,paky->axy", pt_of[a], pt_of[b_],
                    precision=jax.lax.Precision.HIGHEST,
                )
                return out[:, :, None, :]
            out = E_a.T @ M.reshape(num_obs, xa * yb)
            return out.reshape(-1, xa, yb)[:, :, None, :]
        T1 = M[:, None, :, :] * E_b[:, :, None, None]  # [O, nb, xa, yb]
        out = E_a.T @ T1.reshape(num_obs, nb * xa * yb)
        return out.reshape(-1, nb, xa, yb).transpose(0, 2, 1, 3)

    def schur(a, b_):
        # HIGHEST: the default TPU precision materializes bf16 shadow copies
        # of U/V (extra ~40 MB of traffic per family) and costs ~3e-4
        # relative error on S; the f32 passes read the originals directly.
        return jnp.einsum(
            "paxk,pbyk->axby", U[a], V[b_],
            precision=jax.lax.Precision.HIGHEST,
        )

    def expand_diag(D, n_blk, bdim):
        # [n,b,b] block-diagonal -> [n,b,n,b]
        eye_n = jnp.eye(n_blk, dtype=dtype)
        return jnp.einsum("axy,ab->axby", D, eye_n)

    S_II = expand_diag(direct_diag("i"), ni, 6) - schur("i", "i")
    S_CC = expand_diag(direct_diag("c"), nc, pmax) - schur("c", "c")
    S_IC = direct_cross("i", "c") - schur("i", "c")
    if rig_jac:
        S_RR = expand_diag(direct_diag("r"), nr, 6) - schur("r", "r")
        S_IR = direct_cross("i", "r") - schur("i", "r")
        S_RC = direct_cross("r", "c") - schur("r", "c")
    else:
        # Rig cameras all fixed: their rows come only from the identity
        # padding below; every coupling block is zero.
        S_RR = jnp.zeros((nr, 6, nr, 6), dtype=dtype)
        S_IR = jnp.zeros((ni, 6, nr, 6), dtype=dtype)
        S_RC = jnp.zeros((nr, 6, nc, pmax), dtype=dtype)

    Hib = jnp.sum(Hpp_inv * bp[:, None, :], axis=-1)  # [NP,3]

    def rhs(name, E_pt, J_pt, n_blk, bdim):
        E_f, J_f = flat[name]
        JTr = jnp.sum(J_f * r[:, :, None], axis=1)  # [O, bdim]
        if n_blk == 1:
            direct = jnp.sum(JTr, axis=0)[None]
            gschur = jnp.einsum("pxk,pk->x", V[name][:, 0], Hib)[None]
        elif dense:
            direct = jnp.einsum(
                "pakx,pak->ax", pt_of[name], r_pt,
                precision=jax.lax.Precision.HIGHEST,
            )
            GH = jnp.sum(G[name] * Hib[:, None, None, :], axis=-1)
            gschur = GH.sum(0)  # [n_blk, bdim]: slot == block index
        else:
            direct = E_f.T @ JTr  # [n, bdim]
            GH = jnp.sum(
                G[name] * Hib[:, None, None, :], axis=-1
            )  # [NP,T,bdim]
            gschur = jnp.einsum("pta,ptx->ax", E_pt, GH)
        return (direct - gschur).reshape(n_blk * bdim)

    b_i = rhs("i", E_i, Ji_pt, ni, 6)
    b_r = (rhs("r", E_r, Jr_pt, nr, 6) if rig_jac
           else jnp.zeros(nr * 6, dtype=dtype))
    b_c = rhs("c", E_c, Jc_pt, nc, pmax)

    back = dict(
        Ji=Ji, Jr=Jr if rig_jac else None, Jcam=Jcam, Jp_pt=Jp_pt,
        Hpp_inv=Hpp_inv, bp=bp,
        obs_inst=data["obs_inst"], obs_rigcam=data["obs_rigcam"],
        obs_cam=data["obs_cam"], padded=padded, dense=dense,
        Ei_f=Ei_f, Er_f=Er_f if rig_jac else None, Ec_f=Ec_f,
    )
    blocks = (S_II, S_RR, S_IR, S_RC, S_IC, S_CC, b_i, b_r, b_c)
    if raw_blocks:
        # Distributed mode: the caller psums these block families across
        # the mesh BEFORE the (replicated) priors/damping epilogue.
        return blocks, back
    S, b = _assemble_S(
        state, data, lam, *blocks, ni, nr, nc, pmax, rig_jac=rig_jac,
    )
    return S, b, back


def _assemble_S(state, data, lam, S_II, S_RR, S_IR, S_RC, S_IC, S_CC,
                b_i, b_r, b_c, ni, nr, nc, pmax, rig_jac):
    """Shared epilogue: prior families + block assembly + identity rows +
    damping + symmetrization (used by both the XLA and the fused-Pallas
    reduced-system builders)."""
    dtype = state[3].dtype

    def expand_diag(D, n_blk, bdim):
        eye_n = jnp.eye(n_blk, dtype=dtype)
        return jnp.einsum("axy,ab->axby", D, eye_n)

    # --- priors (small dense additions on the diagonal block families) -----
    for pr, pJ, kind in _prior_residuals(state, data):
        if kind == "inst":
            mask = data["opt_inst"].astype(dtype)[:, None, None]
            D = jnp.einsum("nki,nkj->nij", pJ, pJ) * mask
            S_II = S_II + expand_diag(D, ni, 6)
            b_i = b_i + (
                jnp.einsum("nki,nk->ni", pJ, pr) * mask[:, :, 0]
            ).reshape(ni * 6)
        elif kind == "rigcam":
            if not rig_jac:
                continue  # all rig cameras fixed: prior rows are masked out
            mask = data["opt_rigcam"].astype(dtype)[:, None, None]
            D = jnp.einsum("nki,nkj->nij", pJ, pJ) * mask
            S_RR = S_RR + expand_diag(D, nr, 6)
            b_r = b_r + (
                jnp.einsum("nki,nk->ni", pJ, pr) * mask[:, :, 0]
            ).reshape(nr * 6)
        else:  # cam — per-dim masks
            mask = data["opt_cam"].astype(dtype)
            pJm = pJ * mask[:, None, :]
            D = jnp.einsum("nki,nkj->nij", pJm, pJm)
            S_CC = S_CC + expand_diag(D, nc, pmax)
            b_c = b_c + jnp.einsum("nki,nk->ni", pJm, pr).reshape(nc * pmax)

    # --- shot priors (up-vector / pan / tilt / roll): couple inst+rigcam ----
    for pr, Ji_u, Jr_u, idx_i, idx_r in _shot_prior_residuals(state, data):
        mi = data["opt_inst"][idx_i].astype(dtype)[:, None, None]
        Ji_u = Ji_u * mi
        Ei_u = jax.nn.one_hot(idx_i, ni, dtype=dtype)  # [K, NI]
        S_II = S_II + expand_diag(
            jnp.einsum("ka,kxi,kxj->aij", Ei_u, Ji_u, Ji_u), ni, 6
        )
        b_i = b_i + jnp.einsum("ka,kxi,kx->ai", Ei_u, Ji_u, pr).reshape(ni * 6)
        if rig_jac:
            mr = data["opt_rigcam"][idx_r].astype(dtype)[:, None, None]
            Jr_u = Jr_u * mr
            Er_u = jax.nn.one_hot(idx_r, nr, dtype=dtype)
            S_RR = S_RR + expand_diag(
                jnp.einsum("ka,kxi,kxj->aij", Er_u, Jr_u, Jr_u), nr, 6
            )
            S_IR = S_IR + jnp.einsum(
                "ka,kxi,kxj,kb->aibj", Ei_u, Ji_u, Jr_u, Er_u
            )
            b_r = b_r + jnp.einsum(
                "ka,kxi,kx->ai", Er_u, Jr_u, pr
            ).reshape(nr * 6)

    # --- assemble the dense reduced system ---------------------------------
    di, dr, dcam = ni * 6, nr * 6, nc * pmax
    S = jnp.block(
        [
            [
                S_II.reshape(di, di),
                S_IR.reshape(di, dr),
                S_IC.reshape(di, dcam),
            ],
            [
                S_IR.reshape(di, dr).T,
                S_RR.reshape(dr, dr),
                S_RC.reshape(dr, dcam),
            ],
            [
                S_IC.reshape(di, dcam).T,
                S_RC.reshape(dr, dcam).T,
                S_CC.reshape(dcam, dcam),
            ],
        ]
    )
    b = jnp.concatenate([b_i, b_r, b_c])

    # --- scale variables + pose-graph constraint rows ----------------------
    scales = state[4] if len(state) > 4 else jnp.zeros((0,), dtype)
    ns = scales.shape[0]
    if ns:
        D0 = di + dr + dcam
        S = jnp.zeros((D0 + ns, D0 + ns), dtype).at[:D0, :D0].set(S)
        b = jnp.concatenate([b, jnp.zeros((ns,), dtype)])
    if _has_graph(data):
        S, b = _fold_graph_rows(S, b, state, data, ni, nr, nc, pmax, ns)

    # Identity rows for fixed/padded parameters keep S nonsingular.
    fixed = [
        jnp.repeat(~data["opt_inst"], 6),
        jnp.repeat(~data["opt_rigcam"], 6),
        (~data["opt_cam"]).reshape(-1),
    ]
    if ns:
        opt_s = data.get("opt_scales")
        fixed.append(
            ~opt_s if opt_s is not None else jnp.zeros((ns,), bool)
        )
    fixed_dims = jnp.concatenate(fixed).astype(dtype)
    S = S + jnp.diag(fixed_dims)

    # Marquardt scaling with the Ceres diagonal clamp
    # (levenberg_marquardt_strategy.cc min_diagonal = 1e-6): a parameter
    # whose Jacobian column is accidentally ~0 at the current state would
    # otherwise receive an essentially undamped step along a direction where
    # the linearization carries no information — raising lam never tames it
    # and LM stalls rejecting (seen with heatmap position priors).
    diag_S = jnp.clip(jnp.diagonal(S), 1e-6, 1e32)
    S = S + jnp.diag(lam * diag_S + 1e-12)
    S = 0.5 * (S + S.T)
    return S, b


def _build_reduced_system_fused(state, data, lam, loss, loss_threshold,
                                ni, nr, nc, pmax, raw_blocks=False):
    """Assemble (S, b, back) from the fused Pallas kernel's raw outputs.

    The kernel returns the Schur product in (x,a)-major row order plus the
    per-lane direct/RHS partials; this epilogue only reorders tiny [NI·6]^2
    blocks, adds the prior families and applies the damping/identity rows —
    all O(NI^2) work."""
    from opensfm_tpu.ops.pallas_kernels.ba_assemble import (
        fused_schur_assembly,
    )

    inst, rigcam, cam, points = state[:4]
    np_pts = points.shape[0]
    dtype = points.dtype
    ni6 = ni * 6

    pp_sw = _point_prior_sqrt_weight(points, data)
    pp_inv = (
        data["point_prior_inv_sd"]
        if pp_sw is None
        else data["point_prior_inv_sd"] * pp_sw
    )
    out_obs, out_pt, sII_xa, aux = fused_schur_assembly(
        inst, cam, points, data["obs_uv"], data["obs_inv_sd"],
        data["opt_inst"], data["opt_cam"], data["opt_points"],
        data["point_prior"], pp_inv, lam,
        loss=loss, loss_threshold=float(loss_threshold), ni=ni,
        # Back-substitution recomputes the chain (fused_back_substitute)
        # instead of reading materialized observation rows: skipping the
        # [32, NP, NI] output saves ~1.9 GB of HBM round-trip per LM step
        # at the 256-camera lane.
        emit_obs_rows=False,
    )

    # Schur II: rows/cols are (x, a); reorder to (a, x).
    schur_II = sII_xa.reshape(6, ni, 6, ni).transpose(1, 0, 3, 2)
    # Direct families from the aux partials.
    direct_II = aux[0:36].reshape(6, 6, ni).transpose(2, 0, 1)  # [ni,6,6]
    direct_IC = aux[36:54].reshape(6, 3, ni).transpose(2, 0, 1)  # [ni,6,3]
    tri_idx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    cc_d = jnp.sum(aux[54:60], axis=1)       # [6] upper-tri direct
    cc_s = aux[90:96, 0]                     # [6] upper-tri schur
    schur_IC = aux[60:78].reshape(6, 3, ni).transpose(2, 0, 1)
    b_i = aux[78:84].T.reshape(ni6)          # [ni*6] (a-major)
    b_c3 = jnp.sum(aux[84:87], axis=1) - aux[87:90, 0]

    eye_n = jnp.eye(ni, dtype=dtype)
    S_II = (
        jnp.einsum("axy,ab->axby", direct_II, eye_n) - schur_II
    )
    S_IC = (direct_IC - schur_IC)[:, :, None, :]  # [ni,6,1,3]
    vals = cc_d - cc_s
    iu = jnp.array([t[0] for t in tri_idx])
    ju = jnp.array([t[1] for t in tri_idx])
    S_CC = (
        jnp.zeros((3, 3), dtype=dtype).at[iu, ju].set(vals)
        .at[ju, iu].set(vals)
    )[None, :, None, :]
    S_RR = jnp.zeros((nr, 6, nr, 6), dtype=dtype)
    S_IR = jnp.zeros((ni, 6, nr, 6), dtype=dtype)
    S_RC = jnp.zeros((nr, 6, nc, pmax), dtype=dtype)
    b_r = jnp.zeros(nr * 6, dtype=dtype)
    b_c = b_c3

    # Per-point data for back-substitution.
    hi = out_pt[:, 0:6]
    Hpp_inv = jnp.stack(
        [hi[:, 0], hi[:, 1], hi[:, 2],
         hi[:, 1], hi[:, 3], hi[:, 4],
         hi[:, 2], hi[:, 4], hi[:, 5]], axis=1,
    ).reshape(np_pts, 3, 3)
    bp = out_pt[:, 6:9]

    back = dict(
        fused_rows=out_obs,  # None: the recompute path below is used
        fused_recompute=dict(
            inst=inst, cam=cam, points=points, obs_uv=data["obs_uv"],
            obs_inv_sd=data["obs_inv_sd"], out_pt=out_pt,
            loss=loss, loss_threshold=float(loss_threshold), ni=ni,
        ),
        Hpp_inv=Hpp_inv, bp=bp, dense=True,
        Ji=None, Jr=None, Jcam=None, Jp_pt=None,
        obs_inst=data["obs_inst"], obs_rigcam=data["obs_rigcam"],
        obs_cam=data["obs_cam"], padded=None,
        Ei_f=None, Er_f=None, Ec_f=None,
    )
    blocks = (S_II, S_RR, S_IR, S_RC, S_IC, S_CC, b_i, b_r, b_c)
    if raw_blocks:
        return blocks, back
    return _assemble_S(
        state, data, lam, *blocks, ni, nr, nc, pmax, rig_jac=False,
    ) + (back,)


def _back_substitute(back, dx_i, dx_r, dx_cam, ni, pmax):
    """Recover the point updates dx_p from the reduced-system solution.

    Handles both the fused-kernel rows (feature-major, dense layout) and
    the XLA-path Jacobian tensors carried in `back`."""
    Hpp_inv, bp = back["Hpp_inv"], back["bp"]
    if back.get("fused_recompute") is not None:
        from opensfm_tpu.ops.pallas_kernels.ba_assemble import (
            fused_back_substitute,
        )

        rc = back["fused_recompute"]
        return fused_back_substitute(
            rc["inst"], rc["cam"], rc["points"], rc["obs_uv"],
            rc["obs_inv_sd"], rc["out_pt"], dx_i, dx_cam,
            loss=rc["loss"], loss_threshold=rc["loss_threshold"],
            ni=rc["ni"],
        )
    # Per-observation back-substitution: u_p = sum_{o in p} Jp_o' (J_o dx_o)
    # — one elementwise pass over the already-materialized Jacobians instead
    # of the [NP, T, bdim, 3] G tensors (which would otherwise be kept alive
    # or rematerialized across the Cholesky solve).
    if back.get("fused_rows") is not None:
        # Fused-kernel path: consume the feature-major [32, NP, NI] rows
        # directly — no [O, 2, x] relayouts. Rows 2+j / 14+j hold the two
        # residual components of Jacobian direction j (0-5 pose, 6-8 cam,
        # 9-11 point).
        rows = back["fused_rows"]
        dxi_l = dx_i.T[:, None, :]  # [6, 1, NI] broadcast over points
        dxc_l = dx_cam[0]  # [3]
        tmp0 = sum(rows[2 + x] * dxi_l[x] for x in range(6)) + sum(
            rows[8 + y] * dxc_l[y] for y in range(3)
        )
        tmp1 = sum(rows[14 + x] * dxi_l[x] for x in range(6)) + sum(
            rows[20 + y] * dxc_l[y] for y in range(3)
        )
        u = jnp.stack(
            [
                jnp.sum(rows[11 + j] * tmp0 + rows[23 + j] * tmp1, axis=1)
                for j in range(3)
            ],
            axis=1,
        )  # [NP, 3]
        return jnp.sum(Hpp_inv * (bp - u)[:, None, :], axis=-1)
    num_obs = back["Ji"].shape[0]
    if back["dense"]:
        # slot == instance: the per-obs dx rows are a pure broadcast.
        dxi_o = jnp.broadcast_to(
            dx_i[None], (num_obs // ni, ni, 6)
        ).reshape(num_obs, 6)
        dxc_o = jnp.broadcast_to(dx_cam, (num_obs, pmax))
        dxr_o = None
    elif jax.default_backend() == "tpu":
        # Row-gathers of 6-float rows cost ~1 ms each at O=524k on TPU; the
        # one-hot MXU expansion of the tiny dx tables costs ~0.05 ms.
        # HIGHEST precision: the default TPU f32 matmul would truncate dx
        # to bf16 on the MXU.
        def expand(E, dx):
            if dx.shape[0] == 1:
                return jnp.broadcast_to(dx, (E.shape[0], dx.shape[1]))
            return jnp.matmul(
                E.astype(dx.dtype), dx, precision=jax.lax.Precision.HIGHEST
            )

        dxi_o = expand(back["Ei_f"], dx_i)
        dxc_o = expand(back["Ec_f"], dx_cam)
        dxr_o = expand(back["Er_f"], dx_r) if back["Jr"] is not None else None
    else:
        dxi_o = dx_i[back["obs_inst"]]
        dxc_o = dx_cam[back["obs_cam"]]
        dxr_o = (
            dx_r[back["obs_rigcam"]] if back["Jr"] is not None else None
        )
    tmp = (
        jnp.sum(back["Ji"] * dxi_o[:, None, :], axis=-1)
        + jnp.sum(back["Jcam"] * dxc_o[:, None, :], axis=-1)
    )  # [O, K]
    if back["Jr"] is not None:
        tmp = tmp + jnp.sum(back["Jr"] * dxr_o[:, None, :], axis=-1)
    tmp_pt = back["padded"](tmp)  # [NP, T, K]
    u = jnp.sum(back["Jp_pt"] * tmp_pt[..., None], axis=(1, 2))  # [NP, 3]
    dx_p = jnp.sum(Hpp_inv * (bp - u)[:, None, :], axis=-1)
    return dx_p


@partial(
    jax.jit,
    static_argnames=(
        "ptype", "loss", "loss_threshold", "pmax", "ni", "nr", "nc",
        "with_depth", "canonical", "rig_transform", "rig_jac", "dense",
    ),
)
def _lm_step(state, data, lam, ptype, loss, loss_threshold, pmax, ni, nr, nc,
             with_depth=False, canonical=False, rig_transform=True,
             rig_jac=True, dense=False):
    """One damped LM step: assemble, Schur-eliminate points, solve, update."""
    inst, rigcam, cam, points = state[:4]
    S, b, back = _build_reduced_system(
        state, data, lam, ptype, loss, loss_threshold, pmax, ni, nr, nc,
        with_depth, canonical, rig_transform, rig_jac, dense,
    )
    # S is SPD after damping + identity rows: Cholesky beats the LU lowering.
    L = jax.lax.linalg.cholesky(S)
    y = jax.lax.linalg.triangular_solve(
        L, b[:, None], left_side=True, lower=True
    )
    dx_c = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )[:, 0]

    # --- back-substitute points (gathers only) -----------------------------
    di, dr, dcam = ni * 6, nr * 6, nc * pmax
    dx_i = dx_c[:di].reshape(ni, 6)
    dx_r = dx_c[di : di + dr].reshape(nr, 6)
    dx_cam = dx_c[di + dr : di + dr + dcam].reshape(nc, pmax)
    dx_p = _back_substitute(back, dx_i, dx_r, dx_cam, ni, pmax)

    new_state = (
        inst - dx_i,
        rigcam - dx_r,
        cam - dx_cam,
        points - dx_p,
    )
    if len(state) > 4:
        new_state = new_state + (state[4] - dx_c[di + dr + dcam :],)
    return new_state


@partial(
    jax.jit,
    static_argnames=(
        "ptype", "loss", "loss_threshold", "pmax", "ni", "nr", "nc",
        "with_depth", "canonical", "rig_transform", "rig_jac", "dense",
    ),
)
def _lm_solve(state, data, lam0, tol, max_iterations, ptype, loss,
              loss_threshold, pmax, ni, nr, nc, with_depth=False,
              canonical=False, rig_transform=True, rig_jac=True,
              dense=False):
    """Whole LM solve as ONE device program (lax.while_loop).

    The host damping loop costs 2+ host<->device round-trips per trial (the
    `float(cost)` sync); on a tunneled TPU that dwarfs the math.  This runs
    the identical trial sequence device-side: accept when the cost drops,
    lam /= 3 on accept, lam *= 10 on reject, stop after 16 consecutive
    rejects, `rel < tol`, or `max_iterations` accepted steps.  (16, not the
    classical 5-8: plateau-shaped residuals — heatmap priors — need the
    damping to climb several decades before a descent step is found.)

    `max_iterations` is a DYNAMIC operand: each distinct shape bucket
    compiles one program regardless of the caller's iteration budget (a
    cold-cache compile costs minutes on a tunneled TPU, and the growth
    loop mixes 10/20/50-iteration bundles over the same shapes)."""
    max_iterations = jnp.asarray(max_iterations, jnp.int32)
    dtype = state[3].dtype
    kw = dict(
        ptype=ptype, loss=loss, loss_threshold=loss_threshold, pmax=pmax,
        with_depth=with_depth, rig_transform=rig_transform, rig_jac=rig_jac,
        canonical=canonical, dense=dense,
    )
    cost0 = _total_cost(state, data, **kw)

    def cond(carry):
        _, _, _, rejects, accepted, done, trials = carry
        return (~done) & (trials < 16 * max_iterations)


    def body(carry):
        st, cost, lam, rejects, accepted, done, trials = carry
        new_st = _lm_step(st, data, lam, ni=ni, nr=nr, nc=nc, **kw)
        new_cost = _total_cost(new_st, data, **kw)
        accept = jnp.isfinite(new_cost) & (new_cost < cost)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        st = jax.tree_util.tree_map(
            lambda n, o: jnp.where(accept, n, o), new_st, st
        )
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept,
            jnp.maximum(lam / 3.0, 1e-12),
            jnp.minimum(lam * 10.0, 1e8),
        )
        rejects = jnp.where(accept, 0, rejects + 1)
        accepted = accepted + accept.astype(jnp.int32)
        done = (
            (accept & (rel < tol))
            | (rejects >= 16)
            | (accepted >= max_iterations)
        )
        return (st, cost, lam, rejects, accepted, done, trials + 1)

    init = (
        state, cost0, jnp.asarray(lam0, dtype), jnp.int32(0), jnp.int32(0),
        jnp.asarray(False), jnp.int32(0),
    )
    st, cost, lam, _, accepted, _, _ = jax.lax.while_loop(cond, body, init)
    return st, cost0, cost, lam, accepted


@partial(
    jax.jit,
    static_argnames=(
        "ptype", "loss", "loss_threshold", "pmax", "ni", "nr", "nc",
        "with_depth", "canonical", "rig_transform", "rig_jac", "dense",
    ),
)
def _instance_covariances(state, data, ptype, loss, loss_threshold, pmax,
                          ni, nr, nc, with_depth=False, canonical=False,
                          rig_transform=True, rig_jac=True, dense=False):
    """Marginal 6x6 covariances of the rig-instance poses.

    Mirrors ComputeCovariances (bundle_adjuster.cc:1123-1194): the points are
    Schur-marginalized, so inv(S) restricted to an instance's 6x6 diagonal
    block IS the marginal covariance of that pose (in our world-to-cam
    tangent parametrization)."""
    S, _, _ = _build_reduced_system(
        state, data, jnp.zeros((), dtype=state[3].dtype), ptype, loss,
        loss_threshold, pmax, ni, nr, nc, with_depth, canonical,
        rig_transform, rig_jac, dense,
    )
    Sinv = tpu_linalg.inv_spd(S)
    blocks = Sinv[: ni * 6, : ni * 6].reshape(ni, 6, ni, 6)
    cov = jnp.einsum("aiaj->aij", blocks)
    valid = jnp.all(jnp.isfinite(Sinv)) & jnp.all(
        jnp.einsum("aii->ai", cov) >= 0
    )
    return cov, valid


@partial(
    jax.jit,
    static_argnames=("ptype", "loss", "loss_threshold", "pmax", "with_depth",
                     "rig_transform", "rig_jac", "canonical", "dense"),
)
def _total_cost(state, data, ptype, loss, loss_threshold, pmax,
                with_depth=False, rig_transform=True, rig_jac=True,
                canonical=False, dense=False):
    """Objective only — no Jacobians (cheap accept/reject evaluation)."""
    inst, rigcam, cam, points = state[:4]
    d = data

    # TPU fast path: a forward-only Pallas kernel accumulates the robust
    # cost in VMEM — no [O,·] HBM intermediates, no Jacobian work (the
    # accept/reject trial only needs the objective).
    if (
        ptype == "perspective"
        and not rig_transform
        and not rig_jac
        and not with_depth
        and pmax == 3
        and points.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        from opensfm_tpu.ops.pallas_kernels.ba_assemble import (
            PB as _PB,
            fused_cost_dense,
        )
        from opensfm_tpu.ops.pallas_kernels.ba_resjac import fused_cost

        num_obs = d["obs_uv"].shape[0]
        if dense and cam.shape[0] == 1 and points.shape[0] % _PB == 0:
            # Dense instance-slot layout: read the [NP, NI] tiles straight
            # from HBM (no [O, 15] pack / feature-major transpose — that
            # repack cost MORE than the whole LM step at the large lane).
            total = fused_cost_dense(
                inst, cam, points, d["obs_uv"], d["obs_inv_sd"],
                loss=loss, loss_threshold=loss_threshold,
                ni=inst.shape[0],
            )
        else:
            point_repeat = num_obs // points.shape[0] if canonical else 0
            total = fused_cost(
                inst, cam, points, d["obs_inst"], d["obs_cam"],
                d["obs_point"], d["obs_uv"], d["obs_inv_sd"], loss=loss,
                loss_threshold=loss_threshold, point_repeat=point_repeat,
                dense_inst=dense,
            )
        for pr, _, _ in _prior_residuals(state, data):
            total = total + 0.5 * jnp.sum(pr * pr)
        rho_c = LOSSES["CauchyLoss"][0]
        for pr in _shot_prior_residuals(state, data, raw=True):
            s = jnp.sum(pr * pr, axis=-1)
            total = total + jnp.sum(0.5 * rho_c(s))
        if _has_graph(data):
            total = total + _graph_cost(state, data)
        return total + _point_prior_cost(state[3], data)

    num_obs = d["obs_uv"].shape[0]
    if canonical:
        # Point-major layout: the [O] point gather is a pure repeat.
        T_slots = num_obs // points.shape[0]
        points_o = jnp.repeat(points, T_slots, axis=0)
    else:
        points_o = points[d["obs_point"]]
    if dense:
        # slot == instance: the instance gather is a pure broadcast.
        ni = inst.shape[0]
        inst_o = jnp.broadcast_to(
            inst[None], (num_obs // ni, ni, 6)
        ).reshape(num_obs, 6)
    else:
        inst_o = inst[d["obs_inst"]]

    segments = ((ptype, 0, num_obs),) if isinstance(ptype, str) else ptype
    rho, _ = LOSSES[loss]
    a2 = loss_threshold * loss_threshold
    total = jnp.zeros((), dtype=points.dtype)
    for pt, start, end in segments:
        sl = slice(start, end)
        Xi = rot.rotate(inst_o[sl][:, 0:3], points_o[sl]) \
            + inst_o[sl][:, 3:6]
        if rig_transform:
            rc = rigcam[d["obs_rigcam"][sl]]
            Xc = rot.rotate(rc[:, 0:3], Xi) + rc[:, 3:6]
        else:
            Xc = Xi
        if cam.shape[0] == 1:
            cam_sl = jnp.broadcast_to(cam[:, :pmax], (end - start, pmax))
        else:
            cam_sl = cam[d["obs_cam"][sl]][:, :pmax]
        pred = cam_lib.project(pt, Xc, cam_sl, xp=jnp)
        diff = pred - d["obs_uv"][sl]
        if pt == "spherical":
            diff = diff - jnp.round(diff)
        r = diff * d["obs_inv_sd"][sl][:, None]
        s = jnp.sum(r * r, axis=-1)
        total = total + jnp.sum(0.5 * a2 * rho(s / a2))
        if with_depth:
            norm = jnp.sqrt(jnp.sum(Xc * Xc, axis=-1) + 1e-30)
            pred_depth = jnp.where(d["obs_depth_radial"][sl], norm, Xc[:, 2])
            r_d = (pred_depth - d["obs_depth"][sl]) * d["obs_depth_inv_sd"][sl]
            total = total + jnp.sum(0.5 * a2 * rho(r_d * r_d / a2))
    for pr, _, _ in _prior_residuals(state, data):
        total = total + 0.5 * jnp.sum(pr * pr)
    # Shot priors carry Cauchy(1) (bundle_adjuster.cc:957-1027).
    rho_c = LOSSES["CauchyLoss"][0]
    for pr in _shot_prior_residuals(state, data, raw=True):
        s = jnp.sum(pr * pr, axis=-1)
        total = total + jnp.sum(0.5 * rho_c(s))
    # Pose-graph constraint rows (relative motion/rotation, common
    # position, linear motion, heatmaps, gauge).
    if _has_graph(data):
        total = total + _graph_cost(state, data)
    # Point priors (robust when point_prior_loss is set).
    total = total + _point_prior_cost(state[3], data)
    return total


def bundle_adjust(
    problem: BAProblem,
    max_iterations: int = 50,
    initial_lambda: float = 1e-4,
    tol: float = 1e-10,
    dtype=np.float64,
    compute_covariances: bool = False,
) -> BAResult:
    """Run LM to convergence (host-controlled damping loop; each trial step
    and cost evaluation is one fused jitted device call)."""
    problem, dense = canonicalize_problem_dense(problem)
    canonical = isinstance(problem.ptype, str)
    ni, nr, nc, npts, num_obs, T = problem.counts()
    pmax = problem.cam.shape[1]

    def opt(x, default):
        return np.asarray(x) if x is not None else default

    up_inst = opt(problem.up_inst, np.zeros(0, dtype=np.int32))
    up_rigcam = opt(problem.up_rigcam, np.zeros(0, dtype=np.int32))
    up_vec = opt(problem.up_vec, np.zeros((0, 3)))
    up_inv_sd = opt(problem.up_inv_sd, np.zeros(0))
    ang_kind = opt(problem.ang_kind, np.zeros(0, dtype=np.int32))
    ang_inst = opt(problem.ang_inst, np.zeros(0, dtype=np.int32))
    ang_rigcam = opt(problem.ang_rigcam, np.zeros(0, dtype=np.int32))
    ang_value = opt(problem.ang_value, np.zeros(0))
    ang_inv_sd = opt(problem.ang_inv_sd, np.zeros(0))
    obs_depth = opt(problem.obs_depth, np.zeros(num_obs))
    obs_depth_inv_sd = opt(problem.obs_depth_inv_sd, np.zeros(num_obs))
    obs_depth_radial = opt(
        problem.obs_depth_radial, np.zeros(num_obs, dtype=bool)
    )
    with_depth = bool(np.any(obs_depth_inv_sd > 0))

    scales0 = (
        np.asarray(problem.scales, dtype=np.float64)
        if problem.scales is not None else np.zeros(0)
    )
    state = (
        jnp.asarray(problem.inst, dtype=dtype),
        jnp.asarray(problem.rigcam, dtype=dtype),
        jnp.asarray(problem.cam, dtype=dtype),
        jnp.asarray(problem.points, dtype=dtype),
        jnp.asarray(scales0, dtype=dtype),
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
        "up_inst": jnp.asarray(up_inst, dtype=jnp.int32),
        "up_rigcam": jnp.asarray(up_rigcam, dtype=jnp.int32),
        "up_vec": jnp.asarray(up_vec, dtype=dtype),
        "up_inv_sd": jnp.asarray(up_inv_sd, dtype=dtype),
        "ang_kind": jnp.asarray(ang_kind, dtype=jnp.int32),
        "ang_inst": jnp.asarray(ang_inst, dtype=jnp.int32),
        "ang_rigcam": jnp.asarray(ang_rigcam, dtype=jnp.int32),
        "ang_value": jnp.asarray(ang_value, dtype=dtype),
        "ang_inv_sd": jnp.asarray(ang_inv_sd, dtype=dtype),
        "obs_depth": jnp.asarray(obs_depth, dtype=dtype),
        "obs_depth_inv_sd": jnp.asarray(obs_depth_inv_sd, dtype=dtype),
        "obs_depth_radial": jnp.asarray(obs_depth_radial, dtype=bool),
    }
    if problem.point_prior_loss is not None and bool(
        np.any(np.asarray(problem.point_prior_loss) > 0)
    ):
        data["point_prior_loss"] = jnp.asarray(
            problem.point_prior_loss, dtype=dtype
        )
    if problem.opt_scales is not None:
        data["opt_scales"] = jnp.asarray(problem.opt_scales, dtype=bool)
    _GRAPH_FIELDS = {
        "rm": ("rm_i:i", "rm_j:i", "rm_si:i", "rm_sj:i", "rm_rvec:f",
               "rm_tvec:f", "rm_scale:f", "rm_inv_sd:f", "rm_obs_scale:b",
               "rm_loss_c:f"),
        "rr": ("rr_i:i", "rr_j:i", "rr_ri:i", "rr_rj:i", "rr_rvec:f",
               "rr_inv_sd:f", "rr_loss_c:f"),
        "cp": ("cp_i:i", "cp_j:i", "cp_ri:i", "cp_rj:i", "cp_margin:f",
               "cp_inv_sd:f"),
        "lin": ("lin_i0:i", "lin_i1:i", "lin_i2:i", "lin_r0:i", "lin_r1:i",
                "lin_r2:i", "lin_alpha:f", "lin_pos_inv_sd:f",
                "lin_rot_inv_sd:f"),
        "hm": ("hm_inst:i", "hm_rigcam:i", "hm_map:i", "hm_offset:f",
               "hm_inv_sd:f", "heatmaps:f", "hm_res:f"),
        "gauge": ("gauge_i:i", "gauge_j:i", "gauge_norm:f"),
    }
    for fields in _GRAPH_FIELDS.values():
        head = fields[0].split(":")[0]
        arr = getattr(problem, head)
        if arr is None or np.asarray(arr).shape[0] == 0:
            continue
        for spec in fields:
            name, kind = spec.split(":")
            val = getattr(problem, name)
            cast = {"i": jnp.int32, "f": dtype, "b": bool}[kind]
            data[name] = jnp.asarray(val, dtype=cast)
    # Skip the rig chain when it cannot matter: no rig camera optimized
    # drops its 6 Jacobian columns (rig_jac); all-identity rig cameras drop
    # the second rotation entirely (rig_transform) — the common mono case.
    rig_jac = bool(np.asarray(problem.opt_rigcam).any())
    rig_transform = rig_jac or bool(
        np.abs(np.asarray(problem.rigcam)).max() > 1e-12
    )
    # Dense instance-slot mode implies the mono fast path.
    if dense:
        rig_jac = False
        rig_transform = False
    statics = dict(
        ptype=problem.ptype, loss=problem.loss,
        loss_threshold=float(problem.loss_threshold), pmax=pmax,
        with_depth=with_depth, rig_transform=rig_transform, rig_jac=rig_jac,
        canonical=canonical, dense=dense,
    )
    step_statics = dict(statics)

    # ONE device program for the whole damping loop: the per-trial host
    # float() syncs of the old loop cost more than the math on a tunneled
    # TPU (see _lm_solve).
    from opensfm_tpu.context import record_dispatch

    record_dispatch("bundle_lm_solve")
    state, cost0, cost1, lam1, accepted = _lm_solve(
        state, data, jnp.asarray(initial_lambda, dtype=dtype),
        jnp.asarray(tol, dtype=dtype), int(max_iterations),
        ni=ni, nr=nr, nc=nc, **step_statics,
    )
    initial_cost = float(cost0)
    cost = float(cost1)
    lam = float(lam1)
    iters_done = int(accepted)

    covariances = None
    covariance_valid = False
    if compute_covariances:
        cov, valid = _instance_covariances(
            state, data, ni=ni, nr=nr, nc=nc, **step_statics
        )
        covariances = np.asarray(cov)
        covariance_valid = bool(valid)

    return BAResult(
        inst=np.asarray(state[0]),
        rigcam=np.asarray(state[1]),
        cam=np.asarray(state[2]),
        points=np.asarray(state[3]),
        scales=(np.asarray(state[4]) if len(state) > 4 else None),
        initial_cost=initial_cost,
        final_cost=cost,
        iterations=iters_done,
        lam=lam,
        covariances=covariances,
        covariance_valid=covariance_valid,
    )
