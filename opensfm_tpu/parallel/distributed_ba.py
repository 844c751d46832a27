"""Distributed Schur-complement bundle adjustment over a jax.sharding.Mesh.

Design (SURVEY.md §7.1/§7.2-6): partition POINTS (and their observations)
across devices; camera-side parameters are replicated.  Each device:

1. computes residuals/Jacobians for its observation shard;
2. assembles its local point systems Hpp, bp (fully local — a point's
   observations all live on one shard);
3. reduces its contribution to the Schur camera system S and RHS b;
4. `psum`s (S, b) over the mesh — the only collective, riding ICI;
5. solves the (replicated, small) reduced system and back-substitutes its
   local points.

This replaces the reference's file-based submodel split + pose-graph merge
(large/tools.py:278-328) with a single consistent Gauss-Newton step.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opensfm_tpu.ba.lm import BAProblem, LOSSES, _transform_rig
from opensfm_tpu.geometry import cameras as cam_lib

from opensfm_tpu.ops import linalg as tpu_linalg


def shard_problem(problem: BAProblem, n_shards: int) -> BAProblem:
    """Re-layout a BAProblem so points (and their obs) shard contiguously.

    Points are sorted into n contiguous groups of equal size; observations
    are reordered so each group's observations form one contiguous,
    equally-sized block (padded with zero-weight rows).
    """
    npts = len(problem.points)
    n_obs = len(problem.obs_uv)
    np_pad = ((npts + n_shards - 1) // n_shards) * n_shards

    # Order observations by point.
    order = np.argsort(problem.obs_point, kind="stable")
    # Drop padding obs (inv_sd == 0) to recount per point.
    per_point = [[] for _ in range(np_pad)]
    for o in order:
        if problem.obs_inv_sd[o] > 0:
            per_point[problem.obs_point[o]].append(o)

    pts_per_shard = np_pad // n_shards
    obs_count_per_shard = np.zeros(n_shards, dtype=np.int64)
    for p in range(np_pad):
        obs_count_per_shard[p // pts_per_shard] += len(per_point[p])
    obs_per_shard = int(obs_count_per_shard.max())
    # Round to a multiple of 8 for tiling friendliness.
    obs_per_shard = ((obs_per_shard + 7) // 8) * 8
    O_new = obs_per_shard * n_shards

    T = problem.point_obs.shape[1]

    def alloc(shape, dtype=np.float64, fill=0):
        out = np.full(shape, fill, dtype=dtype)
        return out

    obs_uv = alloc((O_new, 2))
    obs_inv_sd = alloc(O_new)
    obs_point = alloc(O_new, np.int64)
    obs_inst = alloc(O_new, np.int64)
    obs_rigcam = alloc(O_new, np.int64)
    obs_cam = alloc(O_new, np.int64)
    point_obs = np.full((np_pad, T), O_new, dtype=np.int64)

    for s in range(n_shards):
        cursor = s * obs_per_shard
        for p in range(s * pts_per_shard, (s + 1) * pts_per_shard):
            for slot, o in enumerate(per_point[p][:T]):
                obs_uv[cursor] = problem.obs_uv[o]
                obs_inv_sd[cursor] = problem.obs_inv_sd[o]
                obs_point[cursor] = p
                obs_inst[cursor] = problem.obs_inst[o]
                obs_rigcam[cursor] = problem.obs_rigcam[o]
                obs_cam[cursor] = problem.obs_cam[o]
                point_obs[p, slot] = cursor
                cursor += 1
        # Padding rows of this shard keep obs_point pointing at a local point
        # so segment sums stay shard-local.
        for c in range(cursor, (s + 1) * obs_per_shard):
            obs_point[c] = s * pts_per_shard

    def pad_points(arr, fill=0.0):
        out = np.full((np_pad,) + arr.shape[1:], fill, dtype=arr.dtype)
        out[: len(arr)] = arr
        return out

    return BAProblem(
        inst=problem.inst, rigcam=problem.rigcam, cam=problem.cam,
        points=pad_points(problem.points),
        obs_uv=obs_uv, obs_inv_sd=obs_inv_sd, obs_point=obs_point,
        obs_inst=obs_inst, obs_rigcam=obs_rigcam, obs_cam=obs_cam,
        point_obs=point_obs,
        gps_pos=problem.gps_pos, gps_inv_sd=problem.gps_inv_sd,
        cam_prior=problem.cam_prior, cam_prior_inv_sd=problem.cam_prior_inv_sd,
        cam_log_mask=problem.cam_log_mask,
        rigcam_prior=problem.rigcam_prior,
        rigcam_prior_inv_sd=problem.rigcam_prior_inv_sd,
        point_prior=pad_points(problem.point_prior),
        point_prior_inv_sd=pad_points(problem.point_prior_inv_sd),
        opt_inst=problem.opt_inst, opt_rigcam=problem.opt_rigcam,
        opt_cam=problem.opt_cam,
        opt_points=pad_points(problem.opt_points),
        ptype=problem.ptype if isinstance(problem.ptype, str)
        else problem.ptype[0][0],
        loss=problem.loss, loss_threshold=problem.loss_threshold,
    )


def make_sharded_lm_step(
    mesh: Mesh,
    axis: str,
    ptype: str,
    pmax: int,
    ni: int,
    nr: int,
    nc: int,
    loss: str = "SoftLOneLoss",
    loss_threshold: float = 1.0,
):
    """Build a jitted LM step sharded over `axis` of the mesh.

    Returns step(state, sharded_data, lam) -> new_state where sharded_data
    arrays carry a leading device axis (points / observations sharded,
    camera-side replicated).
    """
    dc = ni * 6 + nr * 6 + nc * pmax

    def local_step(inst, rigcam, cam, points, obs_uv, obs_inv_sd, obs_point,
                   obs_inst, obs_rigcam, obs_cam, point_obs, gps_pos,
                   gps_inv_sd, opt_inst, opt_cam_mask, opt_points, lam,
                   point_base):
        dtype = points.dtype
        np_local = points.shape[0]

        def one(uv, inv_sd, pi, ii, ri, ci):
            combo = jnp.concatenate([inst[ii], rigcam[ri], cam[ci]])

            def res_fn(combo_, X_):
                Xc = _transform_rig(combo_[0:6], combo_[6:12], X_)
                pred = cam_lib.project(ptype, Xc, combo_[12:12 + pmax], xp=jnp)
                return (pred - uv) * inv_sd

            X = points[pi]
            return (
                res_fn(combo, X),
                jax.jacfwd(res_fn, argnums=0)(combo, X),
                jax.jacfwd(res_fn, argnums=1)(combo, X),
            )

        local_point = obs_point - point_base[0]  # local indices
        r, Jc, Jp = jax.vmap(one)(
            obs_uv, obs_inv_sd, local_point, obs_inst, obs_rigcam, obs_cam
        )
        rho, drho = LOSSES[loss]
        a2 = loss_threshold * loss_threshold
        s = jnp.sum(r * r, axis=-1)
        sw = jnp.sqrt(jnp.maximum(drho(s / a2), 1e-12))[:, None]
        r = r * sw
        Jc = Jc * sw[..., None]
        Jp = Jp * sw[..., None] * opt_points[local_point][:, None, None].astype(dtype)

        # Column indices (replicated camera-side layout).
        ar6 = jnp.arange(6)
        arp = jnp.arange(pmax)
        cols_i = jnp.where(
            opt_inst[obs_inst][:, None], obs_inst[:, None] * 6 + ar6[None, :], dc
        )
        cols_r = jnp.full((r.shape[0], 6), dc)  # rig cameras fixed here
        cols_c = jnp.where(
            opt_cam_mask[obs_cam],
            ni * 6 + nr * 6 + obs_cam[:, None] * pmax + arp[None, :], dc,
        )
        cols = jnp.concatenate([cols_i, cols_r, cols_c], axis=1)

        S = jnp.zeros((dc + 1, dc + 1), dtype=dtype)
        b = jnp.zeros((dc + 1,), dtype=dtype)
        S = S.at[cols[:, :, None], cols[:, None, :]].add(
            jnp.einsum("oki,okj->oij", Jc, Jc)
        )
        b = b.at[cols].add(jnp.einsum("oki,ok->oi", Jc, r))

        Hpp = jax.ops.segment_sum(
            jnp.einsum("oki,okj->oij", Jp, Jp), local_point,
            num_segments=np_local,
        )
        bp = jax.ops.segment_sum(
            jnp.einsum("oki,ok->oi", Jp, r), local_point, num_segments=np_local
        )
        eye3 = jnp.eye(3, dtype=dtype)
        Hpp = Hpp + lam * jax.vmap(jnp.diag)(
            jnp.diagonal(Hpp, axis1=1, axis2=2)
        ) + 1e-12 * eye3
        Hpp_inv = tpu_linalg.inv3(Hpp) * opt_points[:, None, None].astype(dtype)

        # Dense local W and Schur reduction.
        G = jnp.einsum("oki,okj->oij", Jc, Jp)
        W = jnp.zeros((dc + 1, np_local, 3), dtype=dtype)
        W = W.at[
            cols[:, :, None], local_point[:, None, None],
            jnp.arange(3)[None, None, :],
        ].add(G)
        Hib = jnp.einsum("pij,pj->pi", Hpp_inv, bp)
        b = b - jnp.einsum("dpk,pk->d", W, Hib)
        WH = jnp.einsum("dpk,pkl->dpl", W, Hpp_inv)
        S = S - WH.reshape(dc + 1, -1) @ W.reshape(dc + 1, -1).T

        # GPS priors: identical on every device; divide by device count so
        # the psum restores the correct weight.
        n_dev = jax.lax.psum(jnp.ones((), dtype=dtype), axis)

        # Origin residual: -R^T t - gps
        from opensfm_tpu.geometry import rotation as rot

        def gps_one(inst6, pos, inv):
            def f(x):
                return (-rot.rotate(-x[:3], x[3:6]) - pos) * inv

            return f(inst6), jax.jacfwd(f)(inst6)

        gr, gJ = jax.vmap(gps_one)(inst, gps_pos, gps_inv_sd[:, None])
        base = jnp.arange(ni)[:, None] * 6 + jnp.arange(6)[None, :]
        pcols = jnp.where(opt_inst[:, None], base, dc)
        S = S.at[pcols[:, :, None], pcols[:, None, :]].add(
            jnp.einsum("nki,nkj->nij", gJ, gJ) / n_dev
        )
        b = b.at[pcols].add(jnp.einsum("nki,nk->ni", gJ, gr) / n_dev)

        # Reduce the camera system over the mesh (the ICI collective).
        S = jax.lax.psum(S, axis)
        b = jax.lax.psum(b, axis)

        diag_S = jnp.diagonal(S)
        S = S + jnp.diag(lam * diag_S + 1e-10)
        S = 0.5 * (S + S.T)
        S = S.at[dc, :].set(0.0).at[:, dc].set(0.0).at[dc, dc].set(1.0)
        b = b.at[dc].set(0.0)
        # QR, not Cholesky: the f32 psum-assembled Schur complement can be
        # indefinite at roundoff scale, which NaNs a Cholesky factor.
        dx_c = tpu_linalg.solve_qr(S, b)

        u = jnp.einsum("dpk,d->pk", W, dx_c)
        dx_p = jnp.einsum("pij,pj->pi", Hpp_inv, bp - u)

        dxc = dx_c[:dc]
        d_inst = dxc[: ni * 6].reshape(ni, 6)
        d_cam = dxc[ni * 6 + nr * 6 :].reshape(nc, pmax)
        return inst - d_inst, cam - d_cam, points - dx_p

    from jax import shard_map

    spec_rep = P()
    spec_sh = P(axis)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            spec_rep, spec_rep, spec_rep, spec_sh,  # inst, rigcam, cam, points
            spec_sh, spec_sh, spec_sh, spec_sh, spec_sh, spec_sh,  # obs arrays
            spec_sh,  # point_obs
            spec_rep, spec_rep,  # gps
            spec_rep, spec_rep, spec_sh,  # opt masks
            spec_rep,  # lam
            spec_sh,  # point_base
        ),
        out_specs=(spec_rep, spec_rep, spec_sh),
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# Dense instance-slot sharded step: reuses the single-chip fast assembly
# (fused Pallas kernel on TPU, the XLA dense path elsewhere) per shard and
# psums the reduced block families — points/observations shard over the
# mesh, camera-side parameters replicate, the solve is replicated.
# ---------------------------------------------------------------------------


def shard_problem_dense(problem: BAProblem, n_shards: int):
    """Densify (slot == instance) and pad points so each shard holds an
    equal, 128-multiple block of points (obs shard contiguously with their
    points in the dense layout).  Returns (problem, per_shard_points)."""
    from opensfm_tpu.ba.lm import canonicalize_problem_dense

    problem, dense = canonicalize_problem_dense(problem)
    if not dense:
        raise ValueError("problem is not densifiable (mono single-camera)")
    ni = len(problem.inst)
    npts = len(problem.points)
    per_shard = -(-npts // n_shards)
    per_shard = ((per_shard + 127) // 128) * 128
    np_pad = per_shard * n_shards
    if np_pad != npts:
        import dataclasses

        def pad_pts(a, fill=0.0):
            out = np.full((np_pad,) + a.shape[1:], fill, dtype=a.dtype)
            out[:npts] = a
            return out

        def pad_obs(a, fill=0.0):
            out = np.full((np_pad * ni,) + a.shape[1:], fill, dtype=a.dtype)
            out[: npts * ni] = a
            return out

        problem = dataclasses.replace(
            problem,
            points=pad_pts(problem.points),
            point_prior=pad_pts(problem.point_prior),
            point_prior_inv_sd=pad_pts(problem.point_prior_inv_sd),
            opt_points=pad_pts(problem.opt_points, False),
            obs_uv=pad_obs(problem.obs_uv),
            obs_inv_sd=pad_obs(problem.obs_inv_sd),
            obs_point=np.repeat(
                np.arange(np_pad, dtype=np.int64), ni
            ),
            obs_inst=np.tile(np.arange(ni, dtype=np.int64), np_pad),
            obs_rigcam=np.zeros(np_pad * ni, dtype=np.int64),
            obs_cam=np.zeros(np_pad * ni, dtype=np.int64),
            point_obs=np.arange(np_pad * ni, dtype=np.int64).reshape(
                np_pad, ni
            ),
        )
    return problem, per_shard


def make_sharded_lm_step_dense(
    mesh: Mesh,
    axis: str,
    ni: int,
    nr: int,
    nc: int,
    pmax: int,
    loss: str = "SoftLOneLoss",
    loss_threshold: float = 1.0,
):
    """One distributed LM step over the dense instance-slot layout.

    Per device: the SAME reduced-system assembly as the single-chip fast
    path (`lm._build_reduced_system(..., raw_blocks=True)` — the fused
    Pallas kernel on TPU) over the local point/observation shard, then ONE
    `psum` of the small block families (the ICI collective), a replicated
    priors/damping epilogue + solve, and shard-local back-substitution.

    step(state, sharded_data, lam) -> new (inst, cam, points); `state` is
    (inst [NI,6], rigcam [NR,6], cam [NC,pmax], points [NP,3]) with points
    sharded over `axis`, and `sharded_data` the BAProblem arrays laid out
    by `shard_problem_dense` (obs arrays sharded, camera-side replicated).
    """
    from opensfm_tpu.ba import lm as _lm

    def local_step(inst, rigcam, cam, points, obs_uv, obs_inv_sd,
                   point_prior, point_prior_inv_sd, opt_points,
                   gps_pos, gps_inv_sd, cam_prior, cam_prior_inv_sd,
                   cam_log_mask, rigcam_prior, rigcam_prior_inv_sd,
                   opt_inst, opt_rigcam, opt_cam, lam):
        np_local = points.shape[0]
        num_obs = np_local * ni
        state = (inst, rigcam, cam, points)
        izeros = jnp.zeros(num_obs, dtype=jnp.int32)
        data = dict(
            obs_uv=obs_uv, obs_inv_sd=obs_inv_sd,
            obs_point=jnp.repeat(
                jnp.arange(np_local, dtype=jnp.int32), ni
            ),
            obs_inst=jnp.tile(jnp.arange(ni, dtype=jnp.int32), np_local),
            obs_rigcam=izeros, obs_cam=izeros,
            point_obs=jnp.arange(num_obs, dtype=jnp.int32).reshape(
                np_local, ni
            ),
            gps_pos=gps_pos, gps_inv_sd=gps_inv_sd,
            cam_prior=cam_prior, cam_prior_inv_sd=cam_prior_inv_sd,
            cam_log_mask=cam_log_mask, rigcam_prior=rigcam_prior,
            rigcam_prior_inv_sd=rigcam_prior_inv_sd,
            point_prior=point_prior, point_prior_inv_sd=point_prior_inv_sd,
            opt_inst=opt_inst, opt_rigcam=opt_rigcam, opt_cam=opt_cam,
            opt_points=opt_points,
            up_inst=jnp.zeros(0, jnp.int32),
            up_rigcam=jnp.zeros(0, jnp.int32),
            up_vec=jnp.zeros((0, 3), points.dtype),
            up_inv_sd=jnp.zeros(0, points.dtype),
            ang_kind=jnp.zeros(0, jnp.int32),
            ang_inst=jnp.zeros(0, jnp.int32),
            ang_rigcam=jnp.zeros(0, jnp.int32),
            ang_value=jnp.zeros(0, points.dtype),
            ang_inv_sd=jnp.zeros(0, points.dtype),
            obs_depth=jnp.zeros(num_obs, points.dtype),
            obs_depth_inv_sd=jnp.zeros(num_obs, points.dtype),
            obs_depth_radial=jnp.zeros(num_obs, bool),
        )
        blocks, back = _lm._build_reduced_system(
            state, data, lam, "perspective", loss, loss_threshold, pmax,
            ni, nr, nc, False, canonical=True, rig_transform=False,
            rig_jac=False, dense=True, raw_blocks=True,
        )
        # ONE collective: reduce the camera-side block families over ICI.
        blocks = tuple(jax.lax.psum(x, axis) for x in blocks)
        # Replicated epilogue (priors, identity rows, damping) + solve.
        S, b = _lm._assemble_S(
            state, data, lam, *blocks, ni, nr, nc, pmax, rig_jac=False,
        )
        # QR: the f32 psum-assembled Schur complement can be indefinite at
        # roundoff scale, which NaNs a Cholesky factor.
        dx_c = tpu_linalg.solve_qr(S, b)
        di, dr = ni * 6, nr * 6
        dx_i = dx_c[:di].reshape(ni, 6)
        dx_r = dx_c[di:di + dr].reshape(nr, 6)
        dx_cam = dx_c[di + dr:].reshape(nc, pmax)
        dx_p = _lm._back_substitute(back, dx_i, dx_r, dx_cam, ni, pmax)
        return inst - dx_i, cam - dx_cam, points - dx_p

    from jax import shard_map

    rep = P()
    sh = P(axis)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            rep, rep, rep, sh,          # inst, rigcam, cam, points
            sh, sh,                     # obs_uv, obs_inv_sd
            sh, sh, sh,                 # point priors, opt_points
            rep, rep, rep, rep, rep, rep, rep,  # gps + cam/rig priors
            rep, rep, rep,              # opt masks
            rep,                        # lam
        ),
        out_specs=(rep, rep, sh),
        check_vma=False,
    )
    return jax.jit(sharded)
