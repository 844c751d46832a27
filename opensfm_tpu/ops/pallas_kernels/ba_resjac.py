"""Fused BA residual + Jacobian Pallas kernel (mono perspective path).

Replaces the unrolled-JVP pass in `opensfm_tpu.ba.lm._residual_data` for the
dominant configuration (perspective camera, identity rig): one kernel
computes, per observation, the whitened robust residual, all 12 Jacobian
columns (6 pose + 3 intrinsics + 3 point) and the robust cost — entirely in
VMEM/registers.  XLA's fusion of the same 13 JVP pushes materializes ~8x the
necessary HBM traffic (measured 6.5 ms vs the ~1 ms bandwidth bound at
O=524k on a v5e-lite); the kernel exists to force the single-pass schedule.

Layout: feature-major [rows, O] so every per-observation quantity is a
[1, TILE] lane vector on the VPU (an [O, 24] layout would waste 5/6 of each
128-lane tile).  The host wrapper builds the packed input with one XLA
transpose pass and splits the packed output likewise.

Math mirrors geometry/rotation.py:114-131 (Rodrigues rotate) and
geometry/cameras.py perspective projection + 2-term radial distortion,
whitened and IRLS-weighted exactly like lm._residual_data (reference
semantics: ReprojectionError2D, bundle/error/projection_errors.h:31-58 and
ceres SoftLOne/Cauchy weights).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IN = 16  # input rows (15 used, padded to a multiple of 8)
N_OUT = 32  # output rows (27 used)
TILE = 4096
# Typed zero for index maps: a bare Python 0 lowers to an i64 constant under
# x64, which Mosaic rejects in the block index transform.
_Z = np.int32(0)

_EPS2 = 1e-14


def _chain(vals):
    """pred = perspective(distort(R(w) x + t)) — componentwise over lanes."""
    w0, w1, w2, t0, t1, t2, k1, k2, f, x0, x1, x2 = vals
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    small = th2 < _EPS2
    safe2 = jnp.where(small, jnp.ones_like(th2), th2)
    th = jnp.sqrt(safe2)
    cos_t = jnp.where(small, 1.0 - th2 / 2.0, jnp.cos(th))
    sinc = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    ccos = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - cos_t) / safe2)
    cxx = w1 * x2 - w2 * x1
    cyy = w2 * x0 - w0 * x2
    czz = w0 * x1 - w1 * x0
    rdx = w0 * x0 + w1 * x1 + w2 * x2
    X0 = x0 * cos_t + cxx * sinc + w0 * rdx * ccos + t0
    X1 = x1 * cos_t + cyy * sinc + w1 * rdx * ccos + t1
    X2 = x2 * cos_t + czz * sinc + w2 * rdx * ccos + t2
    # Reciprocal-multiply form, matching chain_fwd_jac bit-for-bit so the
    # fused cost and the full res+jac kernel produce identical primals.
    iz = 1.0 / X2
    u = X0 * iz
    v = X1 * iz
    r2 = u * u + v * v
    d = 1.0 + r2 * (k1 + k2 * r2)
    return f * d * u, f * d * v


def chain_fwd(vals):
    """Forward projection only (the accept/reject cost path needs no
    Jacobians).  Same math as the first section of `chain_fwd_jac`."""
    w0, w1, w2, t0, t1, t2, k1, k2, f, x0, x1, x2 = vals
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    small = th2 < _EPS2
    safe2 = jnp.where(small, jnp.ones_like(th2), th2)
    th = jnp.sqrt(safe2)
    cos_t = jnp.where(small, 1.0 - th2 / 2.0, jnp.cos(th))
    sinc = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    ccos = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - cos_t) / safe2)
    cxx = w1 * x2 - w2 * x1
    cyy = w2 * x0 - w0 * x2
    czz = w0 * x1 - w1 * x0
    rdx = w0 * x0 + w1 * x1 + w2 * x2
    X0 = x0 * cos_t + cxx * sinc + w0 * rdx * ccos + t0
    X1 = x1 * cos_t + cyy * sinc + w1 * rdx * ccos + t1
    X2 = x2 * cos_t + czz * sinc + w2 * rdx * ccos + t2
    iz = 1.0 / X2
    u = X0 * iz
    v = X1 * iz
    r2 = u * u + v * v
    d = 1.0 + r2 * (k1 + k2 * r2)
    return f * d * u, f * d * v


def chain_fwd_jac(vals):
    """Forward projection + all 12 Jacobian columns, hand-structured.

    Returns ((p0, p1), J0, J1) where J0/J1 are 12-lists of the two residual
    components' derivatives in direction order (w0..w2, t0..t2, k1, k2, f,
    x0..x2) — identical to pushing one-hot tangents through
    `jax.linearize(_chain, vals)` but ~7x fewer VPU ops: the Rodrigues
    derivative is the closed form d(Rx)/dw_i = w_i*V + sinc*(e_i x x) +
    ccos*(rdx*e_i + x_i*w) (Gallego & Yezzi), composed with the 2x3
    projection Jacobian A = P * d(u,v)/dX instead of re-evaluating the full
    linearized graph per direction. Mirrors the reference's analytic
    reprojection jacobians (bundle/error/projection_errors.h:31-58)."""
    w0, w1, w2, t0, t1, t2, k1, k2, f, x0, x1, x2 = vals
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    small = th2 < _EPS2
    safe2 = jnp.where(small, jnp.ones_like(th2), th2)
    th = jnp.sqrt(safe2)
    cos_t = jnp.where(small, 1.0 - th2 / 2.0, jnp.cos(th))
    sinc = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    ccos = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - cos_t) / safe2)
    # d(sinc)/dw_i = w_i*sp ; d(ccos)/dw_i = w_i*gp ; d(cos)/dw_i = -w_i*sinc
    sp = jnp.where(small, -1.0 / 3.0 + th2 / 30.0, (cos_t - sinc) / safe2)
    gp = jnp.where(small, -1.0 / 12.0 + th2 / 180.0,
                   (sinc - 2.0 * ccos) / safe2)

    cxx = w1 * x2 - w2 * x1
    cyy = w2 * x0 - w0 * x2
    czz = w0 * x1 - w1 * x0
    rdx = w0 * x0 + w1 * x1 + w2 * x2
    X0 = x0 * cos_t + cxx * sinc + w0 * rdx * ccos + t0
    X1 = x1 * cos_t + cyy * sinc + w1 * rdx * ccos + t1
    X2 = x2 * cos_t + czz * sinc + w2 * rdx * ccos + t2

    iz = 1.0 / X2
    u = X0 * iz
    v = X1 * iz
    r2 = u * u + v * v
    d = 1.0 + r2 * (k1 + k2 * r2)
    p0 = f * d * u
    p1 = f * d * v

    # 2x2 P = d(pred)/d(u,v); A = P @ [[1,0,-u],[0,1,-v]] * iz  (2x3).
    fdd = 2.0 * f * (k1 + 2.0 * k2 * r2)
    fd = f * d
    P00 = fd + fdd * u * u
    P01 = fdd * u * v
    P11 = fd + fdd * v * v
    A00 = P00 * iz
    A01 = P01 * iz
    A02 = -(P00 * u + P01 * v) * iz
    A10 = P01 * iz
    A11 = P11 * iz
    A12 = -(P01 * u + P11 * v) * iz

    # R = cos*I + sinc*[w]x + ccos*w w^T  (columns feed dX/dx = R).
    R00 = cos_t + ccos * w0 * w0
    R01 = ccos * w0 * w1 - sinc * w2
    R02 = ccos * w0 * w2 + sinc * w1
    R10 = ccos * w0 * w1 + sinc * w2
    R11 = cos_t + ccos * w1 * w1
    R12 = ccos * w1 * w2 - sinc * w0
    R20 = ccos * w0 * w2 - sinc * w1
    R21 = ccos * w1 * w2 + sinc * w0
    R22 = cos_t + ccos * w2 * w2

    # dX/dw_i = w_i*V + sinc*(e_i x x) + ccos*(rdx*e_i + x_i*w)
    V0 = -sinc * x0 + sp * cxx + gp * rdx * w0
    V1 = -sinc * x1 + sp * cyy + gp * rdx * w1
    V2 = -sinc * x2 + sp * czz + gp * rdx * w2
    Dw = (
        (w0 * V0 + ccos * (rdx + x0 * w0),
         w0 * V1 - sinc * x2 + ccos * x0 * w1,
         w0 * V2 + sinc * x1 + ccos * x0 * w2),
        (w1 * V0 + sinc * x2 + ccos * x1 * w0,
         w1 * V1 + ccos * (rdx + x1 * w1),
         w1 * V2 - sinc * x0 + ccos * x1 * w2),
        (w2 * V0 - sinc * x1 + ccos * x2 * w0,
         w2 * V1 + sinc * x0 + ccos * x2 * w1,
         w2 * V2 + ccos * (rdx + x2 * w2)),
    )

    J0 = [None] * 12
    J1 = [None] * 12
    for i in range(3):  # w directions
        D0, D1, D2 = Dw[i]
        J0[i] = A00 * D0 + A01 * D1 + A02 * D2
        J1[i] = A10 * D0 + A11 * D1 + A12 * D2
    J0[3], J0[4], J0[5] = A00, A01, A02  # t directions
    J1[3], J1[4], J1[5] = A10, A11, A12
    fu = f * u
    fv = f * v
    J0[6], J1[6] = fu * r2, fv * r2               # k1
    J0[7], J1[7] = fu * r2 * r2, fv * r2 * r2     # k2
    J0[8], J1[8] = d * u, d * v                   # f
    Rcols = ((R00, R10, R20), (R01, R11, R21), (R02, R12, R22))
    for j in range(3):  # x directions: A @ R[:, j]
        Rj0, Rj1, Rj2 = Rcols[j]
        J0[9 + j] = A00 * Rj0 + A01 * Rj1 + A02 * Rj2
        J1[9 + j] = A10 * Rj0 + A11 * Rj1 + A12 * Rj2
    return (p0, p1), J0, J1


def _make_kernel(loss: str, loss_threshold: float):
    from opensfm_tpu.ba.lm import LOSSES

    rho, drho = LOSSES[loss]
    a2 = loss_threshold * loss_threshold

    def kernel(inp_ref, out_ref):
        vals = tuple(inp_ref[i : i + 1, :] for i in range(12))
        obs_u = inp_ref[12:13, :]
        obs_v = inp_ref[13:14, :]
        isd = inp_ref[14:15, :]

        # Primal + all 12 Jacobian columns in one structured chain-rule pass
        # (~7x fewer VPU ops than re-running the linearized graph per
        # direction; verified against jax.linearize to 2e-15 rel in f64).
        (p0, p1), J0, J1 = chain_fwd_jac(vals)
        e0 = (p0 - obs_u) * isd
        e1 = (p1 - obs_v) * isd

        s = e0 * e0 + e1 * e1
        cost = 0.5 * a2 * rho(s / a2)
        w = drho(s / a2)
        sw = jnp.sqrt(jnp.maximum(w, 1e-12))

        out_ref[0:1, :] = e0 * sw
        out_ref[1:2, :] = e1 * sw
        scale = isd * sw
        for j in range(12):
            out_ref[2 + j : 3 + j, :] = J0[j] * scale
            out_ref[14 + j : 15 + j, :] = J1[j] * scale
        out_ref[26:27, :] = cost

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "loss", "loss_threshold", "interpret", "point_repeat", "dense_inst",
    ),
)
def fused_residual_jacobian(
    inst, cam, points, obs_inst, obs_cam, obs_point, obs_uv, obs_inv_sd,
    loss: str, loss_threshold: float, interpret: bool = False,
    point_repeat: int = 0, dense_inst: bool = False,
):
    """Returns (r[O,2], Jc[O,2,9], Jp[O,2,3], cost[O]) — whitened residuals,
    sqrt-IRLS-weighted Jacobians (columns: 6 instance pose, 3 camera
    [k1,k2,focal]) and per-obs robust cost, matching lm._residual_data with
    rig_transform=False for ptype='perspective'.

    `point_repeat=T` asserts the canonical (point, slot) layout
    (obs_point == repeat(arange(NP), T)): the point gather then lowers to a
    broadcast-reshape and the tiny instance/camera tables are expanded with
    one-hot MXU matmuls — TPU row-gathers of short rows cost ~1 ms at
    O=524k, the matmuls ~0.05 ms."""
    inp, O, O_pad = _pack_inputs(
        inst, cam, points, obs_inst, obs_cam, obs_point, obs_uv, obs_inv_sd,
        point_repeat, dense_inst,
    )
    dtype = obs_uv.dtype

    out = pl.pallas_call(
        _make_kernel(loss, float(loss_threshold)),
        out_shape=jax.ShapeDtypeStruct((N_OUT, O_pad), dtype),
        grid=(O_pad // TILE,),
        in_specs=[
            pl.BlockSpec((N_IN, TILE), lambda i: (_Z, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_OUT, TILE), lambda i: (_Z, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(inp)

    outT = out.T[:O]  # [O, N_OUT]
    r = outT[:, 0:2]
    # Row layout: cols 2-13 are K=0 derivs (12 dirs), 14-25 are K=1.
    Jrow0 = outT[:, 2:14]  # [O, 12]
    Jrow1 = outT[:, 14:26]
    J = jnp.stack([Jrow0, Jrow1], axis=1)  # [O, 2, 12]
    Jc = J[:, :, :9]
    Jp = J[:, :, 9:12]
    cost = outT[:, 26]
    return r, Jc, Jp, cost


def _pack_inputs(inst, cam, points, obs_inst, obs_cam, obs_point, obs_uv,
                 obs_inv_sd, point_repeat, dense_inst):
    """Gather/expand per-obs rows and transpose to the feature-major
    [N_IN, O_pad] kernel layout. Padded observations get t2=1 (a point at
    unit depth on the axis) and inv_sd=0, so the forward chain stays finite
    and their residual/cost contributions are exactly zero."""
    O = obs_uv.shape[0]
    O_pad = ((O + TILE - 1) // TILE) * TILE

    if point_repeat:
        # HIGHEST precision: the default TPU f32 matmul truncates operands
        # to bf16 on the MXU, which would corrupt the expanded table rows.
        hp = jax.lax.Precision.HIGHEST
        ni = inst.shape[0]
        if dense_inst:
            # Dense instance-slot layout (slot == instance): pure broadcast.
            gi = jnp.broadcast_to(
                inst[None], (O // ni, ni, inst.shape[1])
            ).reshape(O, inst.shape[1])
        else:
            Ei = jax.nn.one_hot(obs_inst, ni, dtype=inst.dtype)
            gi = jnp.matmul(Ei, inst, precision=hp)  # [O, 6]
        gx = jnp.repeat(points, point_repeat, axis=0)  # [O, 3], no gather
        if cam.shape[0] == 1:
            gc = jnp.broadcast_to(cam[:, :3], (O, 3))
        else:
            Ec = jax.nn.one_hot(obs_cam, cam.shape[0], dtype=cam.dtype)
            gc = jnp.matmul(Ec, cam[:, :3], precision=hp)
    else:
        gi = inst[obs_inst]  # [O, 6]
        gc = cam[obs_cam][:, :3]  # [O, 3] (k1, k2, focal)
        gx = points[obs_point]  # [O, 3]
    packed = jnp.concatenate(
        [gi, gc, gx, obs_uv, obs_inv_sd[:, None]], axis=1
    )  # [O, 15]
    if O_pad > O:
        # Pad rows: t2=1 keeps the projected depth at 1 (finite chain),
        # inv_sd=0 zeroes the residual/cost; everything else zero.
        pad_row = jnp.zeros((1, packed.shape[1]), packed.dtype).at[0, 5].set(1.0)
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(pad_row, (O_pad - O, packed.shape[1]))],
            axis=0,
        )
    packed = jnp.pad(packed, ((0, 0), (0, N_IN - packed.shape[1])))
    inp = packed.T  # [N_IN, O_pad] — one XLA transpose pass
    return inp, O, O_pad


def _make_cost_kernel(loss: str, loss_threshold: float, n_blocks: int):
    from opensfm_tpu.ba.lm import LOSSES

    rho, _ = LOSSES[loss]
    a2 = loss_threshold * loss_threshold

    def kernel(inp_ref, out_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        vals = tuple(inp_ref[i : i + 1, :] for i in range(12))
        obs_u = inp_ref[12:13, :]
        obs_v = inp_ref[13:14, :]
        isd = inp_ref[14:15, :]
        p0, p1 = _chain(vals)
        e0 = (p0 - obs_u) * isd
        e1 = (p1 - obs_v) * isd
        s = e0 * e0 + e1 * e1
        acc[:] = acc[:] + 0.5 * a2 * rho(s / a2)

        @pl.when(step == n_blocks - 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "loss", "loss_threshold", "interpret", "point_repeat", "dense_inst",
    ),
)
def fused_cost(
    inst, cam, points, obs_inst, obs_cam, obs_point, obs_uv, obs_inv_sd,
    loss: str, loss_threshold: float, interpret: bool = False,
    point_repeat: int = 0, dense_inst: bool = False,
):
    """Total robust reprojection cost (scalar) — the forward chain only.

    The LM accept/reject trial needs just the objective; running the full
    residual+Jacobian kernel for it wastes ~90% of the work and the whole
    [32, O] HBM output. This kernel accumulates the per-lane partial costs
    in VMEM across the grid and writes one [1, TILE] row."""
    if obs_uv.shape[0] == 0:
        # grid=(0,) would never run the kernel, leaving the output buffer
        # uninitialized; an empty problem has zero cost by definition.
        return jnp.zeros((), obs_uv.dtype)
    inp, O, O_pad = _pack_inputs(
        inst, cam, points, obs_inst, obs_cam, obs_point, obs_uv, obs_inv_sd,
        point_repeat, dense_inst,
    )
    n_blocks = O_pad // TILE
    partial_sums = pl.pallas_call(
        _make_cost_kernel(loss, float(loss_threshold), n_blocks),
        out_shape=jax.ShapeDtypeStruct((1, TILE), obs_uv.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((N_IN, TILE), lambda i: (_Z, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (_Z, _Z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, TILE), obs_uv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(inp)
    return jnp.sum(partial_sums)
