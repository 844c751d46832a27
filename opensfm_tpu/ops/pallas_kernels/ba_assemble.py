"""Fully-fused Schur-assembly Pallas kernel (dense mono BA fast path).

One kernel computes, per grid block of points, everything
`lm._build_reduced_system` needs for the dense instance-slot layout
(slot == instance, perspective camera, identity rig, one camera):

- whitened residuals + all 12 Jacobian columns (as `ba_resjac`),
- per-point 3x3 Hessians, their closed-form inverses, `bp`, `Hib`,
- the Schur products  S_II -= sum_p Aa_p Ga_p',  S_IC -= Aa Vg',
  S_CC -= Ug Vg'  accumulated in VMEM across the sequential grid,
- all direct (same-observation) block contributions and both RHS families.

Everything the XLA schedule of the same math materializes in HBM
([O,2,6]-style tensors, their relayout copies and VMEM staging — measured
~2 ms/LM-iteration at O=524k on v5e) stays in VMEM here; HBM traffic is
one read of the packed inputs plus the [32, O] observation rows kept for
back-substitution.

Layout: every per-observation quantity is a [PB, NI] tile (points on
sublanes, instances on lanes — the dense layout makes the instance
selector the identity, so "lane index == reduced-system block index").
Per-point scalars are [PB, 1] columns; cross-point accumulators live in
VMEM scratch and are flushed on the last grid step.

Math mirrors lm._residual_data / lm._build_reduced_system (reference
semantics: ReprojectionError2D + Ceres robust losses,
bundle/src/bundle_adjuster.cc:595-1121).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opensfm_tpu.ops.pallas_kernels.ba_resjac import chain_fwd_jac

PB = 128  # points per grid step (sublanes)
# Typed zero for index maps: a bare Python 0 lowers to an i64 constant under
# x64, which Mosaic rejects in the block index transform.
_Z = np.int32(0)

# out_obs rows (identical to ba_resjac's [N_OUT, O] layout so the
# back-substitution / cost consumers are shared):
#   0-1   e0, e1 (whitened, sqrt-IRLS-weighted)
#   2-13  d0 of the 12 pushes, 14-25 d1, 26 robust cost
N_OUT_OBS = 32
# out_point rows: 0-5 Hpp_inv (xx,xy,xz,yy,yz,zz), 6-8 bp, 9-11 Hib
N_OUT_PT = 16


def _sym3_inv(h_xx, h_xy, h_xz, h_yy, h_yz, h_zz):
    """Closed-form inverse of a symmetric 3x3 given its 6 entries."""
    c_xx = h_yy * h_zz - h_yz * h_yz
    c_xy = h_xz * h_yz - h_xy * h_zz
    c_xz = h_xy * h_yz - h_xz * h_yy
    c_yy = h_xx * h_zz - h_xz * h_xz
    c_yz = h_xy * h_xz - h_xx * h_yz
    c_zz = h_xx * h_yy - h_xy * h_xy
    det = h_xx * c_xx + h_xy * c_xy + h_xz * c_xz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    inv_det = jnp.where(jnp.abs(det) < 1e-30, 0.0, inv_det)
    return (c_xx * inv_det, c_xy * inv_det, c_xz * inv_det,
            c_yy * inv_det, c_yz * inv_det, c_zz * inv_det)


def _sym_tile(ni6: int) -> int:
    """Column-tile width for the triangular S_II product.  Must divide
    6*ni and be a lane multiple: the executed fraction of the full square
    is (T+1)/2T for T = ni6/tile, so smaller tiles skip more of the
    (symmetric) upper triangle at the cost of more matmul issues.  ni is
    a power of two >= 64 on the product path, so ni6 is a multiple of
    384; tiny (test) problems fall back to one full tile — lane slices
    must stay 128-aligned anyway."""
    if ni6 % 256 == 0:
        return 256
    if ni6 % 128 == 0:
        return 128
    return ni6


def _make_kernel(loss: str, loss_threshold: float, ni: int, n_blocks: int,
                 emit_obs: bool = True):
    from opensfm_tpu.ba.lm import LOSSES

    rho, drho = LOSSES[loss]
    a2 = loss_threshold * loss_threshold
    ni6 = ni * 6

    def kernel(
        # inputs (blocked): obs tiles [PB, NI]; per-point tiles [PB, 1];
        # small replicated tables.
        u_ref, v_ref, isd_ref,              # [PB, NI]
        xr0_ref, xr1_ref, xr2_ref,          # [PB, NI] point coords (repeated)
        inst_ref,                           # [8, NI]: w0..w2 t0..t2, opt, pad
        cam_ref,                            # [1, 8]: k1 k2 f lam opt0 opt1 opt2
        optp_ref, ppr0_ref, ppr1_ref, ppr2_ref,  # [PB, 1]
        ppw0_ref, ppw1_ref, ppw2_ref,       # [PB, 1]
        # outputs (out_obs_ref only when emit_obs)
        *refs,
    ):
        if emit_obs:
            (out_obs_ref, out_pt_ref, out_sII_ref, out_aux_ref,
             sII_acc, aux_acc, cat_b) = refs
        else:
            (out_pt_ref, out_sII_ref, out_aux_ref,
             sII_acc, aux_acc, cat_b) = refs
            out_obs_ref = None
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            sII_acc[:] = jnp.zeros_like(sII_acc)
            aux_acc[:] = jnp.zeros_like(aux_acc)

        one_row = inst_ref[0:1, :] * 0.0 + 1.0  # [1, NI] of ones
        vals = (
            inst_ref[0:1, :], inst_ref[1:2, :], inst_ref[2:3, :],
            inst_ref[3:4, :], inst_ref[4:5, :], inst_ref[5:6, :],
            cam_ref[0, 0] * one_row, cam_ref[0, 1] * one_row,
            cam_ref[0, 2] * one_row,
            xr0_ref[:], xr1_ref[:], xr2_ref[:],
        )
        # Broadcast [1,NI] pose rows against [PB,NI] point rows happens
        # inside the chain's elementwise math.
        (p0, p1), J0raw, J1raw = chain_fwd_jac(vals)
        isd = isd_ref[:]
        e0 = (p0 - u_ref[:]) * isd
        e1 = (p1 - v_ref[:]) * isd

        s = e0 * e0 + e1 * e1
        cost = 0.5 * a2 * rho(s / a2)
        sw = jnp.sqrt(jnp.maximum(drho(s / a2), 1e-12))
        scale = isd * sw

        if emit_obs:
            out_obs_ref[0] = e0 * sw
            out_obs_ref[1] = e1 * sw
            out_obs_ref[26] = cost

        J0 = []
        J1 = []
        opt_i = inst_ref[6:7, :]           # [1, NI] 0/1
        opt_c = (cam_ref[0, 4], cam_ref[0, 5], cam_ref[0, 6])
        optp = optp_ref[:]                 # [PB, 1]
        for jdir in range(12):
            d0 = J0raw[jdir] * scale
            d1 = J1raw[jdir] * scale
            if emit_obs:
                out_obs_ref[2 + jdir] = d0
                out_obs_ref[14 + jdir] = d1
            # Optimization masks for the assembly-side copies.
            if jdir < 6:
                d0 = d0 * opt_i
                d1 = d1 * opt_i
            elif jdir < 9:
                d0 = d0 * opt_c[jdir - 6]
                d1 = d1 * opt_c[jdir - 6]
            else:
                d0 = d0 * optp
                d1 = d1 * optp
            J0.append(d0)
            J1.append(d1)
        r0 = e0 * sw
        r1 = e1 * sw
        Jp0 = J0[9:12]
        Jp1 = J1[9:12]

        # ---- per-point 3x3 system (lane reductions) ------------------------
        def psum(x):
            return jnp.sum(x, axis=1, keepdims=True)  # [PB, 1]

        lam = cam_ref[0, 3]
        h = {}
        for a_ in range(3):
            for b_ in range(a_, 3):
                h[(a_, b_)] = psum(Jp0[a_] * Jp0[b_] + Jp1[a_] * Jp1[b_])
        bp = [psum(Jp0[j] * r0 + Jp1[j] * r1) for j in range(3)]
        ppw = (ppw0_ref[:], ppw1_ref[:], ppw2_ref[:])
        ppr = (ppr0_ref[:], ppr1_ref[:], ppr2_ref[:])
        for j in range(3):
            h[(j, j)] = h[(j, j)] + ppw[j] * ppw[j]
            bp[j] = bp[j] + ppr[j] * ppw[j]
        for j in range(3):
            h[(j, j)] = h[(j, j)] * (1.0 + lam) + 1e-12
        hi = _sym3_inv(h[(0, 0)], h[(0, 1)], h[(0, 2)],
                       h[(1, 1)], h[(1, 2)], h[(2, 2)])
        hi = tuple(x * optp for x in hi)
        hinv = {
            (0, 0): hi[0], (0, 1): hi[1], (0, 2): hi[2],
            (1, 0): hi[1], (1, 1): hi[3], (1, 2): hi[4],
            (2, 0): hi[2], (2, 1): hi[4], (2, 2): hi[5],
        }
        hib = [sum(hinv[(j, k)] * bp[k] for k in range(3)) for j in range(3)]

        for j in range(6):
            out_pt_ref[:, j:j + 1] = hi[j]
        for j in range(3):
            out_pt_ref[:, 6 + j:7 + j] = bp[j]
            out_pt_ref[:, 9 + j:10 + j] = hib[j]
        out_pt_ref[:, 12:16] = jnp.zeros_like(out_pt_ref[:, 12:16])

        # ---- i-family couplings -------------------------------------------
        # Ga[x][j] = sum_k Ji_kx Jp_kj per obs.
        Ga = [[J0[x] * Jp0[j] + J1[x] * Jp1[j] for j in range(3)]
              for x in range(6)]
        # Closed-form Cholesky Hinv = L L' (per point, [PB,1] entries).
        # S_II = sum_p Ga Hinv Ga' = sum_p B B' with B = Ga L is then
        # symmetric BY CONSTRUCTION, so only the lower-triangular column
        # tiles of the big product need to be executed on the MXU — the
        # wrapper mirrors them back ((T+1)/2T of the square's FLOPs,
        # ~0.58 at the 256-instance lane).
        tiny = 1e-30
        l00 = jnp.sqrt(jnp.maximum(hi[0], 0.0))
        il00 = jnp.where(l00 > tiny, 1.0 / jnp.maximum(l00, tiny), 0.0)
        l10 = hi[1] * il00
        l20 = hi[2] * il00
        l11 = jnp.sqrt(jnp.maximum(hi[3] - l10 * l10, 0.0))
        il11 = jnp.where(l11 > tiny, 1.0 / jnp.maximum(l11, tiny), 0.0)
        l21 = (hi[4] - l20 * l10) * il11
        l22 = jnp.sqrt(jnp.maximum(hi[5] - l20 * l20 - l21 * l21, 0.0))
        L = {(0, 0): l00, (1, 0): l10, (2, 0): l20,
             (1, 1): l11, (2, 1): l21, (2, 2): l22}
        B = [[sum(Ga[x][j] * L[(j, k)] for j in range(k, 3))
              for k in range(3)] for x in range(6)]
        # c-family per point: Vg[y][j] = sum_{k,t} Jc_ky Jp_kj  -> [PB,1]
        Jc0 = J0[6:9]
        Jc1 = J1[6:9]
        Vg = [[psum(Jc0[y] * Jp0[j] + Jc1[y] * Jp1[j]) for j in range(3)]
              for y in range(3)]
        Ug = [[sum(Vg[y][j] * hinv[(j, k)] for j in range(3))
               for k in range(3)] for y in range(3)]
        # Cg = Vg L  (so schur_IC = sum_k B_xk Cg_yk below).
        Cg = [[sum(Vg[y][j] * L[(j, k)] for j in range(k, 3))
               for k in range(3)] for y in range(3)]

        # ---- Schur II: triangular-tiled symmetric product ------------------
        # cat_b: [PB, 6*NI], lane block x holds B_xk; the per-k structure
        # (build cat on the VPU, then issue this k's matmuls) lets Mosaic
        # overlap the MXU dots of one k with the VPU cat-build of the
        # next.  Only column tiles r >= c are computed.
        ts = _sym_tile(ni6)
        for k in range(3):
            for x in range(6):
                cat_b[:, x * ni:(x + 1) * ni] = B[x][k]
            for r in range(ni6 // ts):
                for c in range(r + 1):
                    sII_acc[r * ts:(r + 1) * ts, c * ts:(c + 1) * ts] = (
                        sII_acc[r * ts:(r + 1) * ts, c * ts:(c + 1) * ts]
                        + jax.lax.dot_general(
                            cat_b[:, r * ts:(r + 1) * ts],
                            cat_b[:, c * ts:(c + 1) * ts],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )

        # ---- direct + RHS partials (aux rows, [*, NI]) ---------------------
        def lsum(x):
            return jnp.sum(x, axis=0, keepdims=True)  # [1, NI]

        aux = aux_acc
        # rows 0-35: direct_II (x*6+y) = sum_{p,k} Ji_kx Ji_ky
        for x in range(6):
            for y in range(6):
                aux[x * 6 + y:x * 6 + y + 1, :] += lsum(
                    J0[x] * J0[y] + J1[x] * J1[y])
        # rows 36-53: direct_IC (x*3+y) = sum_{p,k} Ji_kx Jc_ky
        for x in range(6):
            for y in range(3):
                aux[36 + x * 3 + y:37 + x * 3 + y, :] += lsum(
                    J0[x] * Jc0[y] + J1[x] * Jc1[y])
        # rows 54-59: direct_CC (6 upper entries, lane partials)
        idx = 54
        for x in range(3):
            for y in range(x, 3):
                aux[idx:idx + 1, :] += lsum(Jc0[x] * Jc0[y] + Jc1[x] * Jc1[y])
                idx += 1
        # rows 60-77: schur_IC (x*3+y) = sum_{p,k} Ga_x Hinv Vg_y
        #           = sum_{p,k} B_xk Cg_yk (lane partials)
        for x in range(6):
            for y in range(3):
                acc = None
                for k in range(3):
                    t = B[x][k] * Cg[y][k]
                    acc = t if acc is None else acc + t
                aux[60 + x * 3 + y:61 + x * 3 + y, :] += lsum(acc)
        # rows 78-83: b_i = sum_p [ Ji'r  -  Ga Hib ]
        for x in range(6):
            direct = J0[x] * r0 + J1[x] * r1
            gsch = sum(Ga[x][j] * hib[j] for j in range(3))
            aux[78 + x:79 + x, :] += lsum(direct - gsch)
        # rows 84-86: b_c direct = sum_{p,k} Jc'r (lane partials)
        for y in range(3):
            aux[84 + y:85 + y, :] += lsum(Jc0[y] * r0 + Jc1[y] * r1)
        # rows 87-89: b_c schur = sum_p Vg Hib (scalar; lane partials of
        # [PB,1] broadcast are NI identical copies -> divide by NI later? no:
        # psum gave [PB,1]; lsum of [PB,1] broadcast to [PB,NI] would
        # multiply by NI. Store into lane 0 only via explicit [1,1] adds.
        for y in range(3):
            val = jnp.sum(sum(Vg[y][j] * hib[j] for j in range(3)))
            aux[87 + y:88 + y, 0:1] += val
        # rows 90-95: schur_CC (6 upper entries) = sum_p Ug Vg'
        idx = 90
        for x in range(3):
            for y in range(x, 3):
                val = jnp.sum(sum(Ug[x][k] * Vg[y][k] for k in range(3)))
                aux[idx:idx + 1, 0:1] += val
                idx += 1

        @pl.when(step == n_blocks - 1)
        def _():
            out_sII_ref[:] = sII_acc[:]
            out_aux_ref[:] = aux_acc[:]

    return kernel


def _make_backsub_kernel(loss: str, loss_threshold: float):
    from opensfm_tpu.ba.lm import LOSSES

    _, drho = LOSSES[loss]
    a2 = loss_threshold * loss_threshold

    def kernel(u_ref, v_ref, isd_ref, x0_ref, x1_ref, x2_ref,
               inst_ref, cam_ref, pt_ref, dxi_ref, dxc_ref, out_ref):
        one_row = inst_ref[0:1, :] * 0.0 + 1.0
        x0 = jnp.broadcast_to(x0_ref[:], u_ref.shape)
        x1 = jnp.broadcast_to(x1_ref[:], u_ref.shape)
        x2 = jnp.broadcast_to(x2_ref[:], u_ref.shape)
        vals = (
            inst_ref[0:1, :], inst_ref[1:2, :], inst_ref[2:3, :],
            inst_ref[3:4, :], inst_ref[4:5, :], inst_ref[5:6, :],
            cam_ref[0, 0] * one_row, cam_ref[0, 1] * one_row,
            cam_ref[0, 2] * one_row,
            x0, x1, x2,
        )
        (p0, p1), J0raw, J1raw = chain_fwd_jac(vals)
        isd = isd_ref[:]
        e0 = (p0 - u_ref[:]) * isd
        e1 = (p1 - v_ref[:]) * isd
        s = e0 * e0 + e1 * e1
        sw = jnp.sqrt(jnp.maximum(drho(s / a2), 1e-12))
        scale = isd * sw

        # tmp = J_obs . dx (pose + camera directions), both residual rows.
        tmp0 = jnp.zeros_like(e0)
        tmp1 = jnp.zeros_like(e1)
        for x in range(6):
            dxi_row = dxi_ref[x:x + 1, :]        # [1, NI]
            tmp0 = tmp0 + J0raw[x] * scale * dxi_row
            tmp1 = tmp1 + J1raw[x] * scale * dxi_row
        for y in range(3):
            dxc_y = dxc_ref[0, y]
            tmp0 = tmp0 + J0raw[6 + y] * scale * dxc_y
            tmp1 = tmp1 + J1raw[6 + y] * scale * dxc_y

        # u_j = sum_slots Jp_j . tmp  (lane reduction)
        uvec = []
        for j in range(3):
            uvec.append(jnp.sum(
                J0raw[9 + j] * scale * tmp0 + J1raw[9 + j] * scale * tmp1,
                axis=1, keepdims=True,
            ))  # [PB, 1]
        # dx_p = Hpp_inv (bp - u) from the assembly pass's per-point rows.
        hi = [pt_ref[:, j:j + 1] for j in range(6)]
        bp = [pt_ref[:, 6 + j:7 + j] for j in range(3)]
        hinv = {
            (0, 0): hi[0], (0, 1): hi[1], (0, 2): hi[2],
            (1, 0): hi[1], (1, 1): hi[3], (1, 2): hi[4],
            (2, 0): hi[2], (2, 1): hi[4], (2, 2): hi[5],
        }
        out_ref[:] = jnp.zeros_like(out_ref)
        for j in range(3):
            out_ref[:, j:j + 1] = sum(
                hinv[(j, k)] * (bp[k] - uvec[k]) for k in range(3)
            )

    return kernel


@partial(jax.jit, static_argnames=("loss", "loss_threshold", "ni",
                                   "interpret"))
def fused_back_substitute(
    inst, cam, points, obs_uv, obs_inv_sd, out_pt, dx_i, dx_cam,
    loss: str, loss_threshold: float, ni: int, interpret: bool = False,
):
    """Point back-substitution by RECOMPUTING the Jacobian chain.

    The alternative — keeping the kernel's [32, NP, NI] observation rows
    in HBM for `_back_substitute` — costs a ~1.07 GB write plus a ~0.8 GB
    read per LM step at the 256-cam lane, which is ~40% of the whole step
    on a ~61 TF/s-measured chip.  The chain is ~300 VPU flops per
    observation slot: recomputing it from the 100 MB of raw inputs is far
    below the bandwidth cost of materializing it.

    dx_i is [NI, 6] (the solved pose update), dx_cam [1, >=3]; out_pt is
    the assembly kernel's per-point output (Hpp_inv, bp).  Returns
    dx_p [NP, 3]."""
    NP = points.shape[0]
    assert NP % PB == 0, NP
    n_blocks = NP // PB
    dtype = jnp.float32

    u = obs_uv[:, 0].reshape(NP, ni).astype(dtype)
    v = obs_uv[:, 1].reshape(NP, ni).astype(dtype)
    isd = obs_inv_sd.reshape(NP, ni).astype(dtype)
    inst_t = jnp.concatenate(
        [inst[:, :6].T.astype(dtype), jnp.zeros((2, ni), dtype)], axis=0
    )
    cam_row = jnp.concatenate(
        [cam[0, :3].astype(dtype), jnp.zeros((5,), dtype)]
    )[None]
    dxi_t = jnp.concatenate(
        [dx_i[:, :6].T.astype(dtype), jnp.zeros((2, ni), dtype)], axis=0
    )  # [8, NI]
    dxc_row = jnp.concatenate(
        [dx_cam[0, :3].astype(dtype), jnp.zeros((5,), dtype)]
    )[None]

    obs_spec = pl.BlockSpec((PB, ni), lambda i: (i, _Z),
                            memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec((PB, 1), lambda i: (i, _Z),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_backsub_kernel(loss, float(loss_threshold)),
        grid=(n_blocks,),
        in_specs=[
            obs_spec, obs_spec, obs_spec,
            pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((8, ni), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (_Z, _Z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, N_OUT_PT), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ni), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (_Z, _Z),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((PB, 128), lambda i: (i, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, 128), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(u, v, isd, points[:, 0:1].astype(dtype), points[:, 1:2].astype(dtype),
      points[:, 2:3].astype(dtype), inst_t, cam_row, out_pt, dxi_t, dxc_row)
    return out[:, :3]


def _make_cost_kernel_dense(loss: str, loss_threshold: float,
                            n_blocks: int):
    from opensfm_tpu.ba.lm import LOSSES
    from opensfm_tpu.ops.pallas_kernels.ba_resjac import chain_fwd

    rho, _ = LOSSES[loss]
    a2 = loss_threshold * loss_threshold

    def kernel(u_ref, v_ref, isd_ref, x0_ref, x1_ref, x2_ref,
               inst_ref, cam_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        one_row = inst_ref[0:1, :] * 0.0 + 1.0
        x0 = jnp.broadcast_to(x0_ref[:], u_ref.shape)
        x1 = jnp.broadcast_to(x1_ref[:], u_ref.shape)
        x2 = jnp.broadcast_to(x2_ref[:], u_ref.shape)
        vals = (
            inst_ref[0:1, :], inst_ref[1:2, :], inst_ref[2:3, :],
            inst_ref[3:4, :], inst_ref[4:5, :], inst_ref[5:6, :],
            cam_ref[0, 0] * one_row, cam_ref[0, 1] * one_row,
            cam_ref[0, 2] * one_row,
            x0, x1, x2,
        )
        p0, p1 = chain_fwd(vals)
        isd = isd_ref[:]
        e0 = (p0 - u_ref[:]) * isd
        e1 = (p1 - v_ref[:]) * isd
        s = e0 * e0 + e1 * e1
        acc_ref[:] = acc_ref[:] + jnp.sum(
            0.5 * a2 * rho(s / a2), axis=0, keepdims=True
        )

        @pl.when(step == n_blocks - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


@partial(jax.jit, static_argnames=("loss", "loss_threshold", "ni",
                                   "interpret"))
def fused_cost_dense(
    inst, cam, points, obs_uv, obs_inv_sd,
    loss: str, loss_threshold: float, ni: int, interpret: bool = False,
):
    """Total robust reprojection cost over the dense instance-slot layout.

    Same input scheme as `fused_schur_assembly` — [NP, NI] observation
    tiles read straight from HBM, per-point coordinates as [PB, 1] columns
    broadcast in VMEM — so the accept/reject trial touches ~100 MB instead
    of the [O, 15] pack + feature-major transpose the generic `fused_cost`
    pays (~1.5 GB at the 256-cam/32k-pt lane: 10.2 ms -> ~0.5 ms)."""
    NP = points.shape[0]
    assert NP % PB == 0, NP
    n_blocks = NP // PB
    dtype = jnp.float32

    u = obs_uv[:, 0].reshape(NP, ni).astype(dtype)
    v = obs_uv[:, 1].reshape(NP, ni).astype(dtype)
    isd = obs_inv_sd.reshape(NP, ni).astype(dtype)
    inst_t = jnp.concatenate(
        [inst[:, :6].T.astype(dtype), jnp.zeros((2, ni), dtype)], axis=0
    )
    cam_row = jnp.concatenate(
        [cam[0, :3].astype(dtype), jnp.zeros((5,), dtype)]
    )[None]

    obs_spec = pl.BlockSpec((PB, ni), lambda i: (i, _Z),
                            memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec((PB, 1), lambda i: (i, _Z),
                           memory_space=pltpu.VMEM)
    partial_rows = pl.pallas_call(
        _make_cost_kernel_dense(loss, float(loss_threshold), n_blocks),
        grid=(n_blocks,),
        in_specs=[
            obs_spec, obs_spec, obs_spec,
            pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((8, ni), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (_Z, _Z),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ni), lambda i: (_Z, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, ni), dtype),
        scratch_shapes=[pltpu.VMEM((1, ni), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(u, v, isd, points[:, 0:1].astype(dtype), points[:, 1:2].astype(dtype),
      points[:, 2:3].astype(dtype), inst_t, cam_row)
    return jnp.sum(partial_rows)


@partial(
    jax.jit,
    static_argnames=("loss", "loss_threshold", "ni", "interpret",
                     "emit_obs_rows"),
)
def fused_schur_assembly(
    inst, cam, points, obs_uv, obs_inv_sd, opt_inst, opt_cam, opt_points,
    point_prior, point_prior_inv_sd, lam,
    loss: str, loss_threshold: float, ni: int, interpret: bool = False,
    emit_obs_rows: bool = True,
):
    """Run the fused assembly. Shapes: inst [NI,6], cam [1,>=3],
    points [NP,3], obs_uv [NP*NI,2], obs_inv_sd [NP*NI] in the dense
    instance-slot layout. Returns (out_obs [32, NP*NI], out_pt [NP, 16],
    sII_schur [ni6, ni6] in (x,a) row ordering, aux [96, NI]).

    `emit_obs_rows=False` skips the [32, NP, NI] observation-row output
    entirely (out_obs returned as None) — the back-substitution consumer
    recomputes the chain instead (`fused_back_substitute`), trading ~300
    VPU flops/slot for ~1.9 GB of HBM round-trip per LM step at the
    256-camera lane."""
    NP = points.shape[0]
    assert NP % PB == 0, NP
    n_blocks = NP // PB
    dtype = jnp.float32

    u = obs_uv[:, 0].reshape(NP, ni).astype(dtype)
    v = obs_uv[:, 1].reshape(NP, ni).astype(dtype)
    isd = obs_inv_sd.reshape(NP, ni).astype(dtype)
    xr = [
        jnp.broadcast_to(points[:, j:j + 1].astype(dtype), (NP, ni))
        for j in range(3)
    ]
    inst_t = jnp.concatenate(
        [inst[:, :6].T.astype(dtype), opt_inst.astype(dtype)[None],
         jnp.zeros((1, ni), dtype)], axis=0,
    )  # [8, NI]
    cam_row = jnp.concatenate([
        cam[0, :3].astype(dtype), jnp.asarray(lam, dtype)[None],
        opt_cam[0, :3].astype(dtype), jnp.zeros((1,), dtype),
    ])[None]  # [1, 8]
    optp = opt_points.astype(dtype)[:, None]
    ppr = (points - point_prior).astype(dtype) * point_prior_inv_sd.astype(dtype)
    ppw = point_prior_inv_sd.astype(dtype)

    ni6 = ni * 6
    obs_spec = pl.BlockSpec((PB, ni), lambda i: (i, _Z),
                            memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec((PB, 1), lambda i: (i, _Z),
                           memory_space=pltpu.VMEM)
    rep_spec = pl.BlockSpec((8, ni), lambda i: (_Z, _Z),
                            memory_space=pltpu.VMEM)
    cam_spec = pl.BlockSpec((1, 8), lambda i: (_Z, _Z),
                            memory_space=pltpu.SMEM)

    obs_out_specs = [
        pl.BlockSpec((N_OUT_OBS, PB, ni), lambda i: (_Z, i, _Z),
                     memory_space=pltpu.VMEM),
    ] if emit_obs_rows else []
    obs_out_shapes = [
        jax.ShapeDtypeStruct((N_OUT_OBS, NP, ni), dtype),
    ] if emit_obs_rows else []
    out = pl.pallas_call(
        _make_kernel(loss, float(loss_threshold), ni, n_blocks,
                     emit_obs=emit_obs_rows),
        grid=(n_blocks,),
        in_specs=[
            obs_spec, obs_spec, obs_spec,        # u, v, isd
            obs_spec, obs_spec, obs_spec,        # xr0..2
            rep_spec, cam_spec,
            pt_spec, pt_spec, pt_spec, pt_spec,  # optp, ppr0..2
            pt_spec, pt_spec, pt_spec,           # ppw0..2
        ],
        out_specs=obs_out_specs + [
            pl.BlockSpec((PB, N_OUT_PT), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ni6, ni6), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((96, ni), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=obs_out_shapes + [
            jax.ShapeDtypeStruct((NP, N_OUT_PT), dtype),
            jax.ShapeDtypeStruct((ni6, ni6), dtype),
            jax.ShapeDtypeStruct((96, ni), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ni6, ni6), dtype),
            pltpu.VMEM((96, ni), dtype),
            pltpu.VMEM((PB, ni6), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The [6ni, 6ni] S_II accumulator + its output block dominate
            # scoped VMEM (2 x 9.4 MB at ni=256); the default 16 MB scope
            # caps the kernel at ni=64.  v5e has 128 MB of VMEM — allow up
            # to ni=256 (~28 MB peak).
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u, v, isd, xr[0], xr[1], xr[2], inst_t, cam_row,
      optp, ppr[:, 0:1], ppr[:, 1:2], ppr[:, 2:3],
      ppw[:, 0:1], ppw[:, 1:2], ppw[:, 2:3])
    out = list(out)
    # The kernel executes only the lower-triangular column tiles of the
    # symmetric S_II product (B B' form) — mirror the skipped tiles.
    sII_idx = len(out) - 2
    sII = out[sII_idx]
    ts = _sym_tile(ni6)
    tile_of = jax.lax.broadcasted_iota(jnp.int32, (ni6, ni6), 0) // ts
    tile_of_c = jax.lax.broadcasted_iota(jnp.int32, (ni6, ni6), 1) // ts
    out[sII_idx] = jnp.where(tile_of < tile_of_c, sII.T, sII)
    out = tuple(out)
    if not emit_obs_rows:
        return (None,) + tuple(out)
    return out
