"""Isolate cost centers inside the fused assembly kernel (dev tool)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from __graft_entry__ import _make_problem
from opensfm_tpu.ba import lm
from opensfm_tpu.ops.pallas_kernels.ba_resjac import _chain
from opensfm_tpu.ops.pallas_kernels import ba_assemble as A

problem, dense = lm.canonicalize_problem_dense(
    _make_problem(n_shots=64, n_points=8192, seed=0))
ni, nr, nc, npts, O, T = problem.counts()
dtype = jnp.float32
NP = problem.points.shape[0]
PB = A.PB
n_blocks = NP // PB
_Z = np.int32(0)

u = jnp.asarray(problem.obs_uv[:, 0].reshape(NP, ni), dtype)
v = jnp.asarray(problem.obs_uv[:, 1].reshape(NP, ni), dtype)
isd = jnp.asarray(problem.obs_inv_sd.reshape(NP, ni), dtype)
xr = [jnp.broadcast_to(jnp.asarray(problem.points[:, j:j+1], dtype), (NP, ni))
      for j in range(3)]
inst_t = jnp.concatenate([jnp.asarray(problem.inst[:, :6].T, dtype),
                          jnp.ones((1, ni), dtype), jnp.zeros((1, ni), dtype)], 0)
cam_row = jnp.concatenate([jnp.asarray(problem.cam[0, :3], dtype),
                           jnp.asarray([1e-4, 1, 1, 1, 0], dtype)])[None]

ni6 = ni * 6


def make_variant(mode):
    """mode: 'full', 'nopush' (skip 12 jacobian pushes, reuse forward vals),
    'nomatmul' (pushes but no Schur matmuls), 'noout' (no out_obs writes),
    'fwdonly' (forward chain only)."""
    def kernel(u_ref, v_ref, isd_ref, xr0_ref, xr1_ref, xr2_ref,
               inst_ref, cam_ref,
               out_obs_ref, out_sII_ref, sII_acc, cat_a, cat_g):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            sII_acc[:] = jnp.zeros_like(sII_acc)

        one_row = inst_ref[0:1, :] * 0.0 + 1.0
        vals = (inst_ref[0:1, :], inst_ref[1:2, :], inst_ref[2:3, :],
                inst_ref[3:4, :], inst_ref[4:5, :], inst_ref[5:6, :],
                cam_ref[0, 0] * one_row, cam_ref[0, 1] * one_row,
                cam_ref[0, 2] * one_row,
                xr0_ref[:], xr1_ref[:], xr2_ref[:])
        if mode == 'fwdonly':
            p0, p1 = _chain(vals)
            out_obs_ref[0] = (p0 - u_ref[:]) * isd_ref[:]
            out_obs_ref[1] = (p1 - v_ref[:]) * isd_ref[:]
            for j in range(2, 32):
                out_obs_ref[j] = p0 * 0.0

            @pl.when(step == n_blocks - 1)
            def _():
                out_sII_ref[:] = sII_acc[:]
            return

        (p0, p1), lin = jax.linearize(_chain, vals)
        e0 = (p0 - u_ref[:]) * isd_ref[:]
        e1 = (p1 - v_ref[:]) * isd_ref[:]
        out_obs_ref[0] = e0
        out_obs_ref[1] = e1

        J0, J1 = [], []
        if mode == 'nopush':
            for j in range(12):
                J0.append(p0 * (0.1 + j))
                J1.append(p1 * (0.1 + j))
        else:
            for jdir in range(12):
                tang = tuple(jnp.ones_like(vals[i]) if i == jdir
                             else jnp.zeros_like(vals[i]) for i in range(12))
                d0, d1 = lin(tang)
                J0.append(d0)
                J1.append(d1)
        if mode != 'noout':
            for j in range(12):
                out_obs_ref[2 + j] = J0[j]
                out_obs_ref[14 + j] = J1[j]
            for j in range(26, 32):
                out_obs_ref[j] = e0 * 0.0
        else:
            for j in range(2, 32):
                out_obs_ref[j] = out_obs_ref[j]  # leave garbage

        if mode != 'nomatmul':
            for k in range(3):
                for x in range(6):
                    cat_a[:, x * ni:(x + 1) * ni] = J0[x] * J0[9 + k]
                    cat_g[:, x * ni:(x + 1) * ni] = J1[x] * J1[9 + k]
                sII_acc[:] = sII_acc[:] + jax.lax.dot_general(
                    cat_a[:], cat_g[:],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(step == n_blocks - 1)
        def _():
            out_sII_ref[:] = sII_acc[:]

    obs_spec = pl.BlockSpec((PB, ni), lambda i: (i, _Z), memory_space=pltpu.VMEM)
    rep_spec = pl.BlockSpec((8, ni), lambda i: (_Z, _Z), memory_space=pltpu.VMEM)
    cam_spec = pl.BlockSpec((1, 8), lambda i: (_Z, _Z), memory_space=pltpu.SMEM)

    def run_once(u, v, isd, x0, x1, x2, inst_t, cam_row):
        return pl.pallas_call(
            kernel, grid=(n_blocks,),
            in_specs=[obs_spec] * 6 + [rep_spec, cam_spec],
            out_specs=[
                pl.BlockSpec((32, PB, ni), lambda i: (_Z, i, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ni6, ni6), lambda i: (_Z, _Z),
                             memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((32, NP, ni), dtype),
                       jax.ShapeDtypeStruct((ni6, ni6), dtype)],
            scratch_shapes=[pltpu.VMEM((ni6, ni6), dtype),
                            pltpu.VMEM((PB, ni6), dtype),
                            pltpu.VMEM((PB, ni6), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(u, v, isd, x0, x1, x2, inst_t, cam_row)

    N = 20

    @jax.jit
    def run(u, v, isd, x0, x1, x2, inst_t, cam_row):
        def body(_, carry):
            it = carry
            out_obs, sII = run_once(u, v, isd, x0, x1, x2, it, cam_row)
            eps = (sII[0, 0] + out_obs[0, 0, 0]) * 1e-30
            return it + eps
        return jax.lax.fori_loop(0, N, body, inst_t)
    return run, N


def timeit(name, fn, iters):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(3):
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / 3
    print(f"{name:14s} {dt/iters*1e3:8.3f} ms/call")


args = (u, v, isd, xr[0], xr[1], xr[2], inst_t, cam_row)
import sys
for mode in sys.argv[1:]:
    run, N = make_variant(mode)
    timeit(mode, lambda: run(*args), N)
