"""Profile the components of one LM step on the real device (dev tool)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from __graft_entry__ import _make_problem
from opensfm_tpu.ba import lm

import os
n_shots = int(os.environ.get("PROF_SHOTS", 64))
n_points = int(os.environ.get("PROF_POINTS", 8192))
problem, dense = lm.canonicalize_problem_dense(
    _make_problem(n_shots=n_shots, n_points=n_points, seed=0))
ni, nr, nc, npts, O, T = problem.counts()
pmax = problem.cam.shape[1]
dtype = jnp.float32
state = tuple(jnp.asarray(getattr(problem, n), dtype=dtype)
              for n in ("inst", "rigcam", "cam", "points"))
ints = ("obs_point", "obs_inst", "obs_rigcam", "obs_cam", "point_obs")
bools = ("cam_log_mask", "opt_inst", "opt_rigcam", "opt_cam", "opt_points")
data = {}
for name in ("obs_uv", "obs_inv_sd", "obs_point", "obs_inst", "obs_rigcam",
             "obs_cam", "point_obs", "gps_pos", "gps_inv_sd", "cam_prior",
             "cam_prior_inv_sd", "cam_log_mask", "rigcam_prior",
             "rigcam_prior_inv_sd", "point_prior", "point_prior_inv_sd",
             "opt_inst", "opt_rigcam", "opt_cam", "opt_points"):
    arr = getattr(problem, name)
    data[name] = jnp.asarray(arr, dtype=jnp.int32 if name in ints
                             else bool if name in bools else dtype)
lam = jnp.asarray(1e-4, dtype=dtype)
statics = dict(ptype="perspective", loss="SoftLOneLoss", loss_threshold=1.0,
               pmax=pmax)
kw = dict(canonical=True, rig_transform=False, rig_jac=False, dense=True)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timeit(name, fn, iters=20):
    out = fn()
    sync(out)
    # steady state
    t0 = time.time()
    for _ in range(3):
        out = fn()
        sync(out)
    dt = (time.time() - t0) / 3
    print(f"{name:30s} {dt/iters*1e3:8.3f} ms/iter   ({dt*1e3:.1f} ms total/{iters})")
    return out


N = 20

# 1. full LM step chained
@partial(jax.jit, static_argnames=tuple(statics) + ("ni", "nr", "nc"))
def full_steps(state, data, lam, ptype, loss, loss_threshold, pmax, ni, nr, nc):
    def body(_, st):
        return lm._lm_step(st, data, lam, ptype=ptype, loss=loss,
                           loss_threshold=loss_threshold, pmax=pmax,
                           ni=ni, nr=nr, nc=nc, **kw)
    return jax.lax.fori_loop(0, N, body, state)

timeit("full _lm_step", lambda: full_steps(state, data, lam, ni=ni, nr=nr, nc=nc, **statics), N)


# 2. assembly only (build reduced system, chained via state-dependent dummy)
@partial(jax.jit, static_argnames=tuple(statics) + ("ni", "nr", "nc"))
def assembly_only(state, data, lam, ptype, loss, loss_threshold, pmax, ni, nr, nc):
    def body(_, st):
        S, b, back = lm._build_reduced_system(
            st, data, lam, ptype, loss, loss_threshold, pmax, ni, nr, nc,
            False, **kw)
        inst, rigcam, cam, points = st
        # tiny state perturbation dependent on outputs to prevent CSE/hoist
        eps = (b[0] + jnp.sum(back["bp"][0])) * 1e-30
        return (inst + eps, rigcam, cam, points)
    return jax.lax.fori_loop(0, N, body, state)

timeit("assembly only", lambda: assembly_only(state, data, lam, ni=ni, nr=nr, nc=nc, **statics), N)


# 3. assembly + cholesky solve (no back-substitution)
@partial(jax.jit, static_argnames=tuple(statics) + ("ni", "nr", "nc"))
def asm_chol(state, data, lam, ptype, loss, loss_threshold, pmax, ni, nr, nc):
    def body(_, st):
        S, b, back = lm._build_reduced_system(
            st, data, lam, ptype, loss, loss_threshold, pmax, ni, nr, nc,
            False, **kw)
        L = jax.lax.linalg.cholesky(S)
        y = jax.lax.linalg.triangular_solve(L, b[:, None], left_side=True, lower=True)
        dx = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True, transpose_a=True)[:, 0]
        inst, rigcam, cam, points = st
        eps = (dx[0] + jnp.sum(back["bp"][0])) * 1e-30
        return (inst + eps, rigcam, cam, points)
    return jax.lax.fori_loop(0, N, body, state)

timeit("assembly + cholesky", lambda: asm_chol(state, data, lam, ni=ni, nr=nr, nc=nc, **statics), N)


# 4. total cost only
@partial(jax.jit, static_argnames=tuple(statics))
def cost_only(state, data, lam, ptype, loss, loss_threshold, pmax):
    def body(_, st):
        c = lm._total_cost(st, data, ptype=ptype, loss=loss,
                           loss_threshold=loss_threshold, pmax=pmax,
                           rig_transform=False, rig_jac=False,
                           canonical=True, dense=True)
        inst, rigcam, cam, points = st
        return (inst + c * 1e-30, rigcam, cam, points)
    return jax.lax.fori_loop(0, N, body, state)

timeit("_total_cost only", lambda: cost_only(state, data, lam, **statics), N)

# 5. raw fused kernel only
from opensfm_tpu.ops.pallas_kernels.ba_assemble import fused_schur_assembly

@jax.jit
def kernel_only(state, data, lam):
    def body(_, st):
        inst, rigcam, cam, points = st
        out_obs, out_pt, sII, aux = fused_schur_assembly(
            inst, cam, points, data["obs_uv"], data["obs_inv_sd"],
            data["opt_inst"], data["opt_cam"], data["opt_points"],
            data["point_prior"], data["point_prior_inv_sd"], lam,
            loss="SoftLOneLoss", loss_threshold=1.0, ni=ni)
        eps = (jnp.sum(out_pt[0]) + sII[0, 0]) * 1e-30
        return (inst + eps, rigcam, cam, points)
    return jax.lax.fori_loop(0, N, body, state)

timeit("fused kernel only", lambda: kernel_only(state, data, lam), N)


# 6. matmul roofline anchors: the ideal S_II contraction as one big matmul.
K = npts * 3
A32 = jnp.ones((6 * ni, K), jnp.float32)
B32 = jnp.ones((K, 6 * ni), jnp.float32)
A16 = A32.astype(jnp.bfloat16)
B16 = B32.astype(jnp.bfloat16)


@jax.jit
def mm_f32(a, b):
    def body(_, acc):
        return acc + jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0, 0]
    return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))


@jax.jit
def mm_bf16(a, b):
    def body(_, acc):
        return acc + jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0, 0]
    return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))


flops = 2.0 * (6 * ni) * (6 * ni) * K
out = timeit("anchor matmul f32", lambda: mm_f32(A32, B32), N)
out = timeit("anchor matmul bf16", lambda: mm_bf16(A16, B16), N)
print(f"anchor matmul FLOPs/iter: {flops/1e12:.3f} TF")
