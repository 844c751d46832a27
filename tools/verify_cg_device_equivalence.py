"""Verify the TPU CG step (one-hot selectors + windowed point reductions)
against the CPU gather/scatter fallback on the same problem, then time the
product CG lane.

The one-hot and window fast paths are statically gated to TPU meshes, so
CPU-only CI never executes them; this tool drives them on the real chip
and asserts equivalence with the CPU step (<2e-3 relative at f32 over 25
CG iterations).  Run on a host with both a TPU and CPU jax backend:

    python tools/verify_cg_device_equivalence.py
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from __graft_entry__ import _make_problem
from opensfm_tpu.parallel import (
    make_sharded_cg_lm_step, make_sharded_cost, shard_problem,
)
from opensfm_tpu.parallel.distributed_ba import (
    _cg_args, _cg_cost_names, _cg_step_names,
)


def main() -> None:
    problem = _make_problem(n_shots=64, n_points=4096, seed=0,
                            track_window=8)
    sharded = shard_problem(problem, 1)
    ni, nr, nc, npts, O, T = sharded.counts()
    pmax = sharded.cam.shape[1]
    a = _cg_args(sharded, 1, jnp.float32)
    a["lam"] = jnp.asarray(1e-4, jnp.float32)
    win = int(getattr(sharded, "cg_window", 0) or 0)
    names = _cg_step_names("none", False, False, False, win=win > 0)

    outs = {}
    for platform in ("tpu", "cpu"):
        mesh = Mesh(np.array(jax.devices(platform)[:1]), ("points",))
        step = make_sharded_cg_lm_step(
            mesh, "points", "perspective", pmax, ni, nc,
            cg_iters=25, cg_tol=0.0, win=win,
        )
        outs[platform] = [
            np.asarray(x) for x in step(*(a[k] for k in names))
        ]
    for t_, c_ in zip(outs["tpu"], outs["cpu"]):
        rel = np.abs(t_ - c_).max() / (np.abs(c_).max() + 1e-12)
        print(f"max rel diff vs CPU: {rel:.2e}")
        assert rel < 2e-3, rel
    print("TPU fast-path CG step matches the CPU fallback")

    # Product-lane timing (256 cams / 32k points / 262k obs, 30 CG iters).
    mesh = Mesh(np.array(jax.devices("tpu")[:1]), ("points",))
    prob2 = _make_problem(n_shots=256, n_points=32768, seed=0,
                          track_window=8)
    sh2 = shard_problem(prob2, 1)
    ni2, nr2, nc2, npts2, O2, T2 = sh2.counts()
    a2 = _cg_args(sh2, 1, jnp.float32)
    a2["lam"] = jnp.asarray(1e-4, jnp.float32)
    win2 = int(getattr(sh2, "cg_window", 0) or 0)
    names2 = _cg_step_names("none", False, False, False, win=win2 > 0)
    cnames = _cg_cost_names("none", False, False, False)
    step2 = make_sharded_cg_lm_step(
        mesh, "points", "perspective", sh2.cam.shape[1], ni2, nc2,
        cg_iters=30, cg_tol=0.0, win=win2,
    )
    cost2 = make_sharded_cost(
        mesh, "points", "perspective", sh2.cam.shape[1], ni2, nc2,
    )
    out = step2(*(a2[k] for k in names2))
    jax.block_until_ready(out)
    t0 = time.time()
    n_tr = 6
    for _ in range(n_tr):
        out = step2(*(a2[k] for k in names2))
        state = dict(zip(("inst", "cam", "points"), out))
        float(cost2(*(dict(a2, **state)[k] for k in cnames)))
    print(f"CG trials/s (256c/32k lane): {n_tr / (time.time() - t0):.2f}")

    verify_dense_grid()
    verify_dense_grid(with_up=True)


_DENSE_SNIPPET = """
import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from __graft_entry__ import _make_problem
from opensfm_tpu.parallel.distributed_ba import (
    _DENSE_BLOCK_NAMES, _dense_block_args, _dense_grid_normalize,
    make_sharded_lm_block_dense, shard_problem_dense,
)
problem = _make_problem(n_shots=64, n_points=4096, seed=0, track_window=8)
if {with_up!r}:
    ni0 = len(problem.inst)
    problem.up_inst = np.arange(ni0, dtype=np.int64)
    problem.up_rigcam = np.zeros(ni0, dtype=np.int64)
    problem.up_vec = np.tile([0.0, -1.0, 0.0], (ni0, 1))
    problem.up_inv_sd = np.full(ni0, 1e3)
dproblem, _ = shard_problem_dense(_dense_grid_normalize(problem), 1,
                                  max_waste=1 << 30)
ni, nr, nc = len(dproblem.inst), len(dproblem.rigcam), len(dproblem.cam)
pmax = dproblem.cam.shape[1]
a = _dense_block_args(dproblem, jnp.float32)
mesh = Mesh(np.array(jax.devices()[:1]), ("points",))
block = make_sharded_lm_block_dense(mesh, "points", ni, nr, nc, pmax,
                                    block_size=1, tol=0.0)
out = block(jnp.asarray(1e9, jnp.float32), jnp.asarray(1e-4, jnp.float32),
            jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
            *(a[k] for k in _DENSE_BLOCK_NAMES))
np.savez({out_path!r}, **{{n: np.asarray(x) for n, x in
                          zip(("inst", "cam", "points", "stats"), out)}})
"""


def verify_dense_grid(with_up: bool = False) -> None:
    """TPU-vs-CPU equivalence for the dense-grid block solver (round 5):
    on TPU the step/cost run the fused Pallas assembly + cost kernels, on
    CPU the generic XLA lowering — one damping trial (step + cost +
    accept) on a sparse mono problem must agree (<2e-3 relative at f32;
    multi-trial blocks can legitimately diverge in accept/reject
    DECISIONS when a marginal trial meets f32 reduction-order cost
    noise, so the single-trial form is the kernel check).  The fused-path gate
    in lm is process-global (`jax.default_backend()`), so the CPU
    reference runs in a subprocess."""
    import subprocess
    import tempfile

    from opensfm_tpu.parallel.distributed_ba import (
        _DENSE_BLOCK_NAMES,
        _dense_block_args,
        _dense_grid_normalize,
        make_sharded_lm_block_dense,
        shard_problem_dense,
    )

    problem = _make_problem(n_shots=64, n_points=4096, seed=0,
                            track_window=8)
    if with_up:
        # Orientation-prior rows (round 5): the replicated _assemble_S
        # epilogue + cost tail must agree between the fused-Pallas chip
        # path and the CPU lowering too.
        ni0 = len(problem.inst)
        problem.up_inst = np.arange(ni0, dtype=np.int64)
        problem.up_rigcam = np.zeros(ni0, dtype=np.int64)
        problem.up_vec = np.tile([0.0, -1.0, 0.0], (ni0, 1))
        problem.up_inv_sd = np.full(ni0, 1e3)
    norm = _dense_grid_normalize(problem)
    assert norm is not None
    dproblem, _ = shard_problem_dense(norm, 1, max_waste=1 << 30)
    ni, nr, nc = (len(dproblem.inst), len(dproblem.rigcam),
                  len(dproblem.cam))
    pmax = dproblem.cam.shape[1]
    a = _dense_block_args(dproblem, jnp.float32)

    mesh = Mesh(np.array(jax.devices("tpu")[:1]), ("points",))
    block = make_sharded_lm_block_dense(mesh, "points", ni, nr, nc,
                                        pmax, block_size=1, tol=0.0)
    tpu_out = [np.asarray(x) for x in block(
        jnp.asarray(1e9, jnp.float32), jnp.asarray(1e-4, jnp.float32),
        jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
        *(a[k] for k in _DENSE_BLOCK_NAMES),
    )]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        out_path = os.path.join(td, "cpu_ref.npz")
        subprocess.run(
            [sys.executable, "-c",
             _DENSE_SNIPPET.format(root=root, out_path=out_path,
                                   with_up=with_up)],
            check=True, timeout=900,
        )
        cpu = np.load(out_path)
        for name, t_ in zip(("inst", "cam", "points"), tpu_out[:3]):
            c_ = cpu[name]
            rel = np.abs(t_ - c_).max() / (np.abs(c_).max() + 1e-12)
            print(f"dense-grid {name}: max rel diff vs CPU {rel:.2e}")
            # points run through back-substitution's recomputed Jacobian
            # chain, where Pallas-vs-XLA f32 reduction order lands at
            # ~2e-3 worst-case (measured 1.98e-3 on the plain variant);
            # the camera-side solves agree an order tighter.
            assert rel < (4e-3 if name == "points" else 2e-3), (name, rel)
        # stats: the damping DECISIONS (lam, rejects, accepted, trials,
        # converged) must match exactly; the cost scalar is an f32
        # reduction over 262k slots whose order differs between the
        # Pallas kernel and the XLA lowering — tolerance scales with that.
        t_s, c_s = tpu_out[3], cpu["stats"]
        assert np.array_equal(t_s[1:], c_s[1:]), (t_s, c_s)
        cost_rel = abs(t_s[0] - c_s[0]) / (abs(c_s[0]) + 1e-12)
        print(f"dense-grid cost: rel diff vs CPU {cost_rel:.2e}")
        assert cost_rel < 1e-2, (t_s[0], c_s[0])
    print("TPU dense-grid block (fused Pallas) matches the CPU lowering")


if __name__ == "__main__":
    main()
