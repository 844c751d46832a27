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


if __name__ == "__main__":
    main()
