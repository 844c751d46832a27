"""Extra-large BA lane past the dense ceiling (VERDICT r3 item 2).

2,048 shots / 262,144 points / 10.49M observations — 8x past the fused
dense path's `ni <= 256` cap (ba/lm.py) and the scale the reference's
submodel pipeline targets (large/metadataset.py) — solved as ONE
camera-block-sparse CG bundle on the 8-device CPU mesh through the product
solver (`bundle_adjust_sharded`, the `bundle_distributed` route; the
pipeline-entry wiring itself is e2e-tested in
tests/test_distributed_scale.py).

Records convergence (cost trajectory), time per LM trial, and peak host
RSS.  Prints one JSON line.
"""

import json
import os
import resource
import sys
import time

N_DEV = 8
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __graft_entry__ import _make_problem
from opensfm_tpu.parallel import bundle_adjust_sharded

N_SHOTS = 2048
N_POINTS = 262144
TRACK_LEN = 40  # mean track length -> 10.49M observations
MAX_ITERS = 3
CG_ITERS = 20


def main() -> None:
    t0 = time.time()
    problem = _make_problem(
        n_shots=N_SHOTS, n_points=N_POINTS, seed=0, track_window=TRACK_LEN
    )
    build_s = time.time() - t0
    n_obs = int(np.sum(np.asarray(problem.obs_inv_sd) > 0))

    t0 = time.time()
    result = bundle_adjust_sharded(
        problem, max_iterations=MAX_ITERS, cg_iters=CG_ITERS,
    )
    solve_s = time.time() - t0
    trials = max(result.iterations, 1)

    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps({
        "metric": "scale_xl_cg",
        "devices": N_DEV,
        "shots": N_SHOTS,
        "points": N_POINTS,
        "obs": n_obs,
        "cg_iters": CG_ITERS,
        "accepted_iterations": int(result.iterations),
        "initial_cost": float(result.initial_cost),
        "final_cost": float(result.final_cost),
        "converged": bool(
            np.isfinite(result.final_cost)
            and result.final_cost < result.initial_cost
        ),
        "build_seconds": round(build_s, 1),
        "solve_seconds": round(solve_s, 1),
        "seconds_per_lm_trial": round(solve_s / trials, 1),
        "peak_host_rss_gb": round(peak_rss_gb, 2),
    }))


if __name__ == "__main__":
    main()
