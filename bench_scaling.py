"""Multi-device scaling measurement (invoked by bench.py in a subprocess).

Runs the dense sharded LM step on a virtual CPU mesh at 1 and N devices
over the SAME global problem (strong scaling).  On the single-host CI/bench
machine the virtual devices share physical cores, so the printed efficiency
is a lower bound for real multi-chip ICI scaling (where each device has its
own compute); it mainly validates that the sharded program and collectives
hold up at size.  Prints one JSON line.
"""

import json
import os
import sys
import time

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __graft_entry__ import _make_problem
from opensfm_tpu.parallel import make_sharded_lm_step_dense, shard_problem_dense


def measure(n_devices: int, reps: int = 5) -> float:
    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, ("points",))
    problem, _ = shard_problem_dense(
        _make_problem(n_shots=32, n_points=4096), n_devices
    )
    ni, nr, nc, npts, O, T = problem.counts()
    pmax = problem.cam.shape[1]
    dt = jnp.float32
    step = make_sharded_lm_step_dense(mesh, "points", ni, nr, nc, pmax)
    args = (
        jnp.asarray(problem.inst, dt), jnp.asarray(problem.rigcam, dt),
        jnp.asarray(problem.cam, dt), jnp.asarray(problem.points, dt),
        jnp.asarray(problem.obs_uv, dt), jnp.asarray(problem.obs_inv_sd, dt),
        jnp.asarray(problem.point_prior, dt),
        jnp.asarray(problem.point_prior_inv_sd, dt),
        jnp.asarray(problem.opt_points, bool),
        jnp.asarray(problem.gps_pos, dt), jnp.asarray(problem.gps_inv_sd, dt),
        jnp.asarray(problem.cam_prior, dt),
        jnp.asarray(problem.cam_prior_inv_sd, dt),
        jnp.asarray(problem.cam_log_mask, bool),
        jnp.asarray(problem.rigcam_prior, dt),
        jnp.asarray(problem.rigcam_prior_inv_sd, dt),
        jnp.asarray(problem.opt_inst, bool),
        jnp.asarray(problem.opt_rigcam, bool),
        jnp.asarray(problem.opt_cam, bool),
        jnp.asarray(1e-4, dt),
    )
    out = step(*args)
    jax.block_until_ready(out)  # warmup/compile
    t0 = time.time()
    for _ in range(reps):
        out = step(*args)
    jax.block_until_ready(out)
    return reps / (time.time() - t0)


def main() -> None:
    r1 = measure(1)
    rN = measure(N_DEV)
    print(
        json.dumps(
            {
                "metric": "cpu_mesh_strong_scaling",
                "devices": N_DEV,
                "iter_per_s_1dev": round(r1, 3),
                f"iter_per_s_{N_DEV}dev": round(rN, 3),
                "efficiency": round(rN / (r1 * N_DEV), 4),
                "speedup": round(rN / r1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
