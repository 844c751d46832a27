"""Worker for the 2-process distributed-BA test (run via subprocess).

Each process owns 4 virtual CPU devices; jax.distributed stitches them into
one 8-device mesh (the CI stand-in for 2 TPU hosts over DCN — SURVEY §2.4).
The worker builds the same deterministic problem as the single-process
tests, feeds globally-sharded arrays through the camera-block-sparse CG LM
step, and prints the (replicated) camera-side output checksums.

Usage: python multihost_worker.py <coordinator_port> <process_id> <num_processes>
"""

import os
import sys

port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_distributed_ba import _prep, _zero_priors  # noqa: E402
from opensfm_tpu.parallel import make_sharded_cg_lm_step  # noqa: E402


def main() -> None:
    n_dev = len(jax.devices())
    assert n_dev == 4 * nproc, (n_dev, nproc)
    mesh = Mesh(np.array(jax.devices()), ("points",))

    problem, args, (ni, nr, nc, pmax) = _prep(
        n_dev, n_shots=8, dtype=jnp.float64
    )
    (inst, rigcam, cam, points, obs_uv, obs_inv_sd, obs_point, obs_inst,
     obs_rigcam, obs_cam, point_obs, gps_pos, gps_inv_sd, opt_inst,
     opt_cam, opt_points, lam, point_base) = args

    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P("points"))

    def globalize(x, sharding):
        """Build a global array from host-replicated data: each process
        donates the shards it owns."""
        x = np.asarray(x)

        def cb(index):
            return x[index]

        return jax.make_array_from_callback(x.shape, sharding, cb)

    step = make_sharded_cg_lm_step(
        mesh, "points", "perspective", pmax, ni, nc, cg_iters=200,
    )
    zp = _zero_priors(np.asarray(cam), np.asarray(points))
    zp_g = (
        globalize(np.asarray(zp[0]), rep), globalize(np.asarray(zp[1]), rep),
        globalize(np.asarray(zp[2]), rep), globalize(np.asarray(zp[3]), sh),
        globalize(np.asarray(zp[4]), sh), globalize(np.asarray(zp[5]), sh),
    )

    g_inst = globalize(inst, rep)
    g_cam = globalize(cam, rep)
    g_points = globalize(points, sh)

    # Multi-step descent: three LM steps crossing the process boundary
    # must monotonically reduce the true objective (asserted host-side by
    # the parent via the COST lines).
    for step_i in range(3):
        out = step(
            g_inst, g_cam, g_points,
            globalize(obs_uv, sh), globalize(obs_inv_sd, sh),
            globalize(obs_point, sh), globalize(obs_inst, sh),
            globalize(obs_cam, sh), globalize(gps_pos, rep),
            globalize(gps_inv_sd, rep), *zp_g,
            globalize(opt_inst, rep), globalize(opt_cam, rep),
            globalize(opt_points, sh),
            globalize(np.asarray(lam), rep), globalize(point_base, sh),
        )
        jax.block_until_ready(out)
        g_inst, g_cam, g_points = out
        from jax.experimental import multihost_utils

        g_points_host = np.asarray(
            multihost_utils.process_allgather(g_points, tiled=True)
        )
        from test_distributed_ba import _reproj_cost

        cost = _reproj_cost(
            problem, np.asarray(g_inst), np.asarray(g_cam), g_points_host
        )
        print(f"COST {step_i} {cost:.12e}", flush=True)

    new_inst = np.asarray(g_inst)  # replicated -> addressable everywhere
    new_cam = np.asarray(g_cam)
    assert np.all(np.isfinite(new_inst))
    print(f"CHECKSUM inst {float(np.abs(new_inst).sum()):.12e}", flush=True)
    print(f"CHECKSUM cam {float(np.abs(new_cam).sum()):.12e}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
