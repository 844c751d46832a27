"""2-process distributed BA: the CI stand-in for the 2-host story.

Launches two OS processes, each owning 4 virtual CPU devices, joined by
`jax.distributed.initialize` into one 8-device mesh; the camera-block-
sparse CG LM step runs with its psums crossing the process boundary (the
DCN path on a real pod).  Both processes' replicated outputs must agree
with each other AND with the same problem run single-process on 8 local
devices (SURVEY §2.4: jax.distributed + ICI/DCN collectives replacing the
reference's file-based submodel merge, large/tools.py:278-328).
"""

import os
import pathlib
import re
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_checksums():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from test_distributed_ba import _prep, _zero_priors
    from opensfm_tpu.parallel import make_sharded_cg_lm_step

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("points",))
    problem, args, (ni, nr, nc, pmax) = _prep(8, n_shots=8, dtype=jnp.float64)
    (inst, rigcam, cam, points, obs_uv, obs_inv_sd, obs_point, obs_inst,
     obs_rigcam, obs_cam, point_obs, gps_pos, gps_inv_sd, opt_inst,
     opt_cam, opt_points, lam, point_base) = args
    step = make_sharded_cg_lm_step(
        mesh, "points", "perspective", pmax, ni, nc, cg_iters=200,
    )
    zp = _zero_priors(cam, points)
    # Same three fixed-lambda steps as the worker.
    for _ in range(3):
        inst, cam, points = step(
            inst, cam, points, obs_uv, obs_inv_sd, obs_point, obs_inst,
            obs_cam, gps_pos, gps_inv_sd, *zp, opt_inst, opt_cam,
            opt_points, lam, point_base,
        )
    return (
        float(np.abs(np.asarray(inst)).sum()),
        float(np.abs(np.asarray(cam)).sum()),
    )


def test_two_process_distributed_ba():
    worker = pathlib.Path(__file__).resolve().parent / "multihost_worker.py"
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    def parse(out):
        found = dict(re.findall(r"CHECKSUM (\w+) ([0-9.e+-]+)", out))
        assert "inst" in found and "cam" in found, out
        return float(found["inst"]), float(found["cam"])

    c0 = parse(outs[0])
    c1 = parse(outs[1])
    # Replicated outputs identical across the two processes.
    np.testing.assert_allclose(c0, c1, rtol=1e-12)

    # Multi-step descent across the process boundary: three LM steps must
    # monotonically reduce the true objective (not just produce matching
    # checksums).
    costs = [float(c) for _, c in re.findall(r"COST (\d+) ([0-9.e+-]+)",
                                             outs[0])]
    assert len(costs) == 3, outs[0]
    assert costs[1] < costs[0] and costs[2] < costs[1], costs

    # And equal to the same steps run single-process over 8 local devices
    # (partitioned psum == single-host sum up to reduction-order noise).
    ref = _single_process_checksums()
    np.testing.assert_allclose(c0, ref, rtol=1e-8)
