"""Distributed (mesh-sharded) bundle adjustment.

Covers the TPU-native replacement for the reference's submodel split/merge
distribution story (large/tools.py:278-328 — see SURVEY.md §2.4): points
and observations sharded over an 8-device mesh, the reduced camera system
psum-ed, cameras replicated.  Runs on the virtual 8-CPU-device mesh from
conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from __graft_entry__ import _make_problem  # noqa: E402
from opensfm_tpu.parallel import make_sharded_lm_step, shard_problem  # noqa: E402


def _prep(n_devices, n_shots=8, n_points=None, seed=0, dtype=jnp.float32):
    problem = _make_problem(
        n_shots=n_shots, n_points=n_points or 16 * n_devices, seed=seed
    )
    problem = shard_problem(problem, n_devices)
    ni, nr, nc, npts, O, T = problem.counts()
    pmax = problem.cam.shape[1]
    pts_per_shard = npts // n_devices
    point_base = (np.arange(npts) // pts_per_shard) * pts_per_shard
    args = (
        jnp.asarray(problem.inst, dtype=dtype),
        jnp.asarray(problem.rigcam, dtype=dtype),
        jnp.asarray(problem.cam, dtype=dtype),
        jnp.asarray(problem.points, dtype=dtype),
        jnp.asarray(problem.obs_uv, dtype=dtype),
        jnp.asarray(problem.obs_inv_sd, dtype=dtype),
        jnp.asarray(problem.obs_point, dtype=jnp.int32),
        jnp.asarray(problem.obs_inst, dtype=jnp.int32),
        jnp.asarray(problem.obs_rigcam, dtype=jnp.int32),
        jnp.asarray(problem.obs_cam, dtype=jnp.int32),
        jnp.asarray(problem.point_obs, dtype=jnp.int32),
        jnp.asarray(problem.gps_pos, dtype=dtype),
        jnp.asarray(problem.gps_inv_sd, dtype=dtype),
        jnp.asarray(problem.opt_inst, dtype=bool),
        jnp.asarray(problem.opt_cam, dtype=bool),
        jnp.asarray(problem.opt_points, dtype=bool),
        jnp.asarray(1e-4, dtype=dtype),
        jnp.asarray(point_base, dtype=jnp.int32),
    )
    return problem, args, (ni, nr, nc, pmax)


def _zero_priors(cam, points):
    """Disabled camera/point prior arrays for the CG step signature."""
    return (
        jnp.zeros_like(cam),                 # cam_prior
        jnp.zeros_like(cam),                 # cam_prior_inv_sd
        jnp.zeros(cam.shape, dtype=bool),    # cam_log_mask
        jnp.zeros_like(points),              # point_prior
        jnp.zeros_like(points),              # point_prior_inv_sd
        jnp.zeros(points.shape[0], dtype=points.dtype),  # point_prior_loss
    )


def _reproj_cost(problem, inst, cam, points):
    """Plain (unrobustified) whitened reprojection SSE, computed in numpy
    via the camera library — an independent oracle for 'the step helped'."""
    from opensfm_tpu.geometry import cameras as cam_lib
    from opensfm_tpu.geometry import rotation as rot

    w = problem.obs_inv_sd > 0
    ii = problem.obs_inst[w]
    ci = problem.obs_cam[w]
    pi = problem.obs_point[w]
    X = np.asarray(points)[pi]
    Xi = np.asarray(
        rot.rotate(jnp.asarray(np.asarray(inst)[ii, 0:3]), jnp.asarray(X))
    ) + np.asarray(inst)[ii, 3:6]
    pred = cam_lib.project(
        "perspective", Xi, np.asarray(cam)[ci], xp=np
    )
    r = (pred - problem.obs_uv[w]) * problem.obs_inv_sd[w][:, None]
    return float((r * r).sum())


def test_sharded_lm_step_reduces_cost():
    n_dev = 8
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("points",))
    problem, args, (ni, nr, nc, pmax) = _prep(n_dev)
    step = make_sharded_lm_step(mesh, "points", "perspective", pmax, ni, nr, nc)

    inst, rigcam, cam, points = args[0], args[1], args[2], args[3]
    c0 = _reproj_cost(problem, inst, cam, points)
    new_inst, new_cam, new_points = step(*args)
    jax.block_until_ready(new_inst)
    assert np.all(np.isfinite(np.asarray(new_inst)))
    assert np.all(np.isfinite(np.asarray(new_cam)))
    assert np.all(np.isfinite(np.asarray(new_points)))
    c1 = _reproj_cost(problem, new_inst, new_cam, new_points)
    assert c1 < c0, (c0, c1)

    # Second step from the new state keeps descending.
    args2 = (new_inst, args[1], new_cam, new_points) + args[4:]
    i2, cm2, p2 = step(*args2)
    c2 = _reproj_cost(problem, i2, cm2, p2)
    assert c2 < c1, (c1, c2)


def test_sharded_matches_single_device():
    """The 8-way sharded step equals the 1-way step (same math, psum of a
    partitioned sum): bitwise-near in f64."""
    devices = np.array(jax.devices())
    problem8, args8, (ni, nr, nc, pmax) = _prep(8, dtype=jnp.float64)
    step8 = make_sharded_lm_step(
        Mesh(devices[:8], ("points",)), "points", "perspective",
        pmax, ni, nr, nc,
    )
    out8 = step8(*args8)

    problem1, args1, _ = _prep(1, n_points=128, dtype=jnp.float64)
    step1 = make_sharded_lm_step(
        Mesh(devices[:1], ("points",)), "points", "perspective",
        pmax, ni, nr, nc,
    )
    out1 = step1(*args1)

    # Camera-side states are replicated and directly comparable; in f64 the
    # partitioned psum matches the single-shard sum to reduction-order noise.
    np.testing.assert_allclose(
        np.asarray(out8[0]), np.asarray(out1[0]), rtol=1e-8, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out8[1]), np.asarray(out1[1]), rtol=1e-8, atol=1e-9
    )


def test_dense_sharded_step_matches_single_device():
    """The dense instance-slot sharded step (per-shard fast assembly +
    psum of block families) must match the single-device dense LM step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from __graft_entry__ import _make_problem
    from opensfm_tpu.ba import lm
    from opensfm_tpu.parallel import (
        make_sharded_lm_step_dense,
        shard_problem_dense,
    )

    n_dev = 8
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("points",))

    base = _make_problem(n_shots=8, n_points=2048, seed=5)
    problem, per_shard = shard_problem_dense(base, n_dev)
    ni, nr, nc, npts, O, T = problem.counts()
    pmax = problem.cam.shape[1]
    dt = jnp.float32
    lam = jnp.asarray(1e-4, dt)

    st = tuple(
        jnp.asarray(getattr(problem, k), dt)
        for k in ("inst", "rigcam", "cam", "points")
    )
    ints = ("obs_point", "obs_inst", "obs_rigcam", "obs_cam", "point_obs")
    bools = ("cam_log_mask", "opt_inst", "opt_rigcam", "opt_cam",
             "opt_points")
    d = {}
    for name in (
        "obs_uv", "obs_inv_sd", "obs_point", "obs_inst", "obs_rigcam",
        "obs_cam", "point_obs", "gps_pos", "gps_inv_sd", "cam_prior",
        "cam_prior_inv_sd", "cam_log_mask", "rigcam_prior",
        "rigcam_prior_inv_sd", "point_prior", "point_prior_inv_sd",
        "opt_inst", "opt_rigcam", "opt_cam", "opt_points",
    ):
        arr = getattr(problem, name)
        d[name] = jnp.asarray(
            arr, jnp.int32 if name in ints else bool if name in bools else dt
        )

    # Single-device dense step (no priors beyond GPS/cam defaults).
    ref = lm._lm_step(
        st, d, lam, ptype="perspective", loss="SoftLOneLoss",
        loss_threshold=1.0, pmax=pmax, ni=ni, nr=nr, nc=nc,
        canonical=True, rig_transform=False, rig_jac=False, dense=True,
    )

    step = make_sharded_lm_step_dense(mesh, "points", ni, nr, nc, pmax)
    new_inst, new_cam, new_points = step(
        st[0], st[1], st[2], st[3],
        d["obs_uv"], d["obs_inv_sd"],
        d["point_prior"], d["point_prior_inv_sd"], d["opt_points"],
        d["gps_pos"], d["gps_inv_sd"], d["cam_prior"],
        d["cam_prior_inv_sd"], d["cam_log_mask"], d["rigcam_prior"],
        d["rigcam_prior_inv_sd"], d["opt_inst"], d["opt_rigcam"],
        d["opt_cam"], lam,
    )
    for name, a, b in (
        ("inst", new_inst, ref[0]),
        ("cam", new_cam, ref[2]),
        ("points", new_points, ref[3]),
    ):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 5e-4, (name, rel)


def test_cg_sharded_step_matches_dense_solve():
    """The camera-block-sparse CG step (matrix-free Schur matvec, [NI,6]
    psum per iteration) must reproduce the replicated-dense solve."""
    from opensfm_tpu.parallel import make_sharded_cg_lm_step

    devices = np.array(jax.devices())
    mesh = Mesh(devices[:8], ("points",))
    problem, args, (ni, nr, nc, pmax) = _prep(8, dtype=jnp.float64)

    step_dense = make_sharded_lm_step(
        mesh, "points", "perspective", pmax, ni, nr, nc
    )
    out_d = step_dense(*args)

    step_cg = make_sharded_cg_lm_step(
        mesh, "points", "perspective", pmax, ni, nc,
        cg_iters=400, cg_tol=1e-12,
    )
    (inst, rigcam, cam, points, obs_uv, obs_inv_sd, obs_point, obs_inst,
     obs_rigcam, obs_cam, point_obs, gps_pos, gps_inv_sd, opt_inst,
     opt_cam, opt_points, lam, point_base) = args
    # Zero priors: the reference dense step above carries no camera/point
    # prior rows, so parity needs them disabled.
    zp = _zero_priors(cam, points)
    out_cg = step_cg(
        inst, cam, points, obs_uv, obs_inv_sd, obs_point, obs_inst,
        obs_cam, gps_pos, gps_inv_sd, *zp, opt_inst, opt_cam, opt_points,
        lam, point_base,
    )

    np.testing.assert_allclose(
        np.asarray(out_cg[0]), np.asarray(out_d[0]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_cg[1]), np.asarray(out_d[1]), rtol=1e-5, atol=1e-6
    )
    # Points: sharded outputs, same layout in both paths.
    np.testing.assert_allclose(
        np.asarray(out_cg[2]), np.asarray(out_d[2]), rtol=1e-4, atol=1e-6
    )


def test_cg_sharded_step_reduces_cost():
    """Repeated CG-LM steps descend on the true objective."""
    from opensfm_tpu.parallel import make_sharded_cg_lm_step

    n_dev = 8
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("points",))
    problem, args, (ni, nr, nc, pmax) = _prep(n_dev, n_shots=12)
    step = make_sharded_cg_lm_step(
        mesh, "points", "perspective", pmax, ni, nc, cg_iters=100,
    )
    (inst, rigcam, cam, points, obs_uv, obs_inv_sd, obs_point, obs_inst,
     obs_rigcam, obs_cam, point_obs, gps_pos, gps_inv_sd, opt_inst,
     opt_cam, opt_points, lam, point_base) = args
    zp = _zero_priors(cam, points)

    c_prev = _reproj_cost(problem, inst, cam, points)
    for _ in range(3):
        inst, cam, points = step(
            inst, cam, points, obs_uv, obs_inv_sd, obs_point, obs_inst,
            obs_cam, gps_pos, gps_inv_sd, *zp, opt_inst, opt_cam, opt_points,
            lam, point_base,
        )
        c = _reproj_cost(problem, inst, cam, points)
        assert np.isfinite(c)
        assert c < c_prev, (c_prev, c)
        c_prev = c
