"""Pipeline-level distributed BA (VERDICT r2 item 2).

The camera-block-sparse CG solver must be reachable from the actual
product path: `ba/problem.bundle` routes full-map bundles through
`bundle_adjust_sharded` over the 8-device virtual mesh when
`bundle_distributed` says so, and the full incremental reconstruction
meets the reference's STRICT accuracy bounds
(test_reconstruction_incremental.py:37-39) with every global bundle
running distributed.
"""

import numpy as np
import pytest

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from __graft_entry__ import _make_problem  # noqa: E402


def test_bundle_adjust_sharded_converges_like_single_device():
    """The damping loop around the sharded CG step reaches the same cost
    basin as the single-device LM on the same problem."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded

    problem = _make_problem(n_shots=12, n_points=256, seed=1)
    res_d = bundle_adjust(problem, max_iterations=20)
    res_s = bundle_adjust_sharded(problem, max_iterations=20)

    assert np.all(np.isfinite(res_s.inst))
    assert np.all(np.isfinite(res_s.points))
    assert res_s.final_cost < res_s.initial_cost
    assert res_s.iterations > 0
    # Same basin: the sharded final cost is within 10% of the dense LM's
    # (different damping trajectories, same objective).
    assert res_s.final_cost <= res_d.final_cost * 1.10 + 1e-9, (
        res_s.final_cost, res_d.final_cost,
    )
    # Points writeback shape matches the input problem (padding stripped).
    assert res_s.points.shape == problem.points.shape


def test_bundle_adjust_sharded_rejects_incompatible():
    from opensfm_tpu.parallel import bundle_adjust_sharded, check_cg_compatible

    # Round 4: rigs / up rows / depth priors are all IN-path; round 5:
    # pose-graph families route to the assembled-Schur solver, so only
    # solver="cg" still rejects them (and empty problems always raise).
    problem = _make_problem(n_shots=8, n_points=128, seed=2)
    problem.rigcam = np.array([[0.1, 0, 0, 0.5, 0, 0]])  # non-identity rig
    assert check_cg_compatible(problem) is None

    g = _graph_problem("gauge")
    assert check_cg_compatible(g) is not None  # CG-incompatible reason
    with pytest.raises(ValueError):
        bundle_adjust_sharded(g, max_iterations=2, solver="cg")

    empty = _make_problem(n_shots=8, n_points=128, seed=2)
    empty.obs_uv = empty.obs_uv[:0]
    empty.obs_inv_sd = empty.obs_inv_sd[:0]
    with pytest.raises(ValueError):
        bundle_adjust_sharded(empty, max_iterations=2)


@pytest.mark.parametrize("solver", ["cg", "auto"])
def test_incremental_reconstruction_distributed(solver):
    """Full incremental SfM with EVERY global bundle routed through the
    sharded path on the 8-device mesh; strict reference bounds hold
    (aligned_position_rmse < 0.03 m, aligned_rotation_rmse < 0.003 rad,
    reference test_reconstruction_incremental.py:37-38).  solver="cg"
    pins the matrix-free CG route e2e; "auto" routes this mono map
    through the round-5 dense-grid block solver."""
    import opensfm_tpu.parallel.distributed_ba as dba
    from opensfm_tpu import geo, reconstruction
    from opensfm_tpu.synthetic_data import (
        synthetic_dataset,
        synthetic_examples,
        synthetic_scene,
    )

    np.random.seed(42)
    reference = geo.TopocentricConverter(47.0, 6.0, 0)
    data = synthetic_examples.synthetic_circle_scene(reference)
    scene = synthetic_scene.SyntheticInputData(
        data.get_reconstruction(), reference, 40, 1.0, 5.0, 0.1,
        (0.01, 0.1), False, 10, None,
    )
    dataset = synthetic_dataset.SyntheticDataSet(
        scene.reconstruction, scene.exifs, scene.features,
        scene.tracks_manager, scene.gcps,
    )
    dataset.config["bundle_use_gcp"] = True
    dataset.config["bundle_max_iterations"] = 20
    dataset.config["bundle_distributed"] = "yes"
    dataset.config["bundle_distributed_min_shots"] = 1
    dataset.config["bundle_distributed_solver"] = solver
    if solver == "auto":
        # The mono circle scene must pick the dense-grid route.
        orig_dense = dba._bundle_adjust_sharded_dense
        dense_calls = {"n": 0}

        def counting_dense(*args, **kwargs):
            dense_calls["n"] += 1
            return orig_dense(*args, **kwargs)

        dba._bundle_adjust_sharded_dense = counting_dense

    calls = {"sharded": 0}
    orig = dba.bundle_adjust_sharded

    def counting(*args, **kwargs):
        calls["sharded"] += 1
        return orig(*args, **kwargs)

    dba.bundle_adjust_sharded = counting
    try:
        _, recs = reconstruction.incremental_reconstruction(
            dataset, scene.tracks_manager
        )
    finally:
        dba.bundle_adjust_sharded = orig
        if solver == "auto":
            dba._bundle_adjust_sharded_dense = orig_dense

    assert calls["sharded"] >= 1, "no global bundle took the distributed path"
    if solver == "auto":
        assert dense_calls["n"] >= 1, \
            "auto did not route the mono map through the dense-grid solver"
    errors = synthetic_scene.compare(scene.reconstruction, scene.gcps, recs[0])
    assert errors["ratio_cameras"] == 1.0
    assert 0 < errors["aligned_position_rmse"] < 0.03
    assert 0 < errors["aligned_rotation_rmse"] < 0.003
    assert 0 < errors["aligned_points_rmse"] < 0.1


# ---------------------------------------------------------------------------
# Round-4 CG generalization (VERDICT r3 item 1): rigs (fixed AND optimized),
# per-observation depth priors, up-vector rows — all in-path, at f32.
# ---------------------------------------------------------------------------


def _with_rig_chain(problem, rigcam6, seed=0, noise=0.0005):
    """Re-synthesize the problem's observations through a rig chain so the
    geometry is consistent with a non-identity rig camera."""
    import jax.numpy as jnp

    from opensfm_tpu.ba.lm import _transform_rig
    from opensfm_tpu.geometry import cameras as cl

    rng = np.random.default_rng(seed)
    problem.rigcam = np.asarray(rigcam6, dtype=np.float64).reshape(1, 6)
    Xc = np.asarray(
        _transform_rig(
            jnp.asarray(problem.inst[problem.obs_inst]),
            jnp.asarray(problem.rigcam[problem.obs_rigcam]),
            jnp.asarray(problem.points[problem.obs_point]),
        )
    )
    problem.obs_uv = cl.project(
        "perspective", Xc, problem.cam[0], xp=np
    ) + rng.normal(0, noise, (len(Xc), 2))
    return problem


def test_cg_fixed_rig_matches_single_device():
    """Locked non-identity rig cameras compose into the CG projection
    chain (lm._transform_rig semantics)."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded, check_cg_compatible

    p = _with_rig_chain(
        _make_problem(n_shots=12, n_points=256, seed=3),
        [0.05, -0.02, 0.01, 0.3, -0.1, 0.2],
    )
    assert check_cg_compatible(p) is None
    rd = bundle_adjust(p, max_iterations=15)
    rs = bundle_adjust_sharded(p, max_iterations=15)
    assert rs.final_cost <= rd.final_cost * 1.10 + 1e-9, (
        rs.final_cost, rd.final_cost,
    )


def test_cg_optimized_rig_matches_single_device():
    """Optimized rig cameras are their own CG block family (with value-
    space priors), reaching the same basin as the dense solver."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded

    rng = np.random.default_rng(7)
    p = _with_rig_chain(
        _make_problem(n_shots=12, n_points=256, seed=4),
        [0.05, -0.02, 0.01, 0.3, -0.1, 0.2],
    )
    p.rigcam = p.rigcam + rng.normal(0, 0.005, (1, 6))
    p.opt_rigcam = np.ones(1, bool)
    p.rigcam_prior = p.rigcam.copy()
    p.rigcam_prior_inv_sd = np.full((1, 6), 10.0)
    rd = bundle_adjust(p, max_iterations=20)
    rs = bundle_adjust_sharded(p, max_iterations=20)
    assert rs.final_cost <= rd.final_cost * 1.10 + 1e-9, (
        rs.final_cost, rd.final_cost,
    )
    # The optimized rig camera lands where the dense solver puts it.
    assert np.abs(rs.rigcam - rd.rigcam).max() < 5e-3


def test_cg_depth_priors_match_single_device():
    """Per-observation depth-prior rows (RelativeDepthError) ride the CG
    observation shard."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.geometry.pose import Pose
    from opensfm_tpu.parallel import bundle_adjust_sharded, check_cg_compatible

    rng = np.random.default_rng(1)
    p = _make_problem(n_shots=12, n_points=256, seed=5)
    O = len(p.obs_uv)
    Rm = np.stack(
        [Pose(p.inst[i, :3], p.inst[i, 3:]).get_rotation_matrix()
         for i in p.obs_inst]
    )
    Xc = np.einsum("oij,oj->oi", Rm, p.points[p.obs_point]) \
        + p.inst[p.obs_inst, 3:]
    mask = rng.random(O) < 0.33
    p.obs_depth = np.where(mask, Xc[:, 2] + rng.normal(0, 0.01, O), 0.0)
    p.obs_depth_inv_sd = np.where(mask, 10.0, 0.0)
    p.obs_depth_radial = np.zeros(O, bool)
    assert check_cg_compatible(p) is None
    rd = bundle_adjust(p, max_iterations=15)
    rs = bundle_adjust_sharded(p, max_iterations=15)
    assert rs.final_cost <= rd.final_cost * 1.10 + 1e-9, (
        rs.final_cost, rd.final_cost,
    )


def test_cg_up_vector_rows_match_single_device():
    """Replicated up-vector (orientation-prior) rows: per-shot Cauchy(1)
    rows on the instance blocks, exact in the CG matvec."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded, check_cg_compatible

    p = _make_problem(n_shots=12, n_points=256, seed=6)
    n = 12
    p.up_inst = np.arange(n, dtype=np.int32)
    p.up_rigcam = np.zeros(n, dtype=np.int32)
    p.up_vec = np.tile(np.array([0.0, -1.0, 0.0]), (n, 1))
    p.up_inv_sd = np.full(n, 1e3)
    assert check_cg_compatible(p) is None
    rd = bundle_adjust(p, max_iterations=15)
    rs = bundle_adjust_sharded(p, max_iterations=15)
    assert rs.final_cost <= rd.final_cost * 1.10 + 1e-9, (
        rs.final_cost, rd.final_cost,
    )


def _run_distributed_e2e(make_scene, config_overrides, gcps=None):
    """Incremental reconstruction with bundle_distributed: yes and the CG
    compatibility gate INSTRUMENTED: every full-map bundle must take the
    sharded path (a non-None reason == a silent fallback == failure)."""
    import opensfm_tpu.ba.problem as ba_problem
    import opensfm_tpu.parallel.distributed_ba as dba
    from opensfm_tpu import reconstruction
    from opensfm_tpu.synthetic_data import synthetic_dataset, synthetic_scene

    scene = make_scene()
    dataset = synthetic_dataset.SyntheticDataSet(
        scene.reconstruction, scene.exifs, scene.features,
        scene.tracks_manager, gcps if gcps is not None else scene.gcps,
    )
    dataset.config["bundle_distributed"] = "yes"
    dataset.config["bundle_distributed_min_shots"] = 1
    dataset.config.update(config_overrides)

    reasons = []
    sharded_calls = {"n": 0}
    orig_check = dba.check_cg_compatible
    orig_sharded = dba.bundle_adjust_sharded

    def checking(problem):
        reason = orig_check(problem)
        reasons.append(reason)
        return reason

    def counting(*args, **kwargs):
        sharded_calls["n"] += 1
        return orig_sharded(*args, **kwargs)

    dba.check_cg_compatible = checking
    dba.bundle_adjust_sharded = counting
    try:
        _, recs = reconstruction.incremental_reconstruction(
            dataset, scene.tracks_manager
        )
    finally:
        dba.check_cg_compatible = orig_check
        dba.bundle_adjust_sharded = orig_sharded

    assert sharded_calls["n"] >= 1, "no global bundle took the CG path"
    bad = [r for r in reasons if r is not None]
    assert not bad, f"full-map bundles fell back to single-device: {bad}"
    return scene, recs


def test_incremental_reconstruction_distributed_rig():
    """Rig-scene e2e (4 rig cameras, orientation_prior alignment) with
    EVERY full-map bundle on the sharded CG path — no fallback permitted —
    meeting the reference's STRICT rig bounds
    (test_reconstruction_incremental.py:77: position rmse < 0.005)."""
    from opensfm_tpu import geo
    from opensfm_tpu.synthetic_data import synthetic_examples, synthetic_scene

    np.random.seed(42)
    reference = geo.TopocentricConverter(47.0, 6.0, 0)

    def make_scene():
        data = synthetic_examples.synthetic_rig_scene(reference)
        return synthetic_scene.SyntheticInputData(
            data.get_reconstruction(), reference, 40, 1.0, 0.1, 0.1,
            (0.0, 0.0), False,
        )

    scene, recs = _run_distributed_e2e(
        make_scene, {"align_method": "orientation_prior"}, gcps={}
    )
    from opensfm_tpu.synthetic_data import synthetic_scene as ss

    errors = ss.compare(scene.reconstruction, {}, recs[0])
    assert errors["ratio_cameras"] == 1.0
    assert 0 < errors["aligned_position_rmse"] < 0.005
    assert 0 < errors["aligned_rotation_rmse"] < 0.001
    assert 0 < errors["aligned_points_rmse"] < 0.05


def test_incremental_reconstruction_distributed_orientation_prior():
    """Mono circle scene forced through orientation_prior alignment (up-
    vector rows in every full bundle), all bundles on the sharded path,
    strict position/rotation bounds.  Since round 5 the up rows are
    in-path for the dense-grid block solver, so the mono map must route
    there (previously orientation-prior maps fell to the sparse routes)."""
    import opensfm_tpu.parallel.distributed_ba as dba
    from opensfm_tpu import geo
    from opensfm_tpu.synthetic_data import synthetic_examples, synthetic_scene

    np.random.seed(42)
    reference = geo.TopocentricConverter(47.0, 6.0, 0)

    def make_scene():
        data = synthetic_examples.synthetic_circle_scene(reference)
        return synthetic_scene.SyntheticInputData(
            data.get_reconstruction(), reference, 40, 1.0, 5.0, 0.1,
            (0.01, 0.1), False, 0, None,
        )

    orig_dense = dba._bundle_adjust_sharded_dense
    dense_calls = {"n": 0}

    def counting_dense(*args, **kwargs):
        dense_calls["n"] += 1
        return orig_dense(*args, **kwargs)

    dba._bundle_adjust_sharded_dense = counting_dense
    try:
        scene, recs = _run_distributed_e2e(
            make_scene, {"align_method": "orientation_prior"}, gcps={}
        )
    finally:
        dba._bundle_adjust_sharded_dense = orig_dense
    assert dense_calls["n"] >= 1, \
        "orientation-prior mono map did not take the dense-grid route"
    from opensfm_tpu.synthetic_data import synthetic_scene as ss

    errors = ss.compare(scene.reconstruction, {}, recs[0])
    assert errors["ratio_cameras"] == 1.0
    assert 0 < errors["aligned_position_rmse"] < 0.03
    assert 0 < errors["aligned_rotation_rmse"] < 0.003

# ---------------------------------------------------------------------------
# Round-5 assembled-Schur sharded path (VERDICT r4 #4): at moderate camera
# counts the reduced camera system is ASSEMBLED per shard, psum-ed once per
# trial, and solved exactly by a replicated Cholesky — no CG iterations.
# ---------------------------------------------------------------------------


def _variant_problem(name, n_shots=12, n_points=256, seed=3):
    p = _make_problem(n_shots=n_shots, n_points=n_points, seed=seed)
    ni, O = len(p.inst), len(p.obs_uv)
    if name == "rig_fixed":
        p.rigcam = np.array([[0.0, 0.02, 0.0, 0.1, 0.0, 0.05]])
    elif name == "rig_opt":
        p.rigcam = np.array([[0.0, 0.02, 0.0, 0.1, 0.0, 0.05]])
        p.opt_rigcam = np.ones(1, bool)
        p.rigcam_prior = p.rigcam.copy()
        p.rigcam_prior_inv_sd = np.full((1, 6), 10.0)
    elif name == "up":
        p.up_inst = np.arange(ni, dtype=np.int64)
        p.up_rigcam = np.zeros(ni, dtype=np.int64)
        p.up_vec = np.tile([0.0, 0.0, 1.0], (ni, 1))
        p.up_inv_sd = np.full(ni, 10.0)
    elif name == "depth":
        p.obs_depth = np.full(O, 10.0)
        p.obs_depth_inv_sd = np.full(O, 1.0)
        p.obs_depth_radial = np.zeros(O, bool)
    return p


@pytest.mark.parametrize(
    "variant", ["plain", "rig_fixed", "rig_opt", "up", "depth"]
)
def test_schur_sharded_matches_single_device(variant):
    """The assembled-Schur sharded solve is EXACT (unlike iterative CG):
    at f64 on the 8-device mesh it reproduces the single-device dense
    LM's trajectory to machine precision for every residual-family
    variant."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded

    rd = bundle_adjust(_variant_problem(variant), max_iterations=12)
    rs = bundle_adjust_sharded(
        _variant_problem(variant), max_iterations=12, solver="schur",
        dtype=np.float64,
    )
    rel = abs(rs.final_cost - rd.final_cost) / rd.final_cost
    assert rel < 1e-9, (variant, rs.final_cost, rd.final_cost)
    assert np.abs(rs.inst - rd.inst).max() < 1e-8
    assert np.abs(rs.cam - rd.cam).max() < 1e-8
    if variant == "rig_opt":
        assert np.abs(rs.rigcam - rd.rigcam).max() < 1e-8


def test_schur_eligibility_gate():
    """`auto` assembles at moderate camera counts and falls back to
    matrix-free CG when the per-shard assembly cost would dominate."""
    from opensfm_tpu.parallel.distributed_ba import (
        _schur_eligible,
        shard_problem,
    )

    small = shard_problem(_make_problem(n_shots=12, n_points=256), 8)
    assert _schur_eligible(small, 8)
    # A 4096-camera system: D ~ 24.6k, NP_shard * D^2 * 6 >> the flop gate.
    big = shard_problem(_make_problem(n_shots=12, n_points=256), 1)
    big.inst = np.zeros((4096, 6))
    big.opt_inst = np.ones(4096, bool)
    assert not _schur_eligible(big, 1)


def test_dense_grid_sharded_matches_single_device():
    """The dense-grid block solver (round 5: fused Pallas assembly/cost
    per shard over the zero-padded [NP, NI] grid) reproduces the
    single-device LM's trajectory to machine precision at f64 on the
    8-device mesh, for a SPARSE mono problem (track_window=8, so
    densification pads ~1/3 of the slots with zero weights)."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded

    def make():
        return _make_problem(n_shots=12, n_points=256, seed=3,
                             track_window=8)

    rd = bundle_adjust(make(), max_iterations=12)
    rs = bundle_adjust_sharded(
        make(), max_iterations=12, solver="dense", dtype=np.float64,
    )
    rel = abs(rs.final_cost - rd.final_cost) / rd.final_cost
    assert rel < 1e-9, (rs.final_cost, rd.final_cost)
    assert rs.iterations == rd.iterations
    assert np.abs(rs.inst - rd.inst).max() < 1e-8
    assert np.abs(rs.cam - rd.cam).max() < 1e-8
    assert np.abs(rs.points - rd.points).max() < 1e-8


def test_dense_grid_up_rows_match_single_device():
    """Up-vector (orientation-prior) rows through the dense-grid block
    solver: replicated Cauchy(1) rows must enter the reduced system and
    the accept/reject cost exactly once across the mesh, reproducing the
    single-device trajectory at f64 (round 5: orientation-prior
    pipelines previously fell off the dense-grid route)."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded

    def make():
        p = _make_problem(n_shots=12, n_points=256, seed=3,
                          track_window=8)
        p.up_inst = np.arange(12, dtype=np.int64)
        p.up_rigcam = np.zeros(12, dtype=np.int64)
        p.up_vec = np.tile([0.0, -1.0, 0.0], (12, 1))
        p.up_inv_sd = np.full(12, 1e3)
        return p

    rd = bundle_adjust(make(), max_iterations=12)
    rs = bundle_adjust_sharded(
        make(), max_iterations=12, solver="dense", dtype=np.float64,
    )
    rel = abs(rs.final_cost - rd.final_cost) / rd.final_cost
    assert rel < 1e-9, (rs.final_cost, rd.final_cost)
    assert rs.iterations == rd.iterations
    assert np.abs(rs.inst - rd.inst).max() < 1e-8
    assert np.abs(rs.points - rd.points).max() < 1e-8


def test_dense_grid_point_padding_with_prior_loss():
    """Non-power-of-two shard splits pad the point block; the per-point
    Cauchy prior-loss array must pad with it (round-5 fix: it was the
    only per-point array missing from shard_problem_dense's pad list)."""
    import jax
    from jax.sharding import Mesh

    from opensfm_tpu.parallel import bundle_adjust_sharded

    p = _make_problem(n_shots=12, n_points=500, seed=3, track_window=8)
    p.point_prior = np.asarray(p.points).copy()
    p.point_prior_inv_sd = np.full((500, 3), 0.5)
    p.point_prior_loss = np.full(500, 2.0)
    mesh = Mesh(np.array(jax.devices()[:3]), ("points",))
    r = bundle_adjust_sharded(
        p, max_iterations=6, solver="dense", dtype=np.float64, mesh=mesh,
    )
    assert r.final_cost <= r.initial_cost
    assert r.points.shape == (500, 3)


def test_dense_grid_routing():
    """`auto` routes mono single-camera problems to the dense-grid
    solver, keeps rig/up/depth/pose-graph/multi-camera problems on the
    sparse routes, and caps the grid size; explicit solver="dense" on an
    ineligible problem raises."""
    import pytest as _pytest

    from opensfm_tpu.parallel.distributed_ba import _dense_grid_eligible
    from opensfm_tpu.parallel import bundle_adjust_sharded

    assert _dense_grid_eligible(
        _make_problem(n_shots=12, n_points=256, track_window=8)
    )
    rig = _make_problem(n_shots=12, n_points=256)
    rig.rigcam = np.array([[0.0, 0.02, 0.0, 0.1, 0.0, 0.05]])
    assert not _dense_grid_eligible(rig)
    up = _make_problem(n_shots=12, n_points=256)
    up.up_inst = np.arange(12, dtype=np.int64)
    up.up_rigcam = np.zeros(12, dtype=np.int64)
    up.up_vec = np.tile([0.0, 0.0, 1.0], (12, 1))
    up.up_inv_sd = np.full(12, 10.0)
    # Up-vector rows are in-path for the dense grid since round 5
    # (replicated _assemble_S epilogue + cost tail).
    assert _dense_grid_eligible(up)
    depth = _make_problem(n_shots=12, n_points=256, track_window=8)
    depth.obs_depth = np.full(len(depth.obs_uv), 2.0)
    depth.obs_depth_inv_sd = np.full(len(depth.obs_uv), 1.0)
    assert not _dense_grid_eligible(depth)
    big = _make_problem(n_shots=12, n_points=256)
    big.inst = np.zeros((200_000, 6))  # grid would be 51M slots
    assert not _dense_grid_eligible(big)
    with _pytest.raises(ValueError):
        bundle_adjust_sharded(rig, solver="dense")


def test_incremental_reconstruction_distributed_schur():
    """Full incremental SfM with every global bundle on the assembled-
    Schur sharded path (solver forced, fallback poisoned), strict
    reference bounds (test_reconstruction_incremental.py:37-39)."""
    from opensfm_tpu import geo
    from opensfm_tpu.synthetic_data import synthetic_examples, synthetic_scene

    np.random.seed(42)
    reference = geo.TopocentricConverter(47.0, 6.0, 0)

    def make_scene():
        data = synthetic_examples.synthetic_circle_scene(reference)
        return synthetic_scene.SyntheticInputData(
            data.get_reconstruction(), reference, 40, 1.0, 5.0, 0.1,
            (0.01, 0.1), False, 0, None,
        )

    scene, recs = _run_distributed_e2e(
        make_scene, {"bundle_distributed_solver": "schur"}, gcps={}
    )
    from opensfm_tpu.synthetic_data import synthetic_scene as ss

    errors = ss.compare(scene.reconstruction, {}, recs[0])
    assert errors["ratio_cameras"] == 1.0
    assert 0 < errors["aligned_position_rmse"] < 0.03
    assert 0 < errors["aligned_rotation_rmse"] < 0.003


def _mixed_ptype_problem(seed=3):
    """Half the shots re-projected through a SPHERICAL camera: a two-type
    problem with type-sorted segments (lm._residual_data encoding)."""
    from opensfm_tpu.geometry import cameras as cl
    from opensfm_tpu.geometry.pose import Pose

    p = _make_problem(n_shots=12, n_points=256, seed=seed)
    n_pts = len(p.points)
    O = len(p.obs_uv)
    # Dense shot-major layout: obs of shots 6..11 form the tail segment.
    split = 6 * n_pts
    p.cam = np.vstack([p.cam, np.zeros((1, p.cam.shape[1]))])
    p.cam_prior = p.cam.copy()
    p.cam_prior_inv_sd = np.vstack(
        [p.cam_prior_inv_sd, np.zeros((1, p.cam.shape[1]))]
    )
    p.cam_log_mask = np.vstack(
        [p.cam_log_mask, np.zeros((1, p.cam.shape[1]), bool)]
    )
    p.opt_cam = np.vstack([p.opt_cam, np.zeros((1, p.cam.shape[1]), bool)])
    p.obs_cam = np.where(np.arange(O) >= split, 1, 0).astype(np.int64)
    # Re-synthesize the spherical observations.
    rng = np.random.default_rng(seed)
    sl = slice(split, O)
    Rm = np.stack(
        [Pose(p.inst[i, :3], p.inst[i, 3:]).get_rotation_matrix()
         for i in p.obs_inst[sl]]
    )
    Xc = np.einsum("oij,oj->oi", Rm, p.points[p.obs_point[sl]]) \
        + p.inst[p.obs_inst[sl], 3:]
    p.obs_uv = np.array(p.obs_uv)
    p.obs_uv[sl] = cl.project("spherical", Xc, p.cam[1], xp=np) \
        + rng.normal(0, 0.0005, (O - split, 2))
    p.ptype = (("perspective", 0, split), ("spherical", split, O))
    return p


@pytest.mark.parametrize("solver", ["schur", "cg"])
def test_mixed_projection_types_distributed(solver):
    """Perspective + spherical cameras in ONE sharded bundle (VERDICT r4
    #5): the per-observation type dispatch reproduces the single-device
    segment path's basin; the compatibility gate no longer rejects
    multi-type problems."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded, check_cg_compatible

    p = _mixed_ptype_problem()
    assert check_cg_compatible(p) is None
    rd = bundle_adjust(_mixed_ptype_problem(), max_iterations=12)
    rs = bundle_adjust_sharded(
        _mixed_ptype_problem(), max_iterations=12, solver=solver,
        dtype=np.float64,
    )
    assert rs.final_cost < rs.initial_cost
    if solver == "schur":
        rel = abs(rs.final_cost - rd.final_cost) / rd.final_cost
        assert rel < 1e-9, (rs.final_cost, rd.final_cost)
        assert np.abs(rs.inst - rd.inst).max() < 1e-8
    else:
        assert rs.final_cost <= rd.final_cost * 1.10 + 1e-9


def test_mixed_projection_types_pipeline_entry():
    """Product-path coverage: a reconstruction holding BOTH perspective
    and spherical cameras routes its full bundle through
    `bundle_distributed: yes` (fallback poisoned) — the builder's
    type-sorted segments flow into the sharded per-obs dispatch."""
    import opensfm_tpu.ba.problem as ba_problem
    from opensfm_tpu import geo
    from opensfm_tpu.config import default_config
    from opensfm_tpu.synthetic_data import synthetic_scene as ss
    from opensfm_tpu.synthetic_data import synthetic_examples

    np.random.seed(5)
    reference = geo.TopocentricConverter(47.0, 6.0, 0)
    scene_data = synthetic_examples.synthetic_circle_scene(reference)
    # Second sequence with a spherical camera on the same street.
    cam2 = ss.get_camera("spherical", "2", 0.7, 0.0, 0.0)
    scene_data.add_camera_sequence(cam2, 60, 2.0, 6, [0.2, 0.2, 0.01], 0.2,
                                   None)
    from opensfm_tpu.synthetic_data import synthetic_scene
    scene = synthetic_scene.SyntheticInputData(
        scene_data.get_reconstruction(), reference, 40, 1.0, 5.0, 0.1,
        (0.01, 0.1), False, 0, None,
    )
    rec = scene.reconstruction
    types = {s.camera.projection_type for s in rec.shots.values()}
    assert types == {"perspective", "spherical"}, types
    config = default_config()
    config["bundle_distributed"] = "yes"
    config["bundle_distributed_min_shots"] = 1
    config["bundle_max_iterations"] = 5

    def _no_fallback(*a, **k):
        raise AssertionError("mixed-type bundle fell back to single-device")

    orig = ba_problem.bundle_adjust
    ba_problem.bundle_adjust = _no_fallback
    try:
        report = ba_problem.bundle(rec, {}, {}, None, config)
    finally:
        ba_problem.bundle_adjust = orig
    assert report["final_cost"] <= report["initial_cost"], report


def _graph_problem(family, seed=3):
    """_make_problem + one pose-graph constraint family (values derived
    from the perturbed state — equivalence needs agreement, not truth)."""
    from opensfm_tpu.geometry import rotation as grot

    p = _make_problem(n_shots=12, n_points=256, seed=seed)
    i = np.arange(0, 10, dtype=np.int32)
    j = i + 1
    if family == "rm":
        p.scales = np.ones(2)
        p.opt_scales = np.array([False, True])
        K = len(i)
        Ri = [grot.rotvec_to_matrix(p.inst[a, :3]) for a in i]
        Rj = [grot.rotvec_to_matrix(p.inst[b, :3]) for b in j]
        p.rm_i, p.rm_j = i, j
        p.rm_si = np.zeros(K, np.int32)
        p.rm_sj = np.ones(K, np.int32)
        p.rm_rvec = np.stack(
            [grot.matrix_to_rotvec(np.asarray(Rj[k] @ Ri[k].T).T)
             for k in range(K)]
        )
        p.rm_tvec = np.zeros((K, 3))
        p.rm_scale = np.ones(K)
        p.rm_inv_sd = np.full((K, 7), 5.0)
        p.rm_obs_scale = np.zeros(K, bool)
        p.rm_loss_c = np.ones(K)
    elif family == "rr":
        K = len(i)
        p.rr_i, p.rr_j = i, j
        p.rr_ri = np.zeros(K, np.int32)
        p.rr_rj = np.zeros(K, np.int32)
        p.rr_rvec = np.zeros((K, 3))
        p.rr_inv_sd = np.full((K, 3), 2.0)
        p.rr_loss_c = np.ones(K)
    elif family == "cp":
        K = len(i)
        p.cp_i, p.cp_j = i, j
        p.cp_ri = np.zeros(K, np.int32)
        p.cp_rj = np.zeros(K, np.int32)
        p.cp_margin = np.full(K, 1.0)
        p.cp_inv_sd = np.full(K, 0.5)
    elif family == "lin":
        K = 8
        p.lin_i0 = np.arange(K, dtype=np.int32)
        p.lin_i1 = p.lin_i0 + 1
        p.lin_i2 = p.lin_i0 + 2
        p.lin_r0 = np.zeros(K, np.int32)
        p.lin_r1 = np.zeros(K, np.int32)
        p.lin_r2 = np.zeros(K, np.int32)
        p.lin_alpha = np.full(K, 0.5)
        p.lin_pos_inv_sd = np.full(K, 2.0)
        p.lin_rot_inv_sd = np.full(K, 2.0)
    elif family == "gauge":
        p.gauge_i = np.array([0], np.int32)
        p.gauge_j = np.array([6], np.int32)
        p.gauge_norm = np.array([20.0])
    elif family == "hm":
        rng = np.random.default_rng(0)
        p.heatmaps = rng.random((1, 16, 16)) * 0.1
        p.hm_res = np.array([4.0])
        p.hm_inst = np.arange(4, dtype=np.int32)
        p.hm_rigcam = np.zeros(4, np.int32)
        p.hm_map = np.zeros(4, np.int32)
        p.hm_offset = np.zeros((4, 2))
        p.hm_inv_sd = np.full(4, 1.0)
    return p


@pytest.mark.parametrize(
    "family", ["rm", "rr", "cp", "lin", "gauge", "hm"]
)
def test_schur_pose_graph_families_match_single_device(family):
    """Pose-graph constraint rows (relative motion w/ cluster scales,
    relative rotation, common position, linear motion, gauge, heatmap —
    reference bundle_adjuster.h:220-252) ride the assembled-Schur sharded
    path as replicated dense blocks (round 5; they were CG-excluded) and
    reproduce the single-device trajectory at f64."""
    from opensfm_tpu.ba.lm import bundle_adjust
    from opensfm_tpu.parallel import bundle_adjust_sharded, check_cg_compatible

    p = _graph_problem(family)
    assert check_cg_compatible(p) is not None  # CG still excludes them
    rd = bundle_adjust(_graph_problem(family), max_iterations=10)
    rs = bundle_adjust_sharded(
        _graph_problem(family), max_iterations=10, solver="auto",
        dtype=np.float64,
    )
    rel = abs(rs.final_cost - rd.final_cost) / rd.final_cost
    assert rel < 1e-7, (family, rs.final_cost, rd.final_cost)
    assert np.abs(rs.inst - rd.inst).max() < 1e-6
    if family == "rm":
        assert np.abs(np.asarray(rs.scales) - np.asarray(rd.scales)).max() \
            < 1e-8
