"""Pallas TPU kernels vs their jnp twins (interpreter mode on CPU).

The kernels compile for real TPUs; here they run under the Pallas
interpreter so CI stays hermetic (SURVEY.md §4 test strategy).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from opensfm_tpu.ops.pallas_kernels.top2 import (
    TILE_M,
    TILE_N,
    top2_sqdist_pallas,
)


def _ref_top2(d1, d2, n2, mask=None):
    dist = (
        (d1**2).sum(1)[:, None]
        + (d2**2).sum(1)[None, :]
        - 2.0 * d1 @ d2.T
    )
    dist[:, n2:] = np.inf
    if mask is not None:
        dist[mask == 0] = np.inf
    order = np.argsort(dist, axis=1)
    return order[:, 0], np.take_along_axis(dist, order[:, :2], axis=1)


@pytest.mark.parametrize("masked", [False, True])
def test_top2_matches_dense_reference(masked) -> None:
    rng = np.random.default_rng(7)
    N, M, D = TILE_N, 2 * TILE_M, 128
    n2 = M - 37  # padded tail columns must be masked out
    d1 = rng.normal(size=(N, D)).astype(np.float32)
    d2 = rng.normal(size=(M, D)).astype(np.float32)
    d2[n2:] = 0.0

    mask = None
    if masked:
        mask = (rng.random((N, M)) < 0.25).astype(np.float32)
    ref_i, ref_d = _ref_top2(
        d1.astype(np.float64), d2.astype(np.float64), n2, mask
    )

    idx, dist = top2_sqdist_pallas(
        jnp.asarray(d1),
        jnp.asarray(d2),
        n2,
        None if mask is None else jnp.asarray(mask),
        interpret=True,
    )
    idx = np.asarray(idx)[:, 0]
    dist = np.asarray(dist)

    finite = np.isfinite(ref_d[:, 0])
    assert finite.any()
    assert (idx[finite] == ref_i[finite]).mean() > 0.99
    np.testing.assert_allclose(
        dist[finite], ref_d[finite], rtol=1e-3, atol=1e-2
    )
    # rows with no allowed candidate stay at +inf
    assert np.isinf(dist[~finite, 0]).all()


def test_matcher_dispatch_same_result_small() -> None:
    """The public matcher (jnp path on CPU) agrees with brute force."""
    from opensfm_tpu.ops.matching import match_brute_force_symmetric

    rng = np.random.default_rng(3)
    d1 = rng.normal(size=(130, 64)).astype(np.float32)
    d2 = rng.normal(size=(150, 64)).astype(np.float32)
    # make 40 strong mutual matches
    d2[10:50] = d1[20:60] + 1e-3 * rng.normal(size=(40, 64)).astype(
        np.float32
    )
    matches = match_brute_force_symmetric(d1, d2, ratio=0.8)
    got = {(i, j) for i, j in matches}
    expected = {(20 + k, 10 + k) for k in range(40)}
    assert expected <= got


def _mono_perspective_problem(O=600, ni=5, nc=2, npts=200, seed=0):
    """Random mono (identity-rig) perspective BA quantities in f32."""
    rng = np.random.default_rng(seed)
    inst = np.concatenate(
        [0.2 * rng.normal(size=(ni, 3)), rng.normal(size=(ni, 3)) + [0, 0, 8]],
        axis=1,
    ).astype(np.float32)
    cam = np.concatenate(
        [0.05 * rng.normal(size=(nc, 2)), 0.9 + 0.2 * rng.random((nc, 1))],
        axis=1,
    ).astype(np.float32)
    points = rng.normal(size=(npts, 3)).astype(np.float32) * 2.0
    obs_inst = rng.integers(0, ni, size=O).astype(np.int32)
    obs_cam = rng.integers(0, nc, size=O).astype(np.int32)
    obs_point = rng.integers(0, npts, size=O).astype(np.int32)
    obs_uv = (0.3 * rng.normal(size=(O, 2))).astype(np.float32)
    obs_inv_sd = (1.0 + rng.random(O)).astype(np.float32)
    return inst, cam, points, obs_inst, obs_cam, obs_point, obs_uv, obs_inv_sd


@pytest.mark.parametrize("loss", ["SoftLOneLoss", "CauchyLoss", "TrivialLoss"])
def test_ba_resjac_kernel_matches_lm(loss) -> None:
    """Fused Pallas residual+Jacobian kernel == lm._residual_data for the
    mono perspective configuration (rig_transform=False)."""
    from opensfm_tpu.ba import lm
    from opensfm_tpu.ops.pallas_kernels.ba_resjac import (
        fused_residual_jacobian,
    )

    (inst, cam, points, obs_inst, obs_cam, obs_point, obs_uv,
     obs_inv_sd) = _mono_perspective_problem()
    O = obs_uv.shape[0]
    state = (
        jnp.asarray(inst), jnp.zeros((1, 6), jnp.float32),
        jnp.asarray(cam), jnp.asarray(points),
    )
    data = dict(
        obs_uv=jnp.asarray(obs_uv), obs_inv_sd=jnp.asarray(obs_inv_sd),
        obs_point=jnp.asarray(obs_point), obs_inst=jnp.asarray(obs_inst),
        obs_rigcam=jnp.zeros(O, jnp.int32), obs_cam=jnp.asarray(obs_cam),
    )
    r_ref, Jc_ref, Jp_ref, cost_ref = lm._residual_data(
        state, data, "perspective", loss, 1.0, 3,
        rig_transform=False, rig_jac=False,
    )

    r, Jc, Jp, cost = fused_residual_jacobian(
        jnp.asarray(inst), jnp.asarray(cam), jnp.asarray(points),
        jnp.asarray(obs_inst), jnp.asarray(obs_cam), jnp.asarray(obs_point),
        jnp.asarray(obs_uv), jnp.asarray(obs_inv_sd),
        loss=loss, loss_threshold=1.0, interpret=True,
    )

    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(Jp), np.asarray(Jp_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(cost_ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sym_tile", [None, 16])
def test_fused_schur_assembly_matches_xla_dense(sym_tile):
    """The fused assembly kernel (interpret mode) must reproduce the XLA
    dense-path reduced system (S, b) including opt masks and point priors.
    sym_tile=16 forces the triangular-tiled symmetric S_II product (T=3
    column tiles at ni=8) so the skipped-tile mirror is exercised; None
    takes the single-tile fallback the tiny problem would pick itself."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from opensfm_tpu.ba import lm
    from opensfm_tpu.ops.pallas_kernels import ba_assemble

    ni, np_pts = 8, 256
    rng = np.random.default_rng(0)
    from __graft_entry__ import _make_problem

    problem, dense = lm.canonicalize_problem_dense(
        _make_problem(n_shots=ni, n_points=np_pts, seed=4)
    )
    assert dense
    problem.opt_inst[0] = False
    problem.opt_points[:7] = False
    problem.point_prior_inv_sd[3:5] = 2.0
    nr, nc = len(problem.rigcam), len(problem.cam)
    pmax = problem.cam.shape[1]
    dt = jnp.float32
    st = tuple(
        jnp.asarray(getattr(problem, k), dt)
        for k in ("inst", "rigcam", "cam", "points")
    )
    ints = ("obs_point", "obs_inst", "obs_rigcam", "obs_cam", "point_obs")
    bools = ("cam_log_mask", "opt_inst", "opt_rigcam", "opt_cam", "opt_points")
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
    lam = jnp.asarray(1e-3, dt)

    S1, b1, _ = lm._build_reduced_system(
        st, d, lam, "perspective", "SoftLOneLoss", 1.0, pmax, ni, nr, nc,
        False, True, False, False, True,
    )
    orig = ba_assemble.fused_schur_assembly
    orig_tile = ba_assemble._sym_tile
    try:
        ba_assemble.fused_schur_assembly = functools.partial(
            orig, interpret=True
        )
        if sym_tile is not None:
            ba_assemble._sym_tile = lambda ni6: sym_tile
        S2, b2, back = lm._build_reduced_system_fused(
            st, d, lam, "SoftLOneLoss", 1.0, ni, nr, nc, pmax
        )
    finally:
        ba_assemble.fused_schur_assembly = orig
        ba_assemble._sym_tile = orig_tile
    S1, b1, S2, b2 = map(np.asarray, (S1, b1, S2, b2))
    assert np.abs(S1 - S2).max() / np.abs(S1).max() < 1e-4
    assert np.abs(b1 - b2).max() / (np.abs(b1).max() + 1e-12) < 1e-4
    assert np.isfinite(np.asarray(back["Hpp_inv"])).all()
