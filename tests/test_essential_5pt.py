"""Parity tests for the batched Nistér 5-point essential solver.

Mirrors the reference semantics of EssentialFivePoints
(/root/reference/opensfm/src/geometry/essential.h:100-164): exact E recovery
from 5 noise-free correspondences, and the RANSAC-level robustness claim that
motivated it — at low inlier ratios a 5-point minimal sample has a far higher
clean-sample probability than the 8-point linear stand-in (w^5 vs w^8), so
the 5-pt core must win more pairs at the same hypothesis budget.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opensfm_tpu.geometry import essential as ess
from opensfm_tpu.geometry import rotation as rot
from opensfm_tpu import robust
from opensfm_tpu.robust import ransac as ransac_mod


def _synthetic_pair(rng, n, inlier_ratio=1.0, depth=2.0):
    """Random relative pose + bearing pairs with a fraction of outliers.

    A wide bearing cone (unit cube at depth 2 -> ~55 deg half angle) keeps
    the asin(y.Ex) geodesic scoring well-posed; narrow cones admit
    degenerate E whose right null vector sits inside the cone (a known
    property of the reference's EpipolarGeodesic error too,
    essential_model.h:21-27)."""
    rvec = rng.normal(size=3) * 0.3
    R = np.array(rot.rotvec_to_matrix(jnp.asarray(rvec)))
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-1, 1, size=(n, 3)) + np.array([0.0, 0.0, depth])
    x = X / np.linalg.norm(X, axis=1, keepdims=True)
    Y = X @ R.T + t
    y = Y / np.linalg.norm(Y, axis=1, keepdims=True)
    n_out = int(round(n * (1.0 - inlier_ratio)))
    if n_out:
        bad = rng.normal(size=(n_out, 3))
        y[:n_out] = bad / np.linalg.norm(bad, axis=1, keepdims=True)
    return R, t, x, y, n_out


@pytest.mark.parametrize("seed", range(8))
def test_five_points_exact_recovery(seed):
    """5 exact correspondences -> candidate set contains the true E to
    machine precision (essential.h:100 parity)."""
    rng = np.random.default_rng(seed)
    R, t, x, y, _ = _synthetic_pair(rng, 5)
    E_true = np.array(ess.essential_from_pose(jnp.asarray(R), jnp.asarray(t)))
    E_true = E_true / np.linalg.norm(E_true)
    Es, valid = ess.essential_five_points(jnp.asarray(x), jnp.asarray(y))
    Es, valid = np.array(Es), np.array(valid)
    assert valid.sum() >= 1
    errs = [
        min(np.linalg.norm(E - E_true), np.linalg.norm(E + E_true))
        for E, v in zip(Es, valid)
        if v
    ]
    assert min(errs) < 1e-9


def test_five_points_satisfy_epipolar_constraint():
    """Every valid candidate must satisfy y^T E x = 0 on the sample and the
    essential singular-value structure (s, s, 0)."""
    rng = np.random.default_rng(3)
    _, _, x, y, _ = _synthetic_pair(rng, 5)
    Es, valid = ess.essential_five_points(jnp.asarray(x), jnp.asarray(y))
    Es, valid = np.array(Es), np.array(valid)
    for E, v in zip(Es, valid):
        if not v:
            continue
        residual = np.abs(np.einsum("ni,ij,nj->n", y, E, x))
        assert residual.max() < 1e-8
        s = np.linalg.svd(E, compute_uv=False)
        assert abs(s[0] - s[1]) < 1e-6
        assert s[2] < 1e-6


def _eight_point_core():
    """The round-1 8-point linear minimal core, rebuilt for comparison."""

    def minimal(x, y):
        E = ess.essential_n_points(x, y)
        return E[None], jnp.ones(1, dtype=bool)

    def error(E, x, y):
        return jnp.abs(ess.epipolar_geodesic_error(E, x, y))

    def nonminimal(E, x, y, mask):
        return ess.essential_n_points(x, y, mask=mask)

    return ransac_mod.make_ransac_core(minimal, error, nonminimal, 8)


def _pose_recovered(R, t, result, x, y, tol_deg=2.0):
    if result.model is None or result.num_inliers < 10:
        return False
    E = np.asarray(result.model)
    Rt = np.array(
        ess.relative_pose_from_essential(jnp.asarray(E), jnp.asarray(x), jnp.asarray(y))
    )
    dR = Rt[:, :3] @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    t_est = Rt[:, 3] / np.linalg.norm(Rt[:, 3])
    t_ang = np.degrees(np.arccos(np.clip(abs(t_est @ t), -1, 1)))
    return ang < tol_deg and t_ang < 2 * tol_deg


def test_five_point_beats_eight_point_at_low_inlier_ratio():
    """At 40% inliers and a modest hypothesis budget, the 5-pt minimal core
    must recover the pose on more pairs than the 8-pt linear core (the
    VERDICT round-1 regression: w^5 = 1% vs w^8 = 0.07% clean samples)."""
    core8 = _eight_point_core()
    iters = 300
    wins5 = wins8 = 0
    n_pairs = 8
    for seed in range(n_pairs):
        rng = np.random.default_rng(100 + seed)
        R, t, x, y, _ = _synthetic_pair(rng, 120, inlier_ratio=0.4)
        r5 = robust.ransac_essential(x, y, threshold=0.002, iterations=iters, seed=seed)
        r8 = ransac_mod._run(
            core8, x, y, 0.002, iters, 8, seed
        )
        wins5 += _pose_recovered(R, t, r5, x, y)
        wins8 += _pose_recovered(R, t, r8, x, y)
    assert wins5 >= 7, f"5-pt won only {wins5}/{n_pairs}"
    assert wins5 >= wins8, f"5-pt ({wins5}) did not beat 8-pt ({wins8})"


def test_ransac_relative_pose_uses_five_point():
    """ransac_relative_pose succeeds with exactly 5 inlier-capable samples'
    worth of data at high outlier rates where 8-pt samples almost never come
    clean — and its minimal solver is the 5-point one."""
    assert ransac_mod._ESSENTIAL_SAMPLES == 5
    rng = np.random.default_rng(7)
    R, t, x, y, n_out = _synthetic_pair(rng, 150, inlier_ratio=0.45)
    result = robust.ransac_relative_pose(x, y, threshold=0.01, iterations=300, seed=1)
    Rt = np.asarray(result.model)
    dR = Rt[:, :3] @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0
    # inliers found should roughly match the planted inliers
    assert result.num_inliers > 0.8 * (150 - n_out)
