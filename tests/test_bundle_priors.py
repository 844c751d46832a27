"""Up-vector, pan/tilt/roll, depth-prior, and covariance BA tests.

Mirrors reference test_bundle.py coverage of AddAbsoluteUpVector /
AddAbsolutePan/Tilt/Roll / depth priors (bundle_adjuster.h:214-243)."""

import numpy as np
import pytest

from opensfm_tpu.ba.lm import BAProblem, bundle_adjust
from opensfm_tpu.geometry import rotation as rot


def make_base_problem(**kw):
    """One instance, one rig camera (identity), one camera, two points,
    observations from a simple synthetic setup."""
    rng = np.random.default_rng(0)
    n_pts = 8
    pts = rng.normal(size=(n_pts, 3)) + np.array([0, 0, 5.0])
    inst = np.zeros((1, 6))
    obs_uv = []
    for X in pts:
        obs_uv.append(0.9 * X[:2] / X[2])
    obs_uv = np.asarray(obs_uv)
    O = n_pts
    T = 1  # one obs per point with a single camera
    point_obs = np.arange(O, dtype=np.int64)[:, None]

    base = dict(
        inst=inst,
        rigcam=np.zeros((1, 6)),
        cam=np.array([[0.0, 0.0, 0.9]]),  # k1, k2, focal
        points=pts,
        obs_uv=obs_uv,
        obs_inv_sd=np.full(O, 1.0 / 0.004),
        obs_point=np.arange(O),
        obs_inst=np.zeros(O, dtype=int),
        obs_rigcam=np.zeros(O, dtype=int),
        obs_cam=np.zeros(O, dtype=int),
        point_obs=point_obs,
        gps_pos=np.zeros((1, 3)),
        gps_inv_sd=np.zeros(1),
        cam_prior=np.array([[0.0, 0.0, 0.9]]),
        cam_prior_inv_sd=np.zeros((1, 3)),
        cam_log_mask=np.zeros((1, 3), dtype=bool),
        rigcam_prior=np.zeros((1, 6)),
        rigcam_prior_inv_sd=np.zeros((1, 6)),
        point_prior=np.zeros((len(pts), 3)),
        point_prior_inv_sd=np.zeros((len(pts), 3)),
        opt_inst=np.array([True]),
        opt_rigcam=np.array([False]),
        opt_cam=np.zeros((1, 3), dtype=bool),
        opt_points=np.zeros(len(pts), dtype=bool),
        ptype="perspective",
        loss="TrivialLoss",
    )
    base.update(kw)
    return BAProblem(**base)


def test_up_vector_prior_pulls_rotation():
    # A shot rotated 0.05 rad about x with projections consistent with that
    # rotation; only the up-vector term R_cw @ (0,-1,0) == (0,0,1) is
    # violated.  Points are free, so a pure gauge rotation satisfies the
    # prior at zero reprojection cost and the solver must find it.  (In the
    # pipeline the orientation-prior alignment runs before bundle, so the
    # violation is always in this small regime; Cauchy(1) downweights large
    # ones — same behavior as Ceres.)
    # A horizontal camera in a z-up world has world-to-cam rotation
    # (pi/2, 0, 0); start 0.05 rad off that.
    r0 = np.array([np.pi / 2 + 0.05, 0.0, 0.0])
    problem = make_base_problem(
        inst=np.array([np.concatenate([r0, np.zeros(3)])]),
        up_inst=np.array([0]),
        up_rigcam=np.array([0]),
        up_vec=np.array([[0.0, -1.0, 0.0]]),
        up_inv_sd=np.array([1.0 / 0.1]),
    )
    # Points in front of the camera (its frame), mapped to world.
    R = np.asarray(rot.rotvec_to_matrix(r0))
    pts_cam = problem.points  # reuse the z~5 cloud as camera-frame points
    problem.points = (R.T @ pts_cam.T).T
    problem.obs_uv = 0.9 * pts_cam[:, :2] / pts_cam[:, 2:3]
    problem.opt_points = np.ones(len(problem.points), dtype=bool)

    result = bundle_adjust(problem, max_iterations=100)
    r_cw = -result.inst[0, :3]
    up_world = np.asarray(
        rot.rotate(np.asarray(r_cw), np.array([0.0, -1.0, 0.0]))
    )
    assert np.allclose(up_world, [0, 0, 1], atol=5e-3)
    assert result.final_cost < result.initial_cost * 0.05


def test_depth_prior_scales_scene():
    # With gauge freedom (no GPS), radial depth priors fix the scene depth.
    problem = make_base_problem()
    true_depths = np.linalg.norm(problem.points, axis=1)
    problem.obs_depth = 2.0 * true_depths  # ask for a 2x larger scene
    problem.obs_depth_inv_sd = np.full(len(true_depths), 1.0 / 0.01)
    problem.obs_depth_radial = np.ones(len(true_depths), dtype=bool)
    problem.opt_points = np.ones(len(problem.points), dtype=bool)
    problem.opt_inst = np.array([False])  # keep the camera fixed

    result = bundle_adjust(problem, max_iterations=80)
    new_depths = np.linalg.norm(result.points, axis=1)
    assert np.allclose(new_depths / true_depths, 2.0, atol=0.05)


def test_angle_priors_run():
    problem = make_base_problem(
        ang_kind=np.array([0, 1, 2]),
        ang_inst=np.array([0, 0, 0]),
        ang_rigcam=np.array([0, 0, 0]),
        ang_value=np.array([0.0, 0.0, 0.0]),
        ang_inv_sd=np.array([1.0, 1.0, 1.0]),
    )
    result = bundle_adjust(problem, max_iterations=5)
    assert np.all(np.isfinite(result.inst))


def test_covariance_recovery():
    problem = make_base_problem(
        gps_pos=np.zeros((1, 3)), gps_inv_sd=np.array([1.0 / 0.1])
    )
    problem.opt_points = np.zeros(len(problem.points), dtype=bool)
    result = bundle_adjust(
        problem, max_iterations=10, compute_covariances=True
    )
    assert result.covariances is not None
    assert result.covariances.shape == (1, 6, 6)
    assert result.covariance_valid
    # Diagonal must be positive; more observations would shrink it.
    assert np.all(np.diag(result.covariances[0]) > 0)


def test_covariance_none_by_default():
    result = bundle_adjust(make_base_problem(), max_iterations=2)
    assert result.covariances is None and not result.covariance_valid
