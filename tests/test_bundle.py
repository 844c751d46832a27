"""Bundle adjustment tests through the Reconstruction API.

Mirrors reference opensfm/test/test_bundle.py behaviors: GPS-anchored full
bundle, pose-only bundle, local bundle with fixed boundary, GCP priors,
camera prior pull.
"""

import copy

import numpy as np
import pytest

from opensfm_tpu import config as config_mod
from opensfm_tpu import pymap, types
from opensfm_tpu.ba import problem as ba_problem
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose
from opensfm_tpu.io import GroundControlPoint, GroundControlPointObservation


def make_circle_reconstruction(n_shots=8, n_points=150, noise_px=0.0, seed=0):
    """Cameras on a circle of radius 10 looking inward at random points."""
    rng = np.random.default_rng(seed)
    rec = types.Reconstruction()
    cam = Camera.create_perspective(0.85, -0.05, 0.002)
    cam.id = "cam1"
    cam.width, cam.height = 800, 600
    rec.add_camera(cam)

    points = rng.uniform(-4, 4, (n_points, 3))
    for j in range(n_points):
        p = rec.create_point(str(j), points[j])
        p.color = np.array([100, 100, 100])

    for i in range(n_shots):
        ang = 2 * np.pi * i / n_shots
        origin = np.array([10 * np.cos(ang), 10 * np.sin(ang), 0.0])
        z = -origin / np.linalg.norm(origin)
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        pose = Pose()
        pose.set_rotation_matrix(np.stack([x, y, z]))
        pose.set_origin(origin)
        shot = rec.create_shot(f"shot{i}", "cam1", pose)
        shot.metadata.gps_position.value = origin
        shot.metadata.gps_accuracy.value = 1.0
        uv = shot.project_many(points)
        uv += rng.normal(0, noise_px, uv.shape)
        for j in range(n_points):
            rec.add_observation(
                f"shot{i}", str(j),
                pymap.Observation(uv[j, 0], uv[j, 1], 0.004, 100, 100, 100, j),
            )
    return rec


def camera_priors(rec):
    return {cid: cam.copy() for cid, cam in rec.cameras.items()}


def perturb(rec, rng, pose_sigma=0.03, point_sigma=0.2):
    for shot in rec.shots.values():
        inst = shot.rig_instance
        p = inst.pose
        inst.pose = Pose(
            p.rotation + rng.normal(0, pose_sigma / 10, 3),
            p.translation + rng.normal(0, pose_sigma, 3),
        )
    for point in rec.points.values():
        point.coordinates = point.coordinates + rng.normal(0, point_sigma, 3)


def test_bundle_recovers_perturbation():
    cfg = config_mod.default_config()
    rec = make_circle_reconstruction()
    gt = copy.deepcopy(rec)
    rng = np.random.default_rng(1)
    perturb(rec, rng)

    report = ba_problem.bundle(rec, camera_priors(rec), {}, None, cfg)
    assert report["final_cost"] < report["initial_cost"] / 10

    for sid in gt.shots:
        o_gt = gt.shots[sid].pose.get_origin()
        o = rec.shots[sid].pose.get_origin()
        assert np.linalg.norm(o - o_gt) < 0.01, sid
    pt_err = np.array(
        [
            np.linalg.norm(rec.points[p].coordinates - gt.points[p].coordinates)
            for p in gt.points
        ]
    )
    assert np.median(pt_err) < 0.01


def test_bundle_zero_noise_is_stable():
    cfg = config_mod.default_config()
    rec = make_circle_reconstruction()
    gt = copy.deepcopy(rec)
    ba_problem.bundle(rec, camera_priors(rec), {}, None, cfg)
    for sid in gt.shots:
        assert np.allclose(
            rec.shots[sid].pose.get_origin(), gt.shots[sid].pose.get_origin(),
            atol=1e-4,
        )


def test_bundle_shot_poses_moves_only_target():
    cfg = config_mod.default_config()
    rec = make_circle_reconstruction()
    gt = copy.deepcopy(rec)
    rng = np.random.default_rng(2)
    # Perturb only shot0's pose.
    inst = rec.shots["shot0"].rig_instance
    inst.pose = Pose(
        inst.pose.rotation + rng.normal(0, 0.005, 3),
        inst.pose.translation + rng.normal(0, 0.05, 3),
    )
    before_other = rec.shots["shot1"].pose.get_origin().copy()
    before_point = rec.points["0"].coordinates.copy()

    ba_problem.bundle_shot_poses(rec, {"shot0"}, camera_priors(rec), {}, cfg)

    # shot0 recovered, others and points untouched.
    assert np.linalg.norm(
        rec.shots["shot0"].pose.get_origin() - gt.shots["shot0"].pose.get_origin()
    ) < 1e-3
    assert np.allclose(rec.shots["shot1"].pose.get_origin(), before_other)
    assert np.allclose(rec.points["0"].coordinates, before_point)


def test_bundle_local_fixes_boundary():
    cfg = config_mod.default_config()
    cfg["local_bundle_radius"] = 1
    cfg["local_bundle_max_shots"] = 3
    rec = make_circle_reconstruction()
    rng = np.random.default_rng(3)
    inst = rec.shots["shot0"].rig_instance
    inst.pose = Pose(
        inst.pose.rotation + rng.normal(0, 0.002, 3),
        inst.pose.translation + rng.normal(0, 0.02, 3),
    )
    report, covered = ba_problem.bundle_local(
        rec, camera_priors(rec), {}, "shot0", None, cfg
    )
    assert "shot0" in covered
    assert report["final_cost"] <= report["initial_cost"]


def test_shot_neighborhood():
    rec = make_circle_reconstruction(n_shots=6, n_points=50)
    interior, boundary = ba_problem.shot_neighborhood(
        rec, "shot0", radius=2, min_common_points=5, max_interior_size=3
    )
    assert "shot0" in interior
    assert len(interior) <= 3
    # All shots see all points -> everything else is boundary.
    assert len(interior) + len(boundary) == 6


def test_bundle_gcp_pulls_reconstruction():
    cfg = config_mod.default_config()
    rec = make_circle_reconstruction()
    gt = copy.deepcopy(rec)

    # GCP at a known point, observed in two shots, with LLA at a shifted
    # location: the reconstruction should shift toward it.
    target = gt.points["0"].coordinates
    shift = np.array([0.5, 0.0, 0.0])
    gcp = GroundControlPoint()
    gcp.id = "gcp0"
    lat, lon, alt = rec.reference.to_lla(*(target + shift))
    gcp.lla = {"latitude": lat, "longitude": lon, "altitude": alt}
    gcp.has_altitude = True
    for sid in ("shot0", "shot2"):
        o = GroundControlPointObservation(
            sid, gt.shots[sid].project(target)
        )
        gcp.observations.append(o)

    cfg["bundle_use_gps"] = False
    cfg["bundle_use_gcp"] = True
    report = ba_problem.bundle(rec, camera_priors(rec), {}, [gcp], cfg)
    moved = np.linalg.norm(rec.points["0"].coordinates - gt.points["0"].coordinates)
    assert moved > 0.05  # the GCP pulled the model


def test_triangulate_gcp():
    rec = make_circle_reconstruction()
    target = rec.points["5"].coordinates
    gcp = GroundControlPoint()
    gcp.id = "g"
    for sid in ("shot0", "shot3", "shot5"):
        gcp.observations.append(
            GroundControlPointObservation(sid, rec.shots[sid].project(target))
        )
    X = ba_problem.triangulate_gcp(gcp, rec.shots)
    assert X is not None
    assert np.allclose(X, target, atol=1e-6)


def test_bundle_fisheye_camera():
    cfg = config_mod.default_config()
    rng = np.random.default_rng(4)
    rec = types.Reconstruction()
    cam = Camera.create_fisheye(0.6, -0.02, 0.003)
    cam.id = "fish"
    cam.width, cam.height = 800, 600
    rec.add_camera(cam)
    points = rng.uniform(-3, 3, (80, 3))
    for j in range(80):
        rec.create_point(str(j), points[j])
    for i in range(6):
        ang = 2 * np.pi * i / 6
        origin = np.array([8 * np.cos(ang), 8 * np.sin(ang), 0.0])
        z = -origin / np.linalg.norm(origin)
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        pose = Pose()
        pose.set_rotation_matrix(np.stack([x, np.cross(z, x), z]))
        pose.set_origin(origin)
        shot = rec.create_shot(f"s{i}", "fish", pose)
        shot.metadata.gps_position.value = origin
        shot.metadata.gps_accuracy.value = 1.0
        uv = shot.project_many(points)
        for j in range(80):
            rec.add_observation(
                f"s{i}", str(j),
                pymap.Observation(uv[j, 0], uv[j, 1], 0.004, 0, 0, 0, j),
            )
    gt = copy.deepcopy(rec)
    perturb(rec, rng, pose_sigma=0.02, point_sigma=0.1)
    ba_problem.bundle(rec, camera_priors(rec), {}, None, cfg)
    for sid in gt.shots:
        assert np.linalg.norm(
            rec.shots[sid].pose.get_origin() - gt.shots[sid].pose.get_origin()
        ) < 0.02
