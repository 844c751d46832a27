"""Dense depth tests: PatchMatch propagation + plane-sweep consistency.

Mirrors the reference's C++ depthmap tests (dense/test/) at the Python
surface: a synthetic textured slanted plane with known geometry."""

import numpy as np
import pytest

from opensfm_tpu.geometry.rotation import rotvec_to_matrix
from opensfm_tpu.ops.depthmap import patch_match_depthmap


def make_two_view_plane(H=64, W=64, f=0.85):
    """Textured plane z_w = 4 + 1.5 x_w seen from two pinhole views."""
    ys, xs = np.mgrid[0:H, 0:W]
    size = max(H, W)
    un = (xs - (W - 1) / 2) / size
    vn = (ys - (H - 1) / 2) / size
    rays = np.stack([un / f, vn / f, np.ones_like(un)], axis=-1)

    n = np.array([1.5, 0.0, -1.0])
    c = -4.0

    def depth_of_rays(R, t):
        o = -R.T @ t
        d_world = rays @ R
        return (c - o @ n) / (d_world @ n)

    def texture(Xw):
        return (
            0.5
            + 0.25 * np.sin(7 * Xw[..., 0])
            + 0.25 * np.cos(9 * Xw[..., 1] + 3 * Xw[..., 0])
        )

    R1, t1 = np.eye(3), np.zeros(3)
    R2 = np.asarray(rotvec_to_matrix(np.array([0.0, 0.05, 0.0])))
    t2 = np.array([-0.3, 0.0, 0.0])

    z1 = depth_of_rays(R1, t1)
    img1 = texture(rays * z1[..., None]).astype(np.float32)
    z2 = depth_of_rays(R2, t2)
    o2 = -R2.T @ t2
    img2 = texture(o2 + (rays @ R2) * z2[..., None]).astype(np.float32)
    return rays, img1, z1, (R1, t1), img2, (R2, t2), f


def test_patch_match_recovers_slanted_plane():
    rays, img1, z1, (R1, t1), img2, (R2, t2), f = make_two_view_plane()
    depth, nu, score, nghbr = patch_match_depthmap(
        img1, rays, R1, t1, [img2], [R2], [t2], [f],
        min_depth=2.0, max_depth=8.0, iterations=4, patch_size=7, seed=1,
    )
    hp = 6
    inner = np.s_[hp:-hp, hp:-hp]
    good = score[inner] > 0.7
    assert good.mean() > 0.7  # most pixels confidently matched
    rel_err = np.abs(depth[inner] - z1[inner]) / z1[inner]
    assert np.median(rel_err[good]) < 0.01
    assert (rel_err[good] < 0.05).mean() > 0.8
    assert np.all(nghbr == 0)


def test_patch_match_plane_normals():
    # The recovered nu field should encode the slanted plane: depth varies
    # along x but nu stays (roughly) constant on the plane.
    rays, img1, z1, (R1, t1), img2, (R2, t2), f = make_two_view_plane()
    depth, nu, score, _ = patch_match_depthmap(
        img1, rays, R1, t1, [img2], [R2], [t2], [f],
        min_depth=2.0, max_depth=8.0, iterations=4, patch_size=7, seed=1,
    )
    # nu . r = 1/z must hold at every confident pixel by construction.
    inv_z = np.einsum("hwc,hwc->hw", rays, nu)
    good = score > 0.7
    assert np.allclose(1.0 / depth[good], inv_z[good], rtol=1e-4)


def test_patch_match_low_variance_masked():
    rays, img1, z1, (R1, t1), img2, (R2, t2), f = make_two_view_plane()
    flat = np.full_like(img1, 0.5)  # textureless reference
    depth, _, score, _ = patch_match_depthmap(
        flat, rays, R1, t1, [img2], [R2], [t2], [f],
        min_depth=2.0, max_depth=8.0, iterations=1, patch_size=7, seed=1,
    )
    assert np.all(depth == 0.0)
    assert np.all(score == -1.0)


def test_prune_depthmap_carries_segmentation_labels(tmp_path):
    """Pruned depthmaps must carry the undistorted segmentation labels
    into the point cloud (reference dense.py:234-264,344-352 — rounds 1-3
    zeroed them)."""
    import yaml

    from opensfm_tpu import pymap, types
    from opensfm_tpu.dataset import DataSet, UndistortedDataSet
    from opensfm_tpu.dense import prune_depthmap
    from opensfm_tpu.geometry.cameras import Camera

    root = tmp_path / "segdense"
    (root / "images").mkdir(parents=True)
    (root / "config.yaml").write_text(yaml.safe_dump({}))
    data = DataSet(str(root))
    udata = UndistortedDataSet(
        data, str(root / "undistorted"), io_handler=data.io_handler
    )

    H, W = 24, 32
    cam = Camera.create_perspective(0.9, 0.0, 0.0)
    cam.id = "cam1"
    cam.width, cam.height = W, H
    rec = types.Reconstruction()
    rec.add_camera(cam)
    shot = rec.create_shot("im1.jpg", "cam1", pymap.Pose())

    depth = np.full((H, W), 2.0, dtype=np.float32)
    plane = np.tile(
        np.array([0.0, 0.0, -0.5], dtype=np.float32), (H, W, 1)
    )
    score = np.ones((H, W), dtype=np.float32)
    udata.save_clean_depthmap("im1.jpg", depth, plane, score)

    # Left half sky (label 2), right half road (label 7).
    seg = np.zeros((H, W), dtype=np.uint8)
    seg[:, : W // 2] = 2
    seg[:, W // 2:] = 7
    udata.save_undistorted_segmentation("im1.jpg", seg)

    prune_depthmap(udata, rec, [], "im1.jpg")
    points, normals, colors, labels = udata.load_pruned_depthmap("im1.jpg")
    assert len(points) > 0
    assert set(np.unique(labels)).issubset({2.0, 7.0})
    assert (labels == 2.0).any() and (labels == 7.0).any()
