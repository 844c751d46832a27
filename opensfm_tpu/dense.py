"""Dense depth estimation: plane-sweep + consistency cleaning + merging.

Mirrors reference `opensfm/dense.py:15-506` + `pydense`
(dense/src/depthmap.cc): neighbor selection by track-angle score
(find_neighboring_images:415), depth range from point percentiles
(compute_depth_range:376), per-shot depth estimation, cross-view
consistency cleaning (DepthmapCleaner), pruning to a merged point cloud
(DepthmapPruner).

The estimator is the TPU-first redesign (SURVEY.md §7.2-5): instead of the
reference's sequential PatchMatch propagation, depth is swept over D
fronto-parallel planes; for every plane the neighbor image is warped
through the generic camera model (bearing-based, works for all 10
projection types) and scored with NCC computed by box-filter convolutions
— one [D, H, W] batched pipeline per neighbor, no data-dependent loops.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from opensfm_tpu import pymap, types
from opensfm_tpu.features import (
    denormalized_image_coordinates,
    normalized_image_coordinates,
)

logger = logging.getLogger(__name__)


def compute_depthmaps(data, udata, graph: pymap.TracksManager) -> None:
    """Compute depthmaps for all undistorted shots (dense.py:15-62)."""
    logger.info("Computing neighbors")
    config = udata.config
    processes = config.get("processes", 1)
    num_neighbors = config["depthmap_num_neighbors"]

    recs = udata.load_undistorted_reconstruction()
    if not recs:
        return
    reconstruction = recs[0]

    neighbors = {}
    common_tracks = common_tracks_double_dict(graph)
    for shot in reconstruction.shots.values():
        neighbors[shot.id] = find_neighboring_images(
            shot, common_tracks, reconstruction, num_neighbors
        )

    # Raw depthmaps.
    for shot in reconstruction.shots.values():
        if len(neighbors[shot.id]) <= 1:
            continue
        if udata.raw_depthmap_exists(shot.id):
            logger.info("Using precomputed raw depthmap %s", shot.id)
            continue
        logger.info("Computing depthmap for image %s", shot.id)
        compute_depthmap(udata, udata, reconstruction, neighbors[shot.id], shot.id)

    # Clean depthmaps.
    for shot in reconstruction.shots.values():
        if len(neighbors[shot.id]) <= 1:
            continue
        if udata.clean_depthmap_exists(shot.id):
            continue
        logger.info("Cleaning depthmap for image %s", shot.id)
        clean_depthmap(udata, reconstruction, neighbors[shot.id], shot.id)

    # Prune depthmaps.
    for shot in reconstruction.shots.values():
        if len(neighbors[shot.id]) <= 1:
            continue
        if udata.pruned_depthmap_exists(shot.id):
            continue
        logger.info("Pruning depthmap for image %s", shot.id)
        prune_depthmap(udata, reconstruction, neighbors[shot.id], shot.id)

    merge_depthmaps(udata, reconstruction)


def common_tracks_double_dict(
    tracks_manager: pymap.TracksManager,
) -> Dict[str, Dict[str, List[str]]]:
    """im1 -> im2 -> list of common track ids (dense.py helper)."""
    common = {}
    connectivity = tracks_manager.get_all_pairs_connectivity()
    tracks_per_pair: Dict[Tuple[str, str], List[str]] = {}
    for track_id in tracks_manager.get_track_ids():
        obs = sorted(tracks_manager.get_track_observations(track_id).keys())
        for i in range(len(obs)):
            for j in range(i + 1, len(obs)):
                tracks_per_pair.setdefault((obs[i], obs[j]), []).append(track_id)
    for (im1, im2), tracks in tracks_per_pair.items():
        common.setdefault(im1, {})[im2] = tracks
        common.setdefault(im2, {})[im1] = tracks
    return common


def find_neighboring_images(
    shot: pymap.Shot,
    common_tracks: Dict[str, Dict[str, List[str]]],
    reconstruction: types.Reconstruction,
    num_neighbors: int,
) -> List[str]:
    """Neighbors ranked by track-angle score (dense.py:415-442)."""
    theta_min = np.pi / 60
    theta_max = np.pi / 6
    ns = []
    C1 = shot.pose.get_origin()
    others = common_tracks.get(shot.id, {})
    for other_id, tracks in others.items():
        if other_id not in reconstruction.shots:
            continue
        other = reconstruction.shots[other_id]
        score = 0.0
        C2 = other.pose.get_origin()
        for track in tracks:
            if track in reconstruction.points:
                p = reconstruction.points[track].coordinates
                theta = angle_between_points(p, C1, C2)
                if theta_min < theta < theta_max:
                    score += 1.0
        if score > 20:
            ns.append((other, score))
    ns.sort(key=lambda ns: ns[1], reverse=True)
    return [shot.id] + [n.id for n, s in ns[:num_neighbors]]


def angle_between_points(origin, p1, p2) -> float:
    a0 = p1[0] - origin[0]
    a1 = p1[1] - origin[1]
    a2 = p1[2] - origin[2]
    b0 = p2[0] - origin[0]
    b1 = p2[1] - origin[1]
    b2 = p2[2] - origin[2]
    dot = a0 * b0 + a1 * b1 + a2 * b2
    la = a0 * a0 + a1 * a1 + a2 * a2
    lb = b0 * b0 + b1 * b1 + b2 * b2
    if la <= 0 or lb <= 0:
        return 0.0
    return float(np.arccos(np.clip(dot / np.sqrt(la * lb), -1.0, 1.0)))


def compute_depth_range(
    reconstruction: types.Reconstruction, shot: pymap.Shot, config
) -> Tuple[float, float]:
    """Depth range from reconstructed point percentiles (dense.py:376-400)."""
    depths = []
    for point in reconstruction.points.values():
        v = point.coordinates - shot.pose.get_origin()
        depth = shot.pose.get_rotation_matrix()[2] @ v
        if depth > 0:
            depths.append(depth)
    if not depths:
        return 1.0, 40.0
    min_depth = np.percentile(depths, 10) * 0.9
    max_depth = np.percentile(depths, 90) * 1.1
    config_min_depth = config["depthmap_min_depth"]
    config_max_depth = config["depthmap_max_depth"]
    return (
        config_min_depth or float(min_depth),
        config_max_depth or float(max_depth),
    )


def _scaled_gray(udata, reconstruction, shot_id: str, width: int):
    """Grayscale undistorted image scaled to the depthmap resolution."""
    import cv2

    image = udata.load_undistorted_image(shot_id)
    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
    h, w = gray.shape
    scale = width / w
    new_w, new_h = width, max(int(round(h * scale)), 1)
    gray = cv2.resize(gray, (new_w, new_h), interpolation=cv2.INTER_AREA)
    color = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_AREA)
    return gray, color


def plane_sweep_depthmap(
    ref_gray: np.ndarray,
    ref_shot: pymap.Shot,
    neighbor_grays: List[np.ndarray],
    neighbor_shots: List[pymap.Shot],
    min_depth: float,
    max_depth: float,
    num_depth_planes: int = 50,
    patch_size: int = 7,
    min_patch_variance: float = 1e-5,
):
    """Sweep D fronto-parallel planes, score NCC against each neighbor
    (the ComputeBruteForce equivalent, depthmap.cc:184)."""
    import jax
    import jax.numpy as jnp

    H, W = ref_gray.shape
    # Reference pixel bearings in world frame + origin.
    ys, xs = np.mgrid[0:H, 0:W]
    px = np.column_stack([xs.ravel(), ys.ravel()]).astype(np.float64)
    norm = normalized_image_coordinates(px, W, H)
    bearings_cam = ref_shot.camera.bearings_many(norm)
    R_ref = ref_shot.pose.get_rotation_matrix()
    o_ref = ref_shot.pose.get_origin()
    bearings_world = bearings_cam @ R_ref  # R^T b
    # Normalize by z in camera frame so depth = z-depth.
    z_cam = bearings_cam[:, 2:3]
    bearings_world = bearings_world / z_cam
    depths = 1.0 / np.linspace(1.0 / max_depth, 1.0 / min_depth, num_depth_planes)

    half = patch_size // 2

    def boxf(x):
        k = jnp.ones((patch_size, patch_size), dtype=x.dtype) / (patch_size**2)
        return jax.lax.conv_general_dilated(
            x[None, None], k[None, None], (1, 1), [(half, half), (half, half)]
        )[0, 0]

    ref = jnp.asarray(ref_gray)
    ref_mean = boxf(ref)
    ref_var = boxf(ref * ref) - ref_mean * ref_mean

    best_score = jnp.full((H, W), -1.0, dtype=jnp.float32)
    best_depth = jnp.zeros((H, W), dtype=jnp.float32)
    best_nghbr = jnp.zeros((H, W), dtype=jnp.int32)

    for n_i, (ngray, nshot) in enumerate(zip(neighbor_grays, neighbor_shots)):
        nH, nW = ngray.shape
        R_n = nshot.pose.get_rotation_matrix()
        t_n = nshot.pose.translation
        # Precompute warp coordinates per depth on the host (generic camera
        # model); sampling + scoring run on device.
        maps = np.zeros((num_depth_planes, H * W, 2), dtype=np.float32)
        for d_i, d in enumerate(depths):
            X = o_ref[None, :] + bearings_world * d
            Xc = X @ R_n.T + t_n
            uv = nshot.camera.project_many(Xc)
            npx = denormalized_image_coordinates(uv, nW, nH)
            behind = Xc[:, 2] <= 0
            npx[behind] = -1e6
            maps[d_i] = npx.astype(np.float32)

        nimg = jnp.asarray(ngray)

        def score_plane(mapd):
            x = mapd[:, 0].reshape(H, W)
            y = mapd[:, 1].reshape(H, W)
            x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nW - 2)
            y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, nH - 2)
            fx = jnp.clip(x - x0, 0.0, 1.0)
            fy = jnp.clip(y - y0, 0.0, 1.0)
            warped = (
                nimg[y0, x0] * (1 - fy) * (1 - fx)
                + nimg[y0, x0 + 1] * (1 - fy) * fx
                + nimg[y0 + 1, x0] * fy * (1 - fx)
                + nimg[y0 + 1, x0 + 1] * fy * fx
            )
            inside = (x >= 0) & (x < nW - 1) & (y >= 0) & (y < nH - 1)
            warped = jnp.where(inside, warped, 0.0)
            wmean = boxf(warped)
            wvar = boxf(warped * warped) - wmean * wmean
            cov = boxf(ref * warped) - ref_mean * wmean
            ncc = cov / jnp.sqrt(
                jnp.maximum(ref_var * wvar, min_patch_variance**2)
            )
            return jnp.where(inside, ncc, -1.0)

        scores = jax.lax.map(score_plane, jnp.asarray(maps))  # [D,H,W]
        plane_best = jnp.argmax(scores, axis=0)
        plane_score = jnp.max(scores, axis=0)
        better = plane_score > best_score
        best_depth = jnp.where(
            better, jnp.asarray(depths, dtype=jnp.float32)[plane_best], best_depth
        )
        best_score = jnp.where(better, plane_score, best_score)
        best_nghbr = jnp.where(better, n_i, best_nghbr)

    return (
        np.asarray(best_depth),
        np.asarray(best_score),
        np.asarray(best_nghbr),
    )


def compute_depthmap(arguments_or_udata, udata, reconstruction, neighbors, shot_id):
    """Raw depthmap for one shot (dense.py:95-167).

    Dispatches on config depthmap_method: PATCH_MATCH / PATCH_MATCH_SAMPLE
    run the checkerboard PatchMatch (ops/depthmap.py — SAMPLE's random
    single-neighbor scoring collapses into the batched max-over-neighbors,
    which strictly dominates it); BRUTE_FORCE runs the fronto-parallel
    plane sweep."""
    config = udata.config
    shot = reconstruction.shots[shot_id]
    width = int(config["depthmap_resolution"])

    min_depth, max_depth = compute_depth_range(reconstruction, shot, config)

    ref_gray, _ = _scaled_gray(udata, reconstruction, shot_id, width)
    neighbor_grays, neighbor_shots = [], []
    for n_id in neighbors[1:]:
        try:
            g, _ = _scaled_gray(udata, reconstruction, n_id, width)
        except IOError:
            continue
        neighbor_grays.append(g)
        neighbor_shots.append(reconstruction.shots[n_id])
    if not neighbor_grays:
        return

    method = str(config.get("depthmap_method", "PATCH_MATCH_SAMPLE")).upper()
    if method in ("PATCH_MATCH", "PATCH_MATCH_SAMPLE"):
        depth, plane, score, nghbr = _patch_match(
            ref_gray, shot, neighbor_grays, neighbor_shots,
            min_depth, max_depth, config,
        )
    else:  # BRUTE_FORCE
        depth, score, nghbr = plane_sweep_depthmap(
            ref_gray, shot, neighbor_grays, neighbor_shots, min_depth,
            max_depth, patch_size=int(config["depthmap_patch_size"]),
        )
        # Fronto-parallel plane per pixel: n = -z in camera coords.
        H, W = depth.shape
        plane = np.zeros((H, W, 3), dtype=np.float32)
        plane[..., 2] = np.where(
            depth > 0, -1.0 / np.maximum(depth, 1e-6), 0.0
        )

    good = score > config["depthmap_min_correlation_score"]
    depth = depth * good

    udata.save_raw_depthmap(shot_id, depth, plane, score, nghbr, neighbors)


def _patch_match(ref_gray, shot, neighbor_grays, neighbor_shots,
                 min_depth, max_depth, config):
    """Adapter: shots -> ray grids / relative poses for ops.depthmap."""
    from opensfm_tpu.ops.depthmap import patch_match_depthmap

    H, W = ref_gray.shape
    ys, xs = np.mgrid[0:H, 0:W]
    px = np.column_stack([xs.ravel(), ys.ravel()]).astype(np.float64)
    norm = normalized_image_coordinates(px, W, H)
    bearings = shot.camera.bearings_many(norm)
    rays = (bearings / bearings[:, 2:3]).reshape(H, W, 3)

    depth, nu, score, nghbr = patch_match_depthmap(
        ref_gray, rays,
        shot.pose.get_rotation_matrix(), np.asarray(shot.pose.translation),
        neighbor_grays,
        [s.pose.get_rotation_matrix() for s in neighbor_shots],
        [np.asarray(s.pose.translation) for s in neighbor_shots],
        [float(s.camera.focal) for s in neighbor_shots],
        float(min_depth), float(max_depth),
        iterations=int(config.get("depthmap_patchmatch_iterations", 3)),
        patch_size=int(config["depthmap_patch_size"]),
    )
    return depth, nu.astype(np.float32), score, nghbr


def clean_depthmap(udata, reconstruction, neighbors, shot_id) -> None:
    """Cross-view consistency filter (dense.py:170-213, DepthmapCleaner)."""
    config = udata.config
    same_depth_threshold = config["depthmap_same_depth_threshold"]
    min_consistent = config["depthmap_min_consistent_views"]

    depth, plane, score, nghbr, nbrs = udata.load_raw_depthmap(shot_id)
    shot = reconstruction.shots[shot_id]
    H, W = depth.shape

    # Project each pixel into the neighbors' raw depthmaps and count
    # depth-consistent views.
    ys, xs = np.mgrid[0:H, 0:W]
    px = np.column_stack([xs.ravel(), ys.ravel()]).astype(np.float64)
    norm = normalized_image_coordinates(px, W, H)
    bearings_cam = shot.camera.bearings_many(norm)
    z = bearings_cam[:, 2:3]
    R_ref = shot.pose.get_rotation_matrix()
    o_ref = shot.pose.get_origin()
    dirs_world = (bearings_cam / z) @ R_ref

    consistent = np.ones((H * W,), dtype=np.int32)
    d_flat = depth.reshape(-1)
    valid = d_flat > 0
    X = o_ref[None, :] + dirs_world * d_flat[:, None]

    for n_id in nbrs[1:]:
        n_id = str(n_id)
        if n_id not in reconstruction.shots or not udata.raw_depthmap_exists(n_id):
            continue
        ndepth = udata.load_raw_depthmap(n_id)[0]
        nshot = reconstruction.shots[n_id]
        nH, nW = ndepth.shape
        Xc = X @ nshot.pose.get_rotation_matrix().T + nshot.pose.translation
        uv = nshot.camera.project_many(Xc)
        npx = denormalized_image_coordinates(uv, nW, nH)
        xs_n = np.round(npx[:, 0]).astype(int)
        ys_n = np.round(npx[:, 1]).astype(int)
        inside = (
            (xs_n >= 0) & (xs_n < nW) & (ys_n >= 0) & (ys_n < nH) & (Xc[:, 2] > 0)
        )
        idx = np.where(inside)[0]
        dn = ndepth[ys_n[idx], xs_n[idx]]
        agree = np.abs(dn - Xc[idx, 2]) < same_depth_threshold * Xc[idx, 2]
        consistent[idx[agree & (dn > 0)]] += 1

    keep = valid & (consistent >= min_consistent)
    clean = np.where(keep, d_flat, 0.0).reshape(H, W).astype(np.float32)
    udata.save_clean_depthmap(shot_id, clean, plane, score)


def prune_depthmap(udata, reconstruction, neighbors, shot_id) -> None:
    """Subsample to world points + normals + colors (dense.py:216-265)."""
    depth, plane, score = udata.load_clean_depthmap(shot_id)
    shot = reconstruction.shots[shot_id]
    H, W = depth.shape

    step = 2  # subsampling as DepthmapPruner
    ys, xs = np.mgrid[0:H:step, 0:W:step]
    d = depth[::step, ::step].reshape(-1)
    valid = d > 0
    px = np.column_stack([xs.ravel(), ys.ravel()]).astype(np.float64)[valid]
    d = d[valid]
    if len(d) == 0:
        udata.save_pruned_depthmap(
            shot_id, np.zeros((0, 3)), np.zeros((0, 3)),
            np.zeros((0, 3)), np.zeros((0,)),
        )
        return
    norm = normalized_image_coordinates(px, W, H)
    bearings_cam = shot.camera.bearings_many(norm)
    z = bearings_cam[:, 2:3]
    R_ref = shot.pose.get_rotation_matrix()
    o_ref = shot.pose.get_origin()
    points = o_ref[None, :] + (bearings_cam / z) @ R_ref * d[:, None]

    # Normals from the per-pixel plane vectors (PatchMatch slanted planes;
    # the plane-sweep writes fronto-parallel nu = (0, 0, -1/d), which lands
    # on -z).  Camera-frame n ~ nu normalized toward the camera, then
    # rotated to world: n_world = R^T n_cam.
    nu = plane[::step, ::step].reshape(-1, 3)[valid]
    nu_norm = np.linalg.norm(nu, axis=1, keepdims=True)
    n_cam = np.divide(
        nu, nu_norm, out=np.tile([[0.0, 0.0, -1.0]], (len(nu), 1)),
        where=nu_norm > 1e-12,
    )
    # Orient toward the camera (nz < 0 in camera frame).
    flip = n_cam[:, 2] > 0
    n_cam[flip] = -n_cam[flip]
    normals = n_cam @ R_ref

    try:
        image = udata.load_undistorted_image(shot_id)
        import cv2

        img = cv2.resize(image, (W, H), interpolation=cv2.INTER_AREA)
        colors = img[py_int(px[:, 1]), py_int(px[:, 0])]
    except IOError:
        colors = np.full((len(points), 3), 128)

    # Semantic labels ride into the pruned cloud and the merged PLY
    # (reference dense.py:344-352 load_segmentation_labels + :356-374
    # add_views_to_depth_pruner; zeros when no segmentation exists).
    labels = np.zeros(len(points))
    if udata.undistorted_segmentation_exists(shot_id):
        seg = udata.load_undistorted_segmentation(shot_id)
        if seg is not None:
            import cv2

            seg = cv2.resize(
                np.asarray(seg), (W, H), interpolation=cv2.INTER_NEAREST
            )
            labels = seg[py_int(px[:, 1]), py_int(px[:, 0])].astype(
                np.float64
            )
    udata.save_pruned_depthmap(shot_id, points, normals, colors, labels)


def py_int(a: np.ndarray) -> np.ndarray:
    return np.clip(np.round(a).astype(int), 0, None)


def merge_depthmaps(udata, reconstruction) -> None:
    """Merge pruned depthmaps into merged.ply (dense.py:268-295)."""
    shot_ids = [
        s for s in reconstruction.shots if udata.pruned_depthmap_exists(s)
    ]
    if not shot_ids:
        logger.warning("Depthmaps contain no points.  Try using more images.")
        return
    points, normals, colors, labels = [], [], [], []
    for shot_id in shot_ids:
        p, n, c, l = udata.load_pruned_depthmap(shot_id)
        points.append(p)
        normals.append(n)
        colors.append(c)
        labels.append(l)
    udata.save_point_cloud(
        np.concatenate(points), np.concatenate(normals),
        np.concatenate(colors), np.concatenate(labels), "merged.ply",
    )
    logger.info("Merged depthmaps into %s", udata.point_cloud_file())
