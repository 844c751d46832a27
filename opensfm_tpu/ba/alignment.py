"""Submodel pose-graph alignment (the ReconstructionAlignment problem).

Mirrors reference `bundle/reconstruction_alignment.h:30-460`: per-submodel
similarities (rx,ry,rz,tx,ty,tz,scale) + per-shot poses, with relative
motion, absolute GPS position, common-camera and common-point constraints,
solved with a small dense Levenberg-Marquardt in JAX (vmapped residual
blocks, jacfwd Jacobian).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from opensfm_tpu.ops import linalg as tpu_linalg

logger = logging.getLogger(__name__)


class RARelativeMotionConstraint:
    """Observed pose of a shot in a reconstruction's frame
    (reconstruction_alignment.h:70-120)."""

    def __init__(self, reconstruction, shot, rx, ry, rz, tx, ty, tz):
        self.reconstruction_id = reconstruction
        self.shot_id = shot
        self.parameters = np.array([rx, ry, rz, tx, ty, tz], dtype=np.float64)
        self.scale_matrix = np.eye(6)

    def set_scale_matrix(self, i, j, value) -> None:
        self.scale_matrix[i, j] = value


class _RAEntity:
    def __init__(self, id_, parameters, constant):
        self.id = id_
        self.parameters = np.asarray(parameters, dtype=np.float64)
        self.constant = constant


class _RAResult:
    """Attribute view over optimized parameters (rx...scale / rx...tz)."""

    def __init__(self, params):
        self.rx, self.ry, self.rz = params[0:3]
        self.tx, self.ty, self.tz = params[3:6]
        if len(params) > 6:
            self.scale = params[6]


class ReconstructionAlignment:
    """Pose-graph problem builder + solver (reconstruction_alignment.h:369)."""

    def __init__(self) -> None:
        self._recs: Dict[str, _RAEntity] = {}
        self._shots: Dict[str, _RAEntity] = {}
        self._relative_motions: List[RARelativeMotionConstraint] = []
        self._absolute_positions: List[Tuple[str, np.ndarray, float]] = []
        self._common_points: List[Tuple[str, np.ndarray, str, np.ndarray, float]] = []
        self._common_cameras: List[Tuple[str, str, str, str, float]] = []
        self._report = ""

    # -- construction API (pybundle names) ----------------------------------
    def add_reconstruction(self, id_, rx, ry, rz, tx, ty, tz, scale, constant):
        self._recs[id_] = _RAEntity(
            id_, [rx, ry, rz, tx, ty, tz, scale], constant
        )

    def add_shot(self, id_, rx, ry, rz, tx, ty, tz, constant):
        self._shots[id_] = _RAEntity(id_, [rx, ry, rz, tx, ty, tz], constant)

    def add_relative_motion_constraint(self, rm: RARelativeMotionConstraint):
        self._relative_motions.append(rm)

    def add_absolute_position_constraint(self, shot_id, x, y, z, std_deviation):
        self._absolute_positions.append(
            (shot_id, np.array([x, y, z], dtype=np.float64), float(std_deviation))
        )

    def add_common_point_constraint(self, rec1, x1, y1, z1, rec2, x2, y2, z2, std):
        self._common_points.append(
            (
                rec1, np.array([x1, y1, z1], dtype=np.float64),
                rec2, np.array([x2, y2, z2], dtype=np.float64), float(std),
            )
        )

    def add_common_camera_constraint(
        self, rec1, shot1, rec2, shot2, std_deviation
    ):
        self._common_cameras.append((rec1, shot1, rec2, shot2, float(std_deviation)))

    def get_reconstruction(self, id_) -> _RAResult:
        return _RAResult(self._recs[id_].parameters)

    def get_shot(self, id_) -> _RAResult:
        return _RAResult(self._shots[id_].parameters)

    def brief_report(self) -> str:
        return self._report

    # -- solve ---------------------------------------------------------------
    def run(self, max_iterations: int = 50) -> None:
        import jax
        import jax.numpy as jnp

        from opensfm_tpu.geometry import rotation as rot

        rec_ids = list(self._recs)
        shot_ids = list(self._shots)
        rec_index = {r: i for i, r in enumerate(rec_ids)}
        shot_index = {s: i for i, s in enumerate(shot_ids)}
        nr, ns = len(rec_ids), len(shot_ids)
        if nr == 0 and ns == 0:
            return

        rec0 = np.array([self._recs[r].parameters for r in rec_ids])
        shot0 = (
            np.array([self._shots[s].parameters for s in shot_ids])
            if ns
            else np.zeros((0, 6))
        )
        rec_const = np.array([self._recs[r].constant for r in rec_ids])
        shot_const = (
            np.array([self._shots[s].constant for s in shot_ids])
            if ns
            else np.zeros(0, dtype=bool)
        )

        # Constraint arrays.
        rm_rec = np.array(
            [rec_index[c.reconstruction_id] for c in self._relative_motions],
            dtype=np.int32,
        )
        rm_shot = np.array(
            [shot_index[c.shot_id] for c in self._relative_motions], dtype=np.int32
        )
        rm_params = np.array([c.parameters for c in self._relative_motions])
        rm_scale = np.array([c.scale_matrix for c in self._relative_motions])

        ap_shot = np.array(
            [shot_index[s] for s, _, _ in self._absolute_positions], dtype=np.int32
        )
        ap_pos = np.array([p for _, p, _ in self._absolute_positions]).reshape(-1, 3)
        ap_inv = np.array([1.0 / s for _, _, s in self._absolute_positions])

        cp_rec1 = np.array(
            [rec_index[a] for a, _, _, _, _ in self._common_points], dtype=np.int32
        )
        cp_p1 = np.array([p for _, p, _, _, _ in self._common_points]).reshape(-1, 3)
        cp_rec2 = np.array(
            [rec_index[b] for _, _, b, _, _ in self._common_points], dtype=np.int32
        )
        cp_p2 = np.array([p for _, _, _, p, _ in self._common_points]).reshape(-1, 3)
        cp_inv = np.array([1.0 / s for _, _, _, _, s in self._common_points])

        cc_rec1 = np.array(
            [rec_index[a] for a, _, _, _, _ in self._common_cameras], dtype=np.int32
        )
        cc_shot1 = np.array(
            [shot_index[s] for _, s, _, _, _ in self._common_cameras], dtype=np.int32
        )
        cc_rec2 = np.array(
            [rec_index[b] for _, _, b, _, _ in self._common_cameras], dtype=np.int32
        )
        cc_shot2 = np.array(
            [shot_index[s] for _, _, _, s, _ in self._common_cameras], dtype=np.int32
        )
        cc_inv = np.array([1.0 / s for _, _, _, _, s in self._common_cameras])

        def compose_rotvec(ra, rb):
            """rotvec of R(ra) @ R(rb)."""
            Ra = rot.rotvec_to_matrix(ra)
            Rb = rot.rotvec_to_matrix(rb)
            return rot.matrix_to_rotvec(Ra @ Rb)

        def residuals(theta):
            recs = theta[: nr * 7].reshape(nr, 7)
            shots = theta[nr * 7 :].reshape(ns, 6) if ns else jnp.zeros((0, 6))
            out = []

            if len(rm_rec):
                def rm_res(ri, si, prm, sm):
                    rec = recs[ri]
                    shot = shots[si]
                    Ra, ta, sa = rec[0:3], rec[3:6], rec[6]
                    Ri, ti = shot[0:3], shot[3:6]
                    Rai, tai = prm[0:3], prm[3:6]
                    # rotation residual: log(Rai Ra Ri^T)
                    r_rot = compose_rotvec(Rai, compose_rotvec(Ra, -Ri))
                    # center residual: Rai^T tai - sa Ra Ri^T ti + ta
                    r_t = (
                        rot.rotate(-Rai, tai)
                        - sa * rot.rotate(Ra, rot.rotate(-Ri, ti))
                        + ta
                    )
                    r6 = jnp.concatenate([r_rot, r_t])
                    return sm @ r6

                out.append(
                    jax.vmap(rm_res)(
                        jnp.asarray(rm_rec), jnp.asarray(rm_shot),
                        jnp.asarray(rm_params), jnp.asarray(rm_scale),
                    ).reshape(-1)
                )

            if len(ap_shot):
                def ap_res(si, pos, inv):
                    shot = shots[si]
                    origin = -rot.rotate(-shot[0:3], shot[3:6])
                    return (pos - origin) * inv

                out.append(
                    jax.vmap(ap_res)(
                        jnp.asarray(ap_shot), jnp.asarray(ap_pos),
                        jnp.asarray(ap_inv),
                    ).reshape(-1)
                )

            def transform_point(rec, p):
                # R^T ((p - t) / s)  (reconstruction_alignment.h:226-236)
                R, t, s = rec[0:3], rec[3:6], rec[6]
                return rot.rotate(-R, (p - t) / s)

            if len(cp_rec1):
                def cp_res(r1, p1, r2, p2, inv):
                    return (
                        transform_point(recs[r1], p1)
                        - transform_point(recs[r2], p2)
                    ) * inv

                out.append(
                    jax.vmap(cp_res)(
                        jnp.asarray(cp_rec1), jnp.asarray(cp_p1),
                        jnp.asarray(cp_rec2), jnp.asarray(cp_p2),
                        jnp.asarray(cp_inv),
                    ).reshape(-1)
                )

            if len(cc_rec1):
                def cc_res(r1, s1, r2, s2, inv):
                    # Common camera: world origins through each submodel's
                    # similarity must agree.
                    def origin_world(rec, shot):
                        o = -rot.rotate(-shot[0:3], shot[3:6])
                        R, t, s = rec[0:3], rec[3:6], rec[6]
                        return rot.rotate(-R, (o - t) / s)

                    return (
                        origin_world(recs[r1], shots[s1])
                        - origin_world(recs[r2], shots[s2])
                    ) * inv

                out.append(
                    jax.vmap(cc_res)(
                        jnp.asarray(cc_rec1), jnp.asarray(cc_shot1),
                        jnp.asarray(cc_rec2), jnp.asarray(cc_shot2),
                        jnp.asarray(cc_inv),
                    ).reshape(-1)
                )

            return jnp.concatenate(out) if out else jnp.zeros(1)

        # Fixed-parameter mask.
        mask = np.ones(nr * 7 + ns * 6)
        for i, const in enumerate(rec_const):
            if const:
                mask[i * 7 : (i + 1) * 7] = 0.0
        for i, const in enumerate(shot_const):
            if const:
                mask[nr * 7 + i * 6 : nr * 7 + (i + 1) * 6] = 0.0
        mask_j = jnp.asarray(mask)

        theta = jnp.asarray(
            np.concatenate([rec0.reshape(-1), shot0.reshape(-1)])
        )

        @jax.jit
        def lm_step(theta, lam):
            r = residuals(theta)
            J = jax.jacfwd(residuals)(theta) * mask_j[None, :]
            H = J.T @ J
            g = J.T @ r
            H = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-9 * jnp.eye(H.shape[0])
            step = tpu_linalg.solve_spd(H, g)
            return theta - step * mask_j, 0.5 * jnp.sum(r * r)

        @jax.jit
        def cost_of(theta):
            r = residuals(theta)
            return 0.5 * jnp.sum(r * r)

        cost = float(cost_of(theta))
        initial_cost = cost
        lam = 1e-4
        for _ in range(max_iterations):
            new_theta, _ = lm_step(theta, jnp.asarray(lam))
            new_cost = float(cost_of(new_theta))
            if np.isfinite(new_cost) and new_cost < cost:
                rel = (cost - new_cost) / max(cost, 1e-30)
                theta, cost = new_theta, new_cost
                lam = max(lam / 3, 1e-12)
                if rel < 1e-12:
                    break
            else:
                lam = min(lam * 10, 1e8)
                if lam >= 1e8:
                    break

        theta = np.asarray(theta)
        for i, rid in enumerate(rec_ids):
            self._recs[rid].parameters = theta[i * 7 : (i + 1) * 7]
        for i, sid in enumerate(shot_ids):
            self._shots[sid].parameters = theta[
                nr * 7 + i * 6 : nr * 7 + (i + 1) * 6
            ]
        self._report = (
            f"ReconstructionAlignment: cost {initial_cost:.4g} -> {cost:.4g}"
        )
