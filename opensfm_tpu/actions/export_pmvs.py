"""Export to PMVS format (reference actions/export_pmvs.py):
visualize/, txt/ projection matrices, models/, options files."""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def run_dataset(data, points=False, image_list=None, output=None) -> None:
    base = output or os.path.join(data.data_path, "pmvs")
    os.makedirs(os.path.join(base, "visualize"), exist_ok=True)
    os.makedirs(os.path.join(base, "txt"), exist_ok=True)
    os.makedirs(os.path.join(base, "models"), exist_ok=True)

    reconstructions = data.load_reconstruction()
    if not reconstructions:
        return
    rec = reconstructions[0]

    import cv2

    index = 0
    indices = []
    for shot_id, shot in rec.shots.items():
        cam = shot.camera
        if cam.projection_type not in ("perspective", "brown", "radial",
                                       "simple_radial"):
            continue
        try:
            image = data.load_image(shot_id)
        except IOError:
            continue
        # P = K [R|t] in pixel conventions.
        K = cam.get_K_in_pixel_coordinates()
        Rt = shot.pose.get_Rt()
        P = K @ Rt
        cv2.imwrite(os.path.join(base, "visualize", "%08d.jpg" % index),
                    image[:, :, ::-1])
        with open(os.path.join(base, "txt", "%08d.txt" % index), "w") as f:
            f.write("CONTOUR\n")
            for row in P:
                f.write(" ".join(f"{v:.10g}" for v in row) + "\n")
        indices.append(index)
        index += 1

    with open(os.path.join(base, "pmvs_options.txt"), "w") as f:
        f.write("level 1\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n")
        f.write("CPU 8\nsetEdge 0\nuseBound 0\nuseVisData 0\nsequence -1\n")
        f.write("timages -1 0 %d\noimages 0\n" % index)
    logger.info("Exported %d images to PMVS at %s", index, base)
