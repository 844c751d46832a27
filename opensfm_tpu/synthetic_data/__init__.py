"""Synthetic scenes + noisy input synthesis — the hermetic test backbone.

Mirrors reference `opensfm/synthetic_data/` (SURVEY.md §4.1): procedural
ground-truth reconstructions, noisy EXIF/projection/GCP generation, an
in-memory DataSet and metric comparison machinery.
"""

from opensfm_tpu.synthetic_data.synthetic_scene import (  # noqa: F401
    SyntheticCubeScene,
    SyntheticInputData,
    SyntheticStreetScene,
    compare,
    get_camera,
    get_scene_generator,
)
from opensfm_tpu.synthetic_data.synthetic_dataset import (  # noqa: F401
    SyntheticDataSet,
)
