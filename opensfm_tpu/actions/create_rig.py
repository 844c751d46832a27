"""Pattern-based rig creation + calibration
(reference actions/create_rig.py)."""

import json
import logging

from opensfm_tpu import rig

logger = logging.getLogger(__name__)


def run_dataset(data, method: str = "camera", definition=None,
                output_debug: bool = False) -> None:
    """`definition` maps rig camera id -> filename regex pattern."""
    if definition is None:
        raise ValueError("Rig creation requires a pattern definition")
    if isinstance(definition, str):
        definition = json.loads(definition)
    rig.create_rigs_with_pattern(data, definition)
