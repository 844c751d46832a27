"""detect_features command shim (reference commands/detect_features.py)."""

from opensfm_tpu.actions import detect_features
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "detect_features"
    help = "detect features"

    def run_impl(self, dataset, args) -> None:
        detect_features.run_dataset(dataset)
