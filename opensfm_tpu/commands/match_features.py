"""match_features command shim (reference commands/match_features.py)."""

from opensfm_tpu.actions import match_features
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "match_features"
    help = "match features"

    def run_impl(self, dataset, args) -> None:
        match_features.run_dataset(dataset)
