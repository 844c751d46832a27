"""extract_metadata command shim (reference commands/extract_metadata.py)."""

from opensfm_tpu.actions import extract_metadata
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "extract_metadata"
    help = "extract metadata"

    def run_impl(self, dataset, args) -> None:
        extract_metadata.run_dataset(dataset)
