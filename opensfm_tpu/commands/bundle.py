"""bundle command shim (reference commands/bundle.py)."""

from opensfm_tpu.actions import bundle
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "bundle"
    help = "bundle"

    def run_impl(self, dataset, args) -> None:
        bundle.run_dataset(dataset)
