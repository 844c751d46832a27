"""export_bundler command shim (reference commands/export_bundler.py)."""

from opensfm_tpu.actions import export_bundler
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "export_bundler"
    help = "export bundler"

    def run_impl(self, dataset, args) -> None:
        export_bundler.run_dataset(dataset)
