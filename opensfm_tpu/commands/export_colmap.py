"""export_colmap command shim (reference commands/export_colmap.py)."""

from opensfm_tpu.actions import export_colmap
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "export_colmap"
    help = "export colmap"

    def run_impl(self, dataset, args) -> None:
        export_colmap.run_dataset(dataset)
