"""export_ply command shim (reference commands/export_ply.py)."""

from opensfm_tpu.actions import export_ply
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "export_ply"
    help = "export ply"

    def run_impl(self, dataset, args) -> None:
        export_ply.run_dataset(dataset)
