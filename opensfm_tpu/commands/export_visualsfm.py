"""export_visualsfm command shim (reference commands/export_visualsfm.py)."""

from opensfm_tpu.actions import export_visualsfm
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "export_visualsfm"
    help = "export visualsfm"

    def run_impl(self, dataset, args) -> None:
        export_visualsfm.run_dataset(dataset)
