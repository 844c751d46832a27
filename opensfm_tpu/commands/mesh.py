"""mesh command shim (reference commands/mesh.py)."""

from opensfm_tpu.actions import mesh
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "mesh"
    help = "mesh"

    def run_impl(self, dataset, args) -> None:
        mesh.run_dataset(dataset)
