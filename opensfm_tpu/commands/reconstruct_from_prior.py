"""reconstruct_from_prior command shim (reference commands/reconstruct_from_prior.py)."""

from opensfm_tpu.actions import reconstruct_from_prior
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "reconstruct_from_prior"
    help = "reconstruct from prior"

    def run_impl(self, dataset, args) -> None:
        reconstruct_from_prior.run_dataset(dataset)
