"""Subcommand dispatch (reference commands/command_runner.py:10-46)."""

from __future__ import annotations

import argparse
import logging
import sys


def command_runner(all_commands_types, dataset_factory=None) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s: %(message)s",
    )
    # Host-side geometry (pose chains, triangulation, LM bundle) carries the
    # reference's float64 contract; enable x64 before any jax import is used.
    # Device kernels that want f32/bf16 request those dtypes explicitly.
    import os

    import jax

    jax.config.update("jax_enable_x64", True)
    # Some platform plugins ignore the JAX_PLATFORMS env var during their
    # own registration; honor it explicitly so `JAX_PLATFORMS=cpu` always
    # pins the CLI to the host backend.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    parser = argparse.ArgumentParser(
        description="opensfm_tpu — TPU-native structure from motion"
    )
    subparsers = parser.add_subparsers(dest="command", help="Command to run")
    subparsers.required = True

    commands = (
        all_commands_types() if callable(all_commands_types) else all_commands_types
    )
    for command in commands:
        subparser = subparsers.add_parser(command.name, help=command.help)
        subparser.add_argument("dataset", help="dataset to process")
        command.add_arguments(subparser)

    args = parser.parse_args()

    if dataset_factory is None:
        from opensfm_tpu.dataset import DataSet

        def dataset_factory(a):
            return DataSet(a.dataset)

    for command in commands:
        if args.command == command.name:
            data = dataset_factory(args)
            command.run(data, args)
            break
