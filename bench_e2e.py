"""End-to-end wall-clock lane: seconds per pipeline stage on berlin
(invoked by bench.py in a subprocess on the CPU backend).

Prints one JSON line {stage: seconds, ..., "total": s}.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BERLIN = "/root/reference/data/berlin"


def main() -> None:
    import tempfile

    from opensfm_tpu.actions import (
        compute_depthmaps,
        create_tracks,
        detect_features,
        extract_metadata,
        match_features,
        mesh,
        reconstruct,
        undistort,
    )
    from opensfm_tpu.dataset import DataSet

    root = tempfile.mkdtemp(prefix="bench_e2e_berlin_")
    os.symlink(os.path.join(BERLIN, "images"), os.path.join(root, "images"))
    with open(os.path.join(BERLIN, "config.yaml")) as f:
        cfg = f.read()
    with open(os.path.join(root, "config.yaml"), "w") as f:
        f.write(cfg)
    gcp = os.path.join(BERLIN, "ground_control_points.json")
    if os.path.isfile(gcp):
        with open(gcp) as f:
            content = f.read()
        with open(os.path.join(root, "ground_control_points.json"), "w") as f:
            f.write(content)
    data = DataSet(root)

    from opensfm_tpu import context

    stages = [
        ("extract_metadata", extract_metadata),
        ("detect_features", detect_features),
        ("match_features", match_features),
        ("create_tracks", create_tracks),
        ("reconstruct", reconstruct),
        ("mesh", mesh),
        ("undistort", undistort),
        ("compute_depthmaps", compute_depthmaps),
    ]
    times = {}
    total = 0.0
    for name, action in stages:
        context.reset_dispatch_counts()
        t0 = time.time()
        action.run_dataset(data)
        dt = time.time() - t0
        times[name] = round(dt, 2)
        total += dt
        if name == "reconstruct":
            # Device-program dispatches inside the growth loop (VERDICT r3
            # item 4): candidate-batched resection cuts the ransac count.
            times["reconstruct_dispatches"] = context.dispatch_counts()
    times["total"] = round(total, 2)
    recs = data.load_reconstruction()
    times["shots"] = len(recs[0].shots) if recs else 0
    times["points"] = len(recs[0].points) if recs else 0
    print(json.dumps(times))


if __name__ == "__main__":
    main()
