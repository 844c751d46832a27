"""Generate the committed lund self-golden (VERDICT r2 item 5/missing 6).

Runs the CI-configured lund pipeline (tests/test_commands_lund.py settings)
and saves the reconstructed shot origins + per-shot rotations to
`data/lund/reconstruction.golden.json` in the repo.  The regression test
(tests/test_commands_lund.py::test_lund_golden_ate) aligns fresh runs
against this artifact and bounds the ATE drift — lund ships no reference
reconstruction and the reference C++ cannot be built in this environment,
so a self-golden with a regression bound is the strongest check available
(see BASELINE.md).

Run: python tools/make_lund_golden.py [--out data/lund/reconstruction.golden.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Mirror the CI environment exactly (tests/conftest.py): CPU backend with
# x64 — the golden must be the same numerics CI reproduces.  (A first cut
# accidentally ran on the tunneled TPU in f32 and chained only 24/29
# shots.)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_lund(tmp_root: str):
    import yaml

    from opensfm_tpu.actions import (
        create_tracks,
        detect_features,
        extract_metadata,
        match_features,
        reconstruct,
    )
    from opensfm_tpu.dataset import DataSet

    os.makedirs(tmp_root, exist_ok=True)
    images = os.path.join(tmp_root, "images")
    if not os.path.exists(images):
        os.symlink("/root/reference/data/lund/images", images)
    # EXACTLY the CI config (tests/test_commands_lund.py) so the golden
    # matches what CI reproduces.
    config = {
        "feature_process_size": 800,
        "feature_min_frames": 3000,
        "processes": 2,
        "matching_gps_neighbors": 8,
        "matching_gps_distance": 0,
        "matching_vlad_neighbors": 6,
        "matching_vlad_other_cameras": True,
        "matching_order_neighbors": 2,
    }
    with open(os.path.join(tmp_root, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    data = DataSet(tmp_root)
    extract_metadata.run_dataset(data)
    detect_features.run_dataset(data)
    match_features.run_dataset(data)
    create_tracks.run_dataset(data)
    reconstruct.run_dataset(data)
    return data


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(REPO, "opensfm_tpu", "data", "lund",
                             "reconstruction.golden.json"),
    )
    ap.add_argument("--workdir", default="/tmp/lund_golden")
    args = ap.parse_args()

    data = run_lund(args.workdir)
    recs = data.load_reconstruction()
    largest = max(recs, key=lambda r: len(r.shots))
    golden = {
        "n_shots": len(largest.shots),
        "n_points": len(largest.points),
        "shots": {
            sid: {
                "origin": [round(float(v), 6)
                           for v in shot.pose.get_origin()],
                "rotation": [round(float(v), 8)
                             for v in shot.pose.rotation],
            }
            for sid, shot in largest.shots.items()
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}: {golden['n_shots']} shots, "
          f"{golden['n_points']} points")


if __name__ == "__main__":
    main()
