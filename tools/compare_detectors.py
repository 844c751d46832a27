"""Detector parity vs the reference's real HAHOG output (VERDICT item 8).

The reference repo commits `data/berlin/tracks_example.csv`, produced by its
own C++ HAHOG (VLFeat covdet, src/features/src/hahog.cc) + matching +
tracking on berlin.  Those tracked keypoints are exactly the features that
matter downstream, in the reference's normalized image coordinates — a
ground-truth target for detector parity that needs no C++ build.

For each detector (HAHOG = multi-scale Hessian w/ dual orientations, and
DoG) this script reports, per berlin image:
  - coverage@r: fraction of reference tracked keypoints with one of our
    keypoints within r (normalized units; r=0.004 ~ 8 px at 2048 px)
  - median nearest-neighbour distance to our keypoint set
  - our keypoint count

Usage: python tools/compare_detectors.py [--size 2048] [--count 4000]
Prints a markdown table for docs/RESULTS.md.
"""

import argparse
import csv
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BERLIN = "/root/reference/data/berlin"


def load_reference_keypoints():
    """Per-image reference HAHOG keypoints from tracks_example.csv
    (normalized x, y; tracks v2 columns: image, track, feat, x, y, scale,
    r, g, b, seg, inst)."""
    per_image = defaultdict(list)
    with open(os.path.join(BERLIN, "tracks_example.csv")) as f:
        version = f.readline()
        assert version.startswith("OPENSFM_TRACKS_VERSION")
        for row in csv.reader(f, dialect="excel-tab"):
            per_image[row[0]].append((float(row[3]), float(row[4])))
    return {k: np.array(v) for k, v in per_image.items()}


def our_keypoints(image_path, feature_type, size, count):
    import cv2

    from opensfm_tpu import features
    from opensfm_tpu.config import default_config

    config = default_config()
    config["feature_type"] = feature_type
    config["feature_process_size"] = size
    config["feature_min_frames"] = count
    img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
    data = features.extract_features(img, config, is_panorama=False)
    return data.points[:, :2]


def coverage(ref_pts, our_pts, radius):
    if len(our_pts) == 0:
        return 0.0, float("inf")
    d2 = ((ref_pts[:, None, :] - our_pts[None, :, :]) ** 2).sum(-1)
    nn = np.sqrt(d2.min(axis=1))
    return float((nn < radius).mean()), float(np.median(nn))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--count", type=int, default=4000)
    ap.add_argument("--radius", type=float, default=0.004)
    args = ap.parse_args()

    ref = load_reference_keypoints()
    print(
        f"| image | detector | our kpts | ref tracked kpts | "
        f"coverage@{args.radius} | median NN dist |"
    )
    print("|---|---|---|---|---|---|")
    for detector in ("HAHOG", "SIFT"):
        for image in sorted(ref):
            pts = our_keypoints(
                os.path.join(BERLIN, "images", image),
                detector, args.size, args.count,
            )
            cov, med = coverage(ref[image], pts, args.radius)
            label = "HAHOG (hessian)" if detector == "HAHOG" else "DoG"
            print(
                f"| {image} | {label} | {len(pts)} | {len(ref[image])} | "
                f"{cov:.3f} | {med:.5f} |"
            )


if __name__ == "__main__":
    main()
