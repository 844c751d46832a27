"""Measure BoW / VLAD pair-selection recall on lund (VERDICT r2 item 10).

Ground truth "relevant pairs" are those the full exhaustive matcher
validates with >= `--min-inliers` robust inliers — the pairs a prefilter
must not lose.  For each image the candidates are ranked by BoW tf-idf L1
distance (shipped 10k vocabulary) and by VLAD L2 distance (shipped 64-word
vocabulary); recall@k is the fraction of relevant pairs kept when every
image proposes its top-k neighbors (the union, as pairs_selection uses).

Writes one JSON line; docs/RESULTS.md records the numbers.

Run: python tools/measure_prefilter_recall.py [--dataset /tmp/lund_recall]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prepare_dataset(path: str, size: int, features: int):
    import yaml

    from opensfm_tpu.dataset import DataSet

    os.makedirs(path, exist_ok=True)
    images_link = os.path.join(path, "images")
    if not os.path.exists(images_link):
        os.symlink("/root/reference/data/lund/images", images_link)
    config = {
        "feature_process_size": size,
        "feature_min_frames": features,
        # Exhaustive candidates for the ground truth.
        "matching_gps_distance": 999999,
        "matching_gps_neighbors": 0,
    }
    with open(os.path.join(path, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    return DataSet(path)


def ensure_features_and_matches(data):
    from opensfm_tpu.actions import (
        detect_features,
        extract_metadata,
        match_features,
    )

    if not data.exif_exists(data.images()[0]):
        extract_metadata.run_dataset(data)
    detect_features.run_dataset(data)  # idempotent (skips existing)
    match_features.run_dataset(data)


def relevant_pairs(data, min_inliers: int):
    pairs = set()
    for im in data.images():
        try:
            matches = data.load_matches(im)
        except IOError:
            continue
        for other, m in matches.items():
            if len(m) >= min_inliers:
                pairs.add(tuple(sorted((im, other))))
    return pairs


def ranked_neighbors_bow(data, images):
    from opensfm_tpu import bow as bow_mod
    from opensfm_tpu import feature_loader

    bag = bow_mod.load_vocabulary(data)
    hists = {}
    for im in images:
        fd = feature_loader.instance.load_all_data(data, im, masked=True)
        if fd is None or fd.descriptors is None:
            continue
        words = bag.map_to_words(fd.descriptors.astype("float32"), 1)
        hists[im] = bag.histogram(words)
    order = {}
    for im in images:
        if im not in hists:
            continue
        scored = sorted(
            (bag.bow_distance(hists[im], hists[o]), o)
            for o in images if o != im and o in hists
        )
        order[im] = [o for _, o in scored]
    return order


def ranked_neighbors_vlad(data, images):
    import numpy as np

    from opensfm_tpu import vlad as vlad_mod

    cache = vlad_mod.VladCache()
    hists = {}
    for im in images:
        h = cache.vlad_histogram(data, im)
        if h is not None:
            hists[im] = h
    order = {}
    for im in images:
        if im not in hists:
            continue
        scored = sorted(
            (float(np.linalg.norm(hists[im] - hists[o])), o)
            for o in images if o != im and o in hists
        )
        order[im] = [o for _, o in scored]
    return order


def recall_at(order, relevant, k: int):
    proposed = set()
    for im, neighbors in order.items():
        for o in neighbors[:k]:
            proposed.add(tuple(sorted((im, o))))
    if not relevant:
        return 0.0
    return len(proposed & relevant) / len(relevant)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/tmp/lund_recall")
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--features", type=int, default=3000)
    ap.add_argument("--min-inliers", type=int, default=20)
    args = ap.parse_args()

    data = prepare_dataset(args.dataset, args.size, args.features)
    ensure_features_and_matches(data)
    relevant = relevant_pairs(data, args.min_inliers)
    images = data.images()

    bow_order = ranked_neighbors_bow(data, images)
    vlad_order = ranked_neighbors_vlad(data, images)

    import numpy as np

    from opensfm_tpu import bow as bow_mod

    vocab_path = bow_mod.resolve_vocabulary_path(
        data.config["bow_file"], data
    )
    out = {
        "metric": "prefilter_recall_lund",
        "relevant_pairs": len(relevant),
        "settings": {
            "size": args.size, "features": args.features,
            "min_inliers": args.min_inliers,
            "bow_words": int(np.load(vocab_path)["words"].shape[0]),
        },
    }
    for k in (5, 10):
        out[f"bow_recall@{k}"] = round(recall_at(bow_order, relevant, k), 4)
        out[f"vlad_recall@{k}"] = round(recall_at(vlad_order, relevant, k), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
