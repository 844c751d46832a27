"""Match features between image pairs
(reference actions/match_features.py:9-34)."""

from __future__ import annotations

from timeit import default_timer as timer

from opensfm_tpu import io, matching


def run_dataset(data) -> None:
    images = data.images()
    start = timer()
    pairs_matches, preport = matching.match_images(data, {}, images, images)
    matching.save_matches(data, images, pairs_matches)
    matching.clear_cache()
    end = timer()
    write_report(data, preport, list(pairs_matches.keys()), end - start)


def write_report(data, preport, pairs, wall_time: float) -> None:
    report = {
        "wall_time": wall_time,
        "num_pairs": len(pairs),
        "pairs": [list(p) for p in pairs],
    }
    report.update(preport)
    data.save_report(io.json_dumps(report), "matches.json")
