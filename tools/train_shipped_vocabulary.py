"""Train the shipped BoW/VLAD vocabularies (opensfm_tpu/data/bow/).

Reference ships pretrained FLANN vocabularies
(data/bow/bow_hahog_root_uchar_10000.npz, .._64.npz for VLAD); we train
ours once over the reference datasets' imagery with the package's own
HAHOG-class root-uchar descriptors and commit the result, so BoW/VLAD
pair selection has the reference's cold-start-free semantics.

Run: python tools/train_shipped_vocabulary.py [--words 1024] [--vlad 64]
"""

import argparse
import os
import sys

# Train on whatever accelerator JAX provides (the kmeans is a matmul
# Lloyd loop — a 10k-word vocabulary over ~250k descriptors is minutes
# on a TPU chip, hours on a 2-core CPU).  Set JAX_PLATFORMS=cpu to
# force CPU.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=1024)
    ap.add_argument("--vlad", type=int, default=64)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--per-image", type=int, default=3000)
    ap.add_argument(
        "--images", nargs="*",
        default=["/root/reference/data/berlin/images",
                 "/root/reference/data/lund/images"],
    )
    args = ap.parse_args()

    import cv2

    from opensfm_tpu.features import resized_image
    from opensfm_tpu.ops.features import extract_dog_features
    from opensfm_tpu.ops.kmeans import train_kmeans

    rng = np.random.default_rng(42)
    sample = []
    for d in args.images:
        for name in sorted(os.listdir(d)):
            if not name.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            img = cv2.imread(os.path.join(d, name), cv2.IMREAD_GRAYSCALE)
            img = resized_image(img, args.size)
            pts, desc = extract_dog_features(
                img, peak_threshold=1e-5, target_features=args.per_image,
                detector="hessian", n_orientations=2, root_uchar=True,
            )
            take = min(len(desc), args.per_image)
            sel = rng.choice(len(desc), take, replace=False)
            sample.append(desc[sel].astype(np.float32))
            print(f"{name}: {len(desc)} descriptors, kept {take}")
    descriptors = np.concatenate(sample)
    print(f"training on {len(descriptors)} descriptors")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "opensfm_tpu", "data", "bow",
    )
    os.makedirs(out_dir, exist_ok=True)

    words = train_kmeans(descriptors, args.words, iterations=40)
    # Word frequencies over the training corpus (for tf-idf weights).
    from opensfm_tpu.ops.kmeans import assign_words_topk
    import jax.numpy as jnp

    assign = np.asarray(
        assign_words_topk(jnp.asarray(descriptors), jnp.asarray(words), 1)
    )[:, 0]
    freq = np.bincount(assign, minlength=args.words) + 1
    bow_path = os.path.join(
        out_dir, f"bow_hahog_root_uchar_{args.words}.npz"
    )
    np.savez_compressed(
        bow_path, words=words.astype(np.float32), frequencies=freq
    )
    print(f"wrote {bow_path} ({os.path.getsize(bow_path)} bytes)")

    vlad_words = train_kmeans(descriptors, args.vlad, iterations=40)
    vlad_path = os.path.join(out_dir, "vlad_hahog_root_uchar_64.npz")
    np.savez_compressed(vlad_path, words=vlad_words.astype(np.float32))
    print(f"wrote {vlad_path} ({os.path.getsize(vlad_path)} bytes)")


if __name__ == "__main__":
    main()
