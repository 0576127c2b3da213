"""Compute the SHAPES training image mean (script replacement for the
reference's compute_image_mean.ipynb; writes data/image_mean.npy)."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--dataset_dir", default="./exp_shapes/shapes_dataset")
parser.add_argument("--out_file", default="./exp_shapes/data/image_mean.npy")
parser.add_argument("--image_sets",
                    default="train.large:train.med:train.small:train.tiny")
args = parser.parse_args()

total = None
count = 0
for image_set in args.image_sets.split(":"):
    path = os.path.join(args.dataset_dir, f"{image_set}.input.npy")
    if not os.path.exists(path):
        print(f"WARNING: {path} missing; skipping")
        continue
    imgs = np.load(path).astype(np.float64)
    s = imgs.sum(axis=0)
    total = s if total is None else total + s
    count += len(imgs)

mean = (total / count).astype(np.float64)
np.save(args.out_file, mean)
print(f"image mean over {count} images -> {args.out_file}")
