"""Build CLEVR imdb .npy files (CLI surface mirrors reference
exp_clevr/data/build_clevr_imdb.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from n2nmn_tpu.data.builders.clevr_imdb import build_imdb, save_imdb

parser = argparse.ArgumentParser()
parser.add_argument("--question_dir", type=str, default="./exp_clevr/data")
parser.add_argument("--image_dir", type=str,
                    default="./exp_clevr/clevr-dataset/images")
parser.add_argument("--feature_dir", type=str,
                    default="./exp_clevr/data/vgg_pool5")
parser.add_argument("--out_dir", type=str, default="./exp_clevr/data/imdb")
parser.add_argument("--splits", type=str, default="train:val:test")
args = parser.parse_args()

split_name = {"train": "trn", "val": "val", "test": "tst"}
for split in args.splits.split(":"):
    qf = os.path.join(args.question_dir,
                      f"CLEVR_{split}_questions_gt_layout.json")
    if not os.path.exists(qf):
        print(f"{qf} not found; skipping (run get_ground_truth_layout.py)")
        continue
    imdb = build_imdb(qf,
                      os.path.join(args.image_dir, split),
                      os.path.join(args.feature_dir, split))
    out = os.path.join(args.out_dir,
                       f"imdb_{split_name.get(split, split)}.npy")
    save_imdb(imdb, out)
    print(f"wrote {out} ({len(imdb)} questions)")
