"""Annotate CLEVR question files with expert layouts (CLI surface mirrors
reference exp_clevr/data/get_ground_truth_layout.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from n2nmn_tpu.data.builders.clevr_layouts import add_gt_layout

parser = argparse.ArgumentParser()
parser.add_argument("--question_dir", type=str,
                    default="./exp_clevr/clevr-dataset/questions")
parser.add_argument("--out_dir", type=str, default="./exp_clevr/data")
parser.add_argument("--splits", type=str, default="train:val:test")
args = parser.parse_args()

for split in args.splits.split(":"):
    qf = os.path.join(args.question_dir,
                      f"CLEVR_{split}_questions.json")
    sf = os.path.join(args.out_dir,
                      f"CLEVR_{split}_questions_gt_layout.json")
    if not os.path.exists(qf):
        print(f"{qf} not found; skipping")
        continue
    print(f"annotating {qf} -> {sf}")
    add_gt_layout(qf, sf)
