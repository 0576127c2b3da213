"""Build VQA v2 imdb files (CLI mirrors reference
exp_vqa/data/build_vqa_v2_imdb.py); v2 differs only in file names."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
from n2nmn_tpu.data.builders.vqa_imdb import build_imdb

parser = argparse.ArgumentParser()
parser.add_argument("--vqa_dir", default="./exp_vqa/vqa-dataset")
parser.add_argument("--feature_dir",
                    default="./exp_vqa/data/resnet_res5c")
parser.add_argument("--gt_layout_dir", default="./exp_vqa/data")
parser.add_argument("--out_dir", default="./exp_vqa/data/imdb_vqa_v2")
parser.add_argument("--vocab_answer_file",
                    default="./exp_vqa/data/answers_vqa.txt")
parser.add_argument("--question_prefix", default="v2_OpenEnded_mscoco")
args = parser.parse_args()

os.makedirs(args.out_dir, exist_ok=True)
imdbs = {}
for image_set in ["train2014", "val2014", "test2015", "test-dev2015"]:
    labeled = image_set in ("train2014", "val2014")
    coco_set = image_set.replace("-dev", "")
    imdb = build_imdb(
        image_set,
        question_file=os.path.join(
            args.vqa_dir, "Questions",
            f"{args.question_prefix}_{image_set}_questions.json"),
        annotation_file=os.path.join(
            args.vqa_dir, "Annotations",
            f"mscoco_{image_set}_annotations.json"),
        gt_layout_file=os.path.join(
            args.gt_layout_dir, f"v2_gt_layout_{image_set}_new_parse.npy"),
        image_dir=os.path.join(args.vqa_dir, "Images", coco_set),
        feature_dir=os.path.join(args.feature_dir, coco_set),
        vocab_answer_file=args.vocab_answer_file,
        load_answer=labeled, load_gt_layout=labeled)
    imdbs[image_set] = imdb
    np.save(os.path.join(args.out_dir, f"imdb_{image_set}.npy"), imdb)
np.save(os.path.join(args.out_dir, "imdb_trainval2014.npy"),
        np.concatenate([imdbs["train2014"], imdbs["val2014"]]))
print("imdb files written to", args.out_dir)
