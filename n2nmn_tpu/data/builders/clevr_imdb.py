"""Build CLEVR imdb files (reference exp_clevr/data/build_clevr_imdb.py:
array of dicts {image_name, image_path, feature_path, question_str,
question_tokens, gt_layout_tokens, answer})."""

from __future__ import annotations

import json
import os

import numpy as np

from n2nmn_tpu.data.text import tokenize


def build_imdb(question_file, image_dir, feature_dir,
               with_layout_key="gt_layout"):
    with open(question_file) as f:
        payload = json.load(f)
    # gt_layout files are bare question lists (reference
    # get_ground_truth_layout.py:110 + build_clevr_imdb.py:16); raw
    # CLEVR question files wrap the list in {"questions": [...]}
    questions = (payload["questions"] if isinstance(payload, dict)
                 else payload)
    imdb = []
    for q in questions:
        image_name = q["image_filename"].rsplit(".", 1)[0]
        rec = {
            "image_name": image_name,
            "image_path": os.path.join(image_dir, q["image_filename"]),
            "feature_path": os.path.join(feature_dir, image_name + ".npy"),
            "question_str": q["question"],
            "question_tokens": tokenize(q["question"]),
            "gt_layout_tokens": q.get(with_layout_key),
            "answer": q.get("answer"),
        }
        imdb.append(rec)
    return np.array(imdb)


def save_imdb(imdb, out_file):
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    np.save(out_file, imdb)
