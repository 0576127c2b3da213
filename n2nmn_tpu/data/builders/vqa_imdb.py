"""Build VQA v1/v2 imdb files (reference exp_vqa/data/build_vqa_imdb.py and
byte-equivalent build_vqa_v2_imdb.py — they differ only in filenames).
Answers are filtered against the 3001-answer vocabulary with <unk>
fallback (reference :20-23, 66-73)."""

from __future__ import annotations

import json
import os

import numpy as np

from n2nmn_tpu.data.text import VocabDict, tokenize


def extract_answers(q_answers, valid_answer_set):
    all_answers = [answer["answer"] for answer in q_answers]
    valid_answers = [a for a in all_answers if a in valid_answer_set]
    return all_answers, valid_answers


def build_imdb(image_set, question_file, annotation_file, gt_layout_file,
               image_dir, feature_dir, vocab_answer_file,
               load_answer=True, load_gt_layout=True):
    """question_file/annotation_file/... are concrete paths (the reference
    hardcodes the template dirs)."""
    answer_dict = VocabDict(vocab_answer_file)
    valid_answer_set = set(answer_dict.word_list)

    qid2ann = {}
    qid2layout = {}
    if load_answer:
        with open(annotation_file) as f:
            annotations = json.load(f)["annotations"]
        qid2ann = {ann["question_id"]: ann for ann in annotations}
    if load_gt_layout:
        qid2layout = np.load(gt_layout_file, allow_pickle=True)[()]

    with open(question_file) as f:
        questions = json.load(f)["questions"]

    coco_set_name = image_set.replace("-dev", "")
    image_name_template = "COCO_" + coco_set_name + "_%012d"
    imdb = [None] * len(questions)
    unk_ans_count = 0
    for n_q, q in enumerate(questions):
        if (n_q + 1) % 10000 == 0:
            print("processing %d / %d" % (n_q + 1, len(questions)))
        image_name = image_name_template % q["image_id"]
        iminfo = {
            "image_name": image_name,
            "image_path": os.path.join(image_dir, image_name + ".jpg"),
            "image_id": q["image_id"],
            "question_id": q["question_id"],
            "feature_path": os.path.join(feature_dir, image_name + ".npy"),
            "question_str": q["question"],
            "question_tokens": tokenize(q["question"]),
        }
        if load_answer:
            ann = qid2ann[q["question_id"]]
            all_answers, valid_answers = extract_answers(
                ann["answers"], valid_answer_set)
            if len(valid_answers) == 0:
                valid_answers = ["<unk>"]
                unk_ans_count += 1
            iminfo["all_answers"] = all_answers
            iminfo["valid_answers"] = valid_answers
        if load_gt_layout:
            iminfo["gt_layout_tokens"] = qid2layout[q["question_id"]]
        imdb[n_q] = iminfo
    if load_answer:
        print("total %d out of %d answers are <unk>"
              % (unk_ans_count, len(questions)))
    return np.array(imdb)
