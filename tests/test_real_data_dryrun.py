"""Guarded real-data dry runs (tools/clevr_dryrun.py,
tools/vqa_dryrun.py).

Two layers per flavor:
  * the harness itself is tested HERE on a fabricated miniature
    dataset-format checkout (question/annotation JSON + rendered
    images + parse files) — all five stages run end-to-end on CPU;
  * the real-data test is skipped unless a checkout exists at the
    standard path, so the parity run fires automatically the moment
    the dataset lands (VERDICT r2 next-#8).
"""

import json
import os

import numpy as np
import pytest

REAL_CLEVR = "./exp_clevr/clevr-dataset"

_PROGRAMS = [
    # scene -> filter_color -> exist        => _Find _Exist
    (lambda color: [
        {"function": "scene", "inputs": [], "value_inputs": []},
        {"function": "filter_color", "inputs": [0],
         "value_inputs": [color]},
        {"function": "exist", "inputs": [1], "value_inputs": []},
    ], "is there a {} thing", ("yes", "no")),
    # scene -> filter_shape -> count        => _Find _Count
    (lambda shape: [
        {"function": "scene", "inputs": [], "value_inputs": []},
        {"function": "filter_shape", "inputs": [0],
         "value_inputs": [shape]},
        {"function": "count", "inputs": [1], "value_inputs": []},
    ], "how many {} things are there", ("0", "1", "2")),
]


def _fake_clevr(root, n_questions=8, n_images=3):
    from PIL import Image
    rng = np.random.RandomState(0)
    words = ["red", "blue", "cube", "sphere"]
    for split in ("train", "val"):
        img_dir = os.path.join(root, "images", split)
        os.makedirs(img_dir, exist_ok=True)
        names = []
        for i in range(n_images):
            name = f"CLEVR_{split}_{i:06d}.png"
            Image.fromarray(rng.randint(
                0, 255, (320, 480, 3), np.uint8)).save(
                os.path.join(img_dir, name))
            names.append(name)
        questions = []
        for i in range(n_questions):
            make, qtmpl, answers = _PROGRAMS[i % len(_PROGRAMS)]
            w = words[rng.randint(len(words))]
            questions.append({
                "image_filename": names[i % n_images],
                "question": qtmpl.format(w),
                "program": make(w),
                "answer": answers[rng.randint(len(answers))],
            })
        qd = os.path.join(root, "questions")
        os.makedirs(qd, exist_ok=True)
        with open(os.path.join(qd,
                               f"CLEVR_{split}_questions.json"), "w") as f:
            json.dump({"questions": questions}, f)
    return root


def test_dryrun_on_fabricated_checkout(tmp_path):
    from n2nmn_tpu.tools.clevr_dryrun import run_dryrun

    ds = _fake_clevr(str(tmp_path / "clevr"))
    res = run_dryrun(ds, work_dir=str(tmp_path / "work"), limit=8,
                     train_iters=2, batch_size=4)
    assert res["num_questions"] == 8
    assert 0.0 <= res["answer_accuracy"] <= 1.0
    # stage artifacts all exist
    for p in ("data/CLEVR_train_questions_gt_layout.json",
              "data/imdb/imdb_trn.npy", "data/imdb/imdb_val.npy",
              "tfmodel/dryrun_gt_layout/00000002.npz"):
        assert os.path.exists(os.path.join(str(tmp_path / "work"), p)), p


REAL_VQA = "./exp_vqa/vqa-dataset"

_VQA_LAYOUTS = [
    ("(describe find)", "is there a {} thing"),
    ("(describe (and find find))", "is the {} thing next to the other"),
    ("(describe (relate find))", "what is left of the {} thing"),
]


def _fake_vqa(root, n_questions=8, n_images=3, image_size=64):
    from PIL import Image
    rng = np.random.RandomState(0)
    words = ["red", "blue", "shiny", "round"]
    answers = ["yes", "no", "2", "1"]
    for image_set in ("train2014", "val2014"):
        img_dir = os.path.join(root, "Images", image_set)
        os.makedirs(img_dir, exist_ok=True)
        for i in range(n_images):
            Image.fromarray(rng.randint(
                0, 255, (image_size, image_size, 3), np.uint8)).save(
                os.path.join(img_dir,
                             "COCO_%s_%012d.jpg" % (image_set, i)))
        questions, annotations, ids, parses = [], [], [], []
        for i in range(n_questions):
            qid = i + (1000 if image_set == "val2014" else 0)
            image_id = i % n_images
            sp, qtmpl = _VQA_LAYOUTS[i % len(_VQA_LAYOUTS)]
            questions.append({
                "question_id": qid, "image_id": image_id,
                "question": qtmpl.format(words[i % len(words)]) + "?"})
            annotations.append({
                "question_id": qid, "image_id": image_id,
                "answers": [{"answer": answers[i % len(answers)]}] * 8
                + [{"answer": "maybe not in vocab"}] * 2})
            ids.append(f"{qid},{image_id}")
            parses.append(sp)
        qd = os.path.join(root, "Questions")
        ad = os.path.join(root, "Annotations")
        pd = os.path.join(root, "parse", "new_parse")
        for d in (qd, ad, pd):
            os.makedirs(d, exist_ok=True)
        with open(os.path.join(
                qd, f"OpenEnded_mscoco_{image_set}_questions.json"),
                "w") as f:
            json.dump({"questions": questions}, f)
        with open(os.path.join(
                ad, f"mscoco_{image_set}_annotations.json"), "w") as f:
            json.dump({"annotations": annotations}, f)
        with open(os.path.join(pd, f"{image_set}.ids.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
        with open(os.path.join(pd, f"{image_set}.questions.sp"),
                  "w") as f:
            f.write("\n".join(parses) + "\n")
    return root


def test_vqa_dryrun_on_fabricated_checkout(tmp_path):
    from n2nmn_tpu.tools.vqa_dryrun import run_dryrun

    ds = _fake_vqa(str(tmp_path / "vqa"))
    res = run_dryrun(ds, work_dir=str(tmp_path / "work"), limit=8,
                     train_iters=2, image_size=64, batch_size=4)
    assert res["num_questions"] == 8
    # grammar-masked greedy decode guarantees valid programs
    assert res["layout_validity"] == 1.0
    assert 0.0 <= res["answer_accuracy"] <= 1.0
    for p in ("data/gt_layout_train2014.npy",
              "data/imdb/imdb_dryrun_trn.npy",
              "data/imdb/imdb_dryrun_val.npy",
              "tfmodel/dryrun_gt_layout/00000002.npz",
              "eval_outputs/dryrun_gt_layout/vqa_OpenEnded_mscoco_"
              "dryrun_val_dryrun_gt_layout_00000002_results.json"):
        assert os.path.exists(os.path.join(str(tmp_path / "work"), p)), p


@pytest.mark.skipif(
    not os.path.exists(os.path.join(
        REAL_VQA, "Questions",
        "OpenEnded_mscoco_val2014_questions.json")),
    reason="real VQA dataset not present (zero-egress environment); "
           "drops in automatically when it lands")
def test_vqa_dryrun_on_real_vqa(tmp_path):
    from n2nmn_tpu.tools.vqa_dryrun import run_dryrun

    res = run_dryrun(REAL_VQA, work_dir=str(tmp_path / "work"),
                     limit=256, train_iters=100)
    assert res["num_questions"] == 256
    assert res["layout_validity"] == 1.0


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REAL_CLEVR, "questions",
                                    "CLEVR_val_questions.json")),
    reason="real CLEVR dataset not present (zero-egress environment); "
           "drops in automatically when it lands")
def test_dryrun_on_real_clevr(tmp_path):
    from n2nmn_tpu.tools.clevr_dryrun import run_dryrun

    res = run_dryrun(REAL_CLEVR, work_dir=str(tmp_path / "work"),
                     limit=256, train_iters=100)
    assert res["num_questions"] == 256
    assert res["layout_validity"] == 1.0
