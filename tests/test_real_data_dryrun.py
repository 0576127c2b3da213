"""Guarded real-CLEVR dry run (tools/clevr_dryrun.py).

Two layers:
  * the harness itself is tested HERE on a fabricated miniature
    CLEVR-format checkout (question JSON with functional programs +
    rendered PNGs) — all five stages run end-to-end on CPU;
  * the real-data test is skipped unless a CLEVR checkout exists at
    exp_clevr/clevr-dataset, so the parity run fires automatically the
    moment the dataset lands (VERDICT r2 next-#8).
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
