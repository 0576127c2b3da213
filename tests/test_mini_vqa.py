"""Mini-VQA benchmark (data/builders/mini_vqa.py): generator
self-consistency, the official VQA accuracy metric
(data/vqa_grader.py), and an end-to-end smoke of the real exp_vqa
train -> snapshot -> evaluate -> server-JSON -> local-grading loop on a
tiny generated dataset."""

import dataclasses
import json
import os

import numpy as np
import pytest

from n2nmn_tpu.data.builders import mini_vqa
from n2nmn_tpu.data.vqa_grader import vqa_accuracy, grade_predictions
from n2nmn_tpu.layout.grammar import ModuleGrammar


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_vqa")
    mini_vqa.generate(str(root), num_train=48, num_val=24, num_test=24,
                      seed=7)
    return str(root)


def test_generator_records(mini_root):
    imdb = np.load(os.path.join(mini_root, "data", "imdb",
                                "imdb_trn.npy"), allow_pickle=True)
    assert len(imdb) == 48
    grammar = ModuleGrammar.from_vocab_file(
        os.path.join(mini_root, "data", "vocabulary_layout.txt"))
    answers = set(mini_vqa.ANSWERS)
    for rec in imdb:
        # layouts parse as valid RPN under the 4-module VQA grammar
        tokens = grammar.module_list2tokens(rec["gt_layout_tokens"], 13)
        assert grammar.automaton_validity(tokens)
        # 10 annotators; valid_answers is the vocab-filtered view
        assert len(rec["all_answers"]) == mini_vqa.NUM_ANNOTATORS
        assert len(rec["valid_answers"]) == mini_vqa.NUM_ANNOTATORS
        for a, v in zip(rec["all_answers"], rec["valid_answers"]):
            assert v == (a if a in answers else "<unk>")
        # count questions carry the "how many" rewrite marker and end in
        # _Describe like every parsed VQA layout
        assert rec["gt_layout_tokens"][-1] == "_Describe"
        feat = np.load(rec["feature_path"])
        assert feat.shape == (1, mini_vqa.GRID, mini_vqa.GRID,
                              mini_vqa.D_FEAT)

    # answers file starts with <unk> (reference eval_vqa.py:105 assert)
    with open(os.path.join(mini_root, "data", "answers_vqa.txt")) as f:
        assert f.readline().strip() == "<unk>"
    glove = np.load(os.path.join(mini_root, "data",
                                 "vocabulary_vqa_glove.npy"))
    with open(os.path.join(mini_root, "data",
                           "vocabulary_vqa.txt")) as f:
        n_vocab = len([l for l in f if l.strip()])
    assert glove.shape == (n_vocab, 300)


def test_annotator_noise_rate():
    rng = np.random.RandomState(0)
    answers = [mini_vqa.annotate(rng, "yes") for _ in range(500)]
    frac_true = np.mean([a.count("yes") / 10 for a in answers])
    # ~ (1 - JUNK_P) * ANNOTATOR_P
    assert 0.78 < frac_true < 0.88


def test_vqa_accuracy_metric():
    # official metric: 10 leave-one-out subsets of min(1, matches/3)
    assert vqa_accuracy("yes", ["yes"] * 10) == 1.0
    assert vqa_accuracy("no", ["yes"] * 10) == 0.0
    # exactly 3 matches: 3 subsets see 2 matches (2/3), 7 see 3 (1.0)
    ans = ["yes"] * 3 + ["no"] * 7
    assert abs(vqa_accuracy("yes", ans) - 0.9) < 1e-9
    # 1 match: that subset sees 0, the other 9 see 1/3
    assert abs(vqa_accuracy("yes", ["yes"] + ["no"] * 9)
               - (9 * (1 / 3)) / 10) < 1e-9


def test_grade_predictions_types(mini_root):
    imdb = np.load(os.path.join(mini_root, "data", "imdb",
                                "imdb_val.npy"), allow_pickle=True)
    # oracle predictions = most common human answer
    preds = {}
    for rec in imdb:
        vals, counts = np.unique(rec["valid_answers"],
                                 return_counts=True)
        preds[rec["question_id"]] = vals[np.argmax(counts)]
    res = grade_predictions(preds, imdb)
    assert res["num_graded"] == len(imdb)
    # consensus answers score near the annotator-noise ceiling
    assert res["overall"] > 0.85
    assert set(res["per_type"]) <= {"yes/no", "number", "other"}


def test_mini_vqa_end_to_end_smoke(mini_root):
    """The real vqa experiment stack on the generated data: cloning
    train (2 iters, qpn + GloVe init + answer sampling) -> snapshot ->
    evaluate -> VQA-server JSON -> local official-metric grading."""
    from n2nmn_tpu.experiments import vqa

    cfg = vqa.VqaConfig(
        exp_name="smoke", root=mini_root, seed=0,
        imdb_trn="data/imdb/imdb_trn.npy",
        max_iter=2, snapshot_interval=2, N=8,
        lstm_dim=32, embed_dim_txt=300, embed_dim_nmn=16,
        T_encoder=16, T_decoder=8)
    vqa.train(cfg)
    snap_dir = os.path.join(mini_root, "tfmodel", "smoke")
    assert os.path.exists(os.path.join(snap_dir, "00000002.npz"))

    res = vqa.evaluate(cfg, "smoke", "00000002", "val", batch_size=8)
    # local official-metric grading kicks in (imdb has annotations)
    assert "answer_accuracy" in res
    assert 0.0 <= res["answer_accuracy"] <= 1.0
    assert res["layout_validity"] == 1.0   # grammar-masked greedy decode
    out = os.path.join(
        mini_root, "eval_outputs", "smoke",
        "vqa_OpenEnded_mscoco_val_smoke_00000002_results.json")
    with open(out) as f:
        preds = json.load(f)
    assert len(preds) == 24 and {"question_id", "answer"} <= set(preds[0])
