"""Data pipeline tests: imdb readers, filter pruning, packing, VQA extras,
CLEVR program linearization."""

import os

import numpy as np
import pytest

from n2nmn_tpu.data.imdb import (
    DataReader, prune_filter_modules, pack_features)
from n2nmn_tpu.data.vqa import VqaDataReader
from n2nmn_tpu.data.text import tokenize, VocabDict
from n2nmn_tpu.data.builders.synthetic import (
    make_synthetic_clevr, make_synthetic_vqa)
from n2nmn_tpu.data.builders.clevr_layouts import linearize_program
from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.layout.assembler import Assembler, INVALID_EXPR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLEVR_VOCABS = dict(
    vocab_question_file=os.path.join(REPO, "exp_clevr/data/"
                                     "vocabulary_clevr.txt"),
    vocab_answer_file=os.path.join(REPO, "exp_clevr/data/"
                                   "answers_clevr.txt"),
    vocab_layout_file=os.path.join(REPO, "exp_clevr/data/"
                                   "vocabulary_layout.txt"))
VQA_VOCABS = dict(
    vocab_question_file=os.path.join(REPO, "exp_vqa/data/"
                                     "vocabulary_vqa.txt"),
    vocab_answer_file=os.path.join(REPO, "exp_vqa/data/answers_vqa.txt"),
    vocab_layout_file=os.path.join(REPO, "exp_vqa/data/"
                                   "vocabulary_layout.txt"))


def test_tokenize():
    # reference util/text_processing.py:3-7 semantics
    assert tokenize("Is there a red cube?") == \
        ["is", "there", "a", "red", "cube", "?"]


def test_tokenize_contract():
    # golden cases pinning the format contract (data/text.py docstring):
    # identical output to re.split(r'(\W+)') + strip + drop-empty
    cases = {
        "What's behind the sphere?":
            ["what", "'", "s", "behind", "the", "sphere", "?"],
        "  leading and trailing  ": ["leading", "and", "trailing"],
        "semi-colons; and, commas":
            ["semi", "-", "colons", ";", "and", ",", "commas"],
        # interior whitespace inside ONE punctuation run survives
        "a ? ! b": ["a", "? !", "b"],
        "UPPER lower 123_mix": ["upper", "lower", "123_mix"],
        "": [],
        "???": ["???"],
    }
    for sentence, want in cases.items():
        assert tokenize(sentence) == want, sentence
    # differential form of the same contract
    import re
    for sentence in list(cases) + ["x,y  z;; 7q's", "\"quoted\" words!"]:
        ref = [t.strip() for t in re.split(r"(\W+)", sentence.lower())
               if t.strip()]
        assert tokenize(sentence) == ref, sentence


def test_vocab_contract(tmp_path):
    # vocab round-trip against a shipped vocab file: every word maps to
    # its line number and back
    vd = VocabDict(CLEVR_VOCABS["vocab_question_file"])
    assert vd.num_vocab == len(vd) == len(vd.word_list)
    for i, w in enumerate(vd.word_list):
        assert vd.word2idx(w) == i
        assert vd.idx2word(i) == w
    # <unk> fallback iff the file defines one
    p = tmp_path / "v.txt"
    p.write_text("<unk>\nred\nblue\n")
    vd_unk = VocabDict(str(p))
    assert vd_unk.word2idx("zebra") == 0 and "zebra" not in vd_unk
    assert vd_unk.tokenize_and_index("Red, blue!") == [1, 0, 2, 0]
    p2 = tmp_path / "nounk.txt"
    p2.write_text("red\nblue\n")
    with pytest.raises(ValueError):
        VocabDict(str(p2)).word2idx("zebra")


def test_prune_filter_modules():
    # reference clevr_train/data_reader.py:65-71
    assert prune_filter_modules(
        ["_Find", "_Filter", "_Filter", "_Describe"]) == \
        ["_Find", "_Describe"]
    assert prune_filter_modules(
        ["_Scene", "_Filter", "_Transform"]) == \
        ["_Scene", "_Filter", "_Transform"]
    assert prune_filter_modules(
        ["_Filter", "_Filter", "_And"]) == ["_Filter", "_And"]


def test_clevr_reader_batches(tmp_path):
    trn, val = make_synthetic_clevr(str(tmp_path), num_questions=20,
                                    num_images=3, H=4, W=5, D=8,
                                    **CLEVR_VOCABS)
    grammar = ModuleGrammar.from_vocab_file(
        CLEVR_VOCABS["vocab_layout_file"])
    reader = DataReader(
        trn, shuffle=False, one_pass=True, batch_size=8,
        vocab_question_file=CLEVR_VOCABS["vocab_question_file"],
        vocab_answer_file=CLEVR_VOCABS["vocab_answer_file"],
        T_encoder=20, T_decoder=9, grammar=grammar,
        prune_filter_module=True)
    batches = list(reader.batches())
    assert len(batches) == 2  # 15 train questions -> 8 + 7
    b = batches[0]
    assert b["text_seq"].shape == (20, 8)
    assert b["image"].shape == (8, 4, 5, 8)
    assert b["gt_layout"].shape == (9, 8)
    assert b["weight"].sum() == 8
    assert batches[1]["weight"].sum() == 7  # padded final batch
    # every gt layout must be a valid program
    asm = Assembler(grammar)
    _, validity = asm.assemble(b["gt_layout"])
    assert np.all(validity)


def test_packed_feature_store(tmp_path):
    trn, _ = make_synthetic_clevr(str(tmp_path), num_questions=12,
                                  num_images=3, H=4, W=5, D=8,
                                  **CLEVR_VOCABS)
    imdb = np.load(trn, allow_pickle=True)
    packed_file = str(tmp_path / "packed.npy")
    imdb = pack_features(list(imdb), packed_file)
    grammar = ModuleGrammar.from_vocab_file(
        CLEVR_VOCABS["vocab_layout_file"])
    kwargs = dict(
        vocab_question_file=CLEVR_VOCABS["vocab_question_file"],
        vocab_answer_file=CLEVR_VOCABS["vocab_answer_file"],
        T_encoder=20, T_decoder=9, grammar=grammar)
    r_files = DataReader(np.array(imdb), shuffle=False, one_pass=True,
                         batch_size=4, **kwargs)
    r_packed = DataReader(np.array(imdb), shuffle=False, one_pass=True,
                          batch_size=4, packed_feature_file=packed_file,
                          **kwargs)
    for bf, bp in zip(r_files.batches(), r_packed.batches()):
        np.testing.assert_array_equal(bf["image"], bp["image"])
        np.testing.assert_array_equal(bf["text_seq"], bp["text_seq"])


def test_vqa_reader_extras(tmp_path):
    trn, _ = make_synthetic_vqa(str(tmp_path), num_questions=16,
                                num_images=2, H=3, W=3, D=8,
                                **VQA_VOCABS)
    grammar = ModuleGrammar.from_vocab_file(VQA_VOCABS["vocab_layout_file"])
    common = dict(
        vocab_question_file=VQA_VOCABS["vocab_question_file"],
        vocab_answer_file=VQA_VOCABS["vocab_answer_file"],
        T_encoder=20, T_decoder=12, grammar=grammar)
    reader = VqaDataReader(trn, shuffle=False, one_pass=True, batch_size=6,
                           load_binary_labels=True, seed=0, **common)
    b = next(reader.batches())
    assert b["label"].shape == (6,)
    assert b["binary_label"].shape[1] == 3001
    # binary labels mark every valid answer
    answer_dict = VocabDict(VQA_VOCABS["vocab_answer_file"])
    for n in range(b["n_real"]):
        for a in b["valid_answers"][n]:
            assert b["binary_label"][n, answer_dict.word2idx(a)] == 1.0
    assert b["qid"][0] == 1000

    # overriding_layout forces one layout everywhere
    reader2 = VqaDataReader(trn, shuffle=False, one_pass=True, batch_size=6,
                            overriding_layout=["_Find", "_Describe"],
                            **common)
    b2 = next(reader2.batches())
    expected = grammar.module_list2tokens(["_Find", "_Describe"], 12)
    for n in range(b2["n_real"]):
        np.testing.assert_array_equal(b2["gt_layout"][:, n], expected)


def test_linearize_program():
    # hand-built CLEVR-style program: count(filter_color(scene)) vs
    # count(filter_shape(scene)) under equal_integer; the count nodes are
    # pruned so _EqualNum reads the attentions
    # (reference get_ground_truth_layout.py:46-66)
    program = [
        {"function": "scene", "inputs": []},                    # 0
        {"function": "filter_color", "inputs": [0]},            # 1
        {"function": "count", "inputs": [1]},                   # 2
        {"function": "scene", "inputs": []},                    # 3
        {"function": "filter_shape", "inputs": [3]},            # 4
        {"function": "count", "inputs": [4]},                   # 5
        {"function": "equal_integer", "inputs": [2, 5]},        # 6
    ]
    layout = linearize_program({"program": program})
    assert layout == ["_Find", "_Find", "_EqualNum"]

    # simple query chain with scene+filter -> find rewrite
    program2 = [
        {"function": "scene", "inputs": []},
        {"function": "filter_size", "inputs": [0]},
        {"function": "unique", "inputs": [1]},
        {"function": "relate", "inputs": [2]},
        {"function": "query_color", "inputs": [3]},
    ]
    layout2 = linearize_program({"program": program2})
    assert layout2 == ["_Find", "_Transform", "_Describe"]
