"""Vocabulary / answer-list / GloVe-matrix builders — script replacements
for the reference's collect_*_vocabs_answers notebooks
(exp_vqa/data/collect_vqa_vocabs_answers_glove.ipynb,
exp_clevr/data/collect_clevr_vocabs_answers.ipynb).

GloVe vectors come from a standard glove.*.300d.txt file instead of the
notebook's spaCy model (unavailable offline); out-of-vocabulary words get
zero vectors, matching spaCy's behavior for unknown tokens."""

from __future__ import annotations

import json
import re
from collections import defaultdict

import numpy as np

from n2nmn_tpu.data.text import tokenize

_PUNCT = re.compile(r"[^\w\s]")


def collect_vqa_answers(annotation_files, num_answers=3000):
    """Top-N most frequent answers (punctuation-containing answers
    dropped) with <unk> prepended (reference notebook cell 3)."""
    counts = defaultdict(int)
    for path in annotation_files:
        with open(path) as f:
            annotations = json.load(f)["annotations"]
        for ann in annotations:
            for answer in ann["answers"]:
                word = answer["answer"]
                if _PUNCT.search(word):
                    continue
                counts[word] += 1
    top = sorted(counts, key=counts.get, reverse=True)
    assert "<unk>" not in top
    return ["<unk>"] + top[:num_answers]


def collect_question_vocab(question_files, add_unk=True):
    """All words over the question sets, sorted (reference cell 4)."""
    vocab = set()
    for path in question_files:
        with open(path) as f:
            questions = json.load(f)["questions"]
        for q in questions:
            vocab.update(tokenize(q["question"]))
    if add_unk:
        vocab.add("<unk>")
    return sorted(vocab)


def collect_clevr_vocab_and_answers(question_files):
    """CLEVR: word vocab from questions; answer list from the answers
    present (28 unique)."""
    vocab, answers = set(), set()
    for path in question_files:
        with open(path) as f:
            questions = json.load(f)["questions"]
        for q in questions:
            vocab.update(tokenize(q["question"]))
            if "answer" in q:
                answers.add(str(q["answer"]))
    return sorted(vocab), sorted(answers)


def write_list(words, path):
    with open(path, "w") as f:
        f.writelines(w + "\n" for w in words)


def build_glove_matrix(vocab_file, glove_txt_file, out_file, dim=300):
    """vocabulary file + glove txt ('word v1 v2 ...') -> [V, dim] float32
    npy aligned with the vocab, zeros for OOV."""
    with open(vocab_file) as f:
        vocab = [l.strip() for l in f if l.strip()]
    wanted = {w: i for i, w in enumerate(vocab)}
    mat = np.zeros((len(vocab), dim), np.float32)
    hit = 0
    with open(glove_txt_file, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if parts[0] in wanted and len(parts) == dim + 1:
                mat[wanted[parts[0]]] = np.asarray(parts[1:], np.float32)
                hit += 1
    print(f"GloVe coverage: {hit}/{len(vocab)} words")
    np.save(out_file, mat)
    return mat
