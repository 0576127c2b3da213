"""Synthetic imdb generation for smoke-testing the CLEVR/VQA pipelines on
machines without the datasets (the real datasets need a multi-GB download;
the reference assumes they exist on disk). Produces structurally-faithful
imdb records + feature files; content is random."""

from __future__ import annotations

import os

import numpy as np

from n2nmn_tpu.layout.grammar import ModuleGrammar


def random_layouts(grammar: ModuleGrammar, T, n, seed=0):
    rng = np.random.RandomState(seed)
    layouts = []
    for _ in range(n):
        X = np.array([0, 0, T], np.int64)
        names = []
        for _t in range(T):
            valid = np.all(
                (X @ grammar.W.reshape(3, -1)).reshape(grammar.num_vocab, 4)
                - grammar.b >= 0, axis=1)
            s = int(rng.choice(np.nonzero(valid)[0]))
            if s == grammar.eos_idx:
                break
            names.append(grammar.module_names[s])
            X = X + grammar.P[s]
        layouts.append(names)
    return layouts


def make_synthetic_clevr(out_root, num_images=8, num_questions=64,
                         H=10, W=15, D=512, T_layout=8, seed=0,
                         vocab_question_file=None, vocab_answer_file=None,
                         vocab_layout_file=None):
    """Create imdb_trn.npy/imdb_val.npy + feature .npy files under
    out_root; returns (imdb_trn_path, imdb_val_path)."""
    rng = np.random.RandomState(seed)
    feat_dir = os.path.join(out_root, "features")
    imdb_dir = os.path.join(out_root, "data", "imdb")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(imdb_dir, exist_ok=True)

    with open(vocab_question_file) as f:
        question_words = [l.strip() for l in f if l.strip()]
    with open(vocab_answer_file) as f:
        answers = [l.strip() for l in f if l.strip()]
    grammar = ModuleGrammar.from_vocab_file(vocab_layout_file)

    feature_paths = []
    for i in range(num_images):
        path = os.path.join(feat_dir, f"img{i:04d}.npy")
        np.save(path, rng.randn(1, H, W, D).astype(np.float32))
        feature_paths.append(path)

    layouts = random_layouts(grammar, T_layout, num_questions, seed=seed)
    records = []
    for n in range(num_questions):
        q_len = rng.randint(3, 12)
        tokens = [question_words[rng.randint(len(question_words))]
                  for _ in range(q_len)]
        records.append({
            "image_name": f"img{n % num_images:04d}",
            "image_path": f"synthetic/img{n % num_images:04d}.png",
            "feature_path": feature_paths[n % num_images],
            "question_str": " ".join(tokens),
            "question_tokens": tokens,
            "gt_layout_tokens": layouts[n],
            "answer": answers[rng.randint(len(answers))],
        })
    imdb = np.array(records)
    trn_path = os.path.join(imdb_dir, "imdb_trn.npy")
    val_path = os.path.join(imdb_dir, "imdb_val.npy")
    np.save(trn_path, imdb[: num_questions * 3 // 4])
    np.save(val_path, imdb[num_questions * 3 // 4:])
    return trn_path, val_path


def make_synthetic_vqa(out_root, num_images=8, num_questions=64,
                       H=14, W=14, D=2048, T_layout=10, seed=0,
                       vocab_question_file=None, vocab_answer_file=None,
                       vocab_layout_file=None):
    """Synthetic VQA-format imdb (valid_answers lists, question ids) +
    feature files. Returns (imdb_trainval_path, imdb_testdev_path)."""
    rng = np.random.RandomState(seed)
    feat_dir = os.path.join(out_root, "features")
    imdb_dir = os.path.join(out_root, "data", "imdb")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(imdb_dir, exist_ok=True)

    with open(vocab_question_file) as f:
        question_words = [l.strip() for l in f if l.strip()]
    with open(vocab_answer_file) as f:
        answers = [l.strip() for l in f if l.strip()]
    grammar = ModuleGrammar.from_vocab_file(vocab_layout_file)

    feature_paths = []
    for i in range(num_images):
        path = os.path.join(feat_dir, f"vqaimg{i:04d}.npy")
        np.save(path, rng.randn(1, H, W, D).astype(np.float32))
        feature_paths.append(path)

    layouts = random_layouts(grammar, T_layout, num_questions, seed=seed)
    records = []
    for n in range(num_questions):
        q_len = rng.randint(3, 15)
        tokens = [question_words[rng.randint(1, len(question_words))]
                  for _ in range(q_len)]
        valid = [answers[rng.randint(1, len(answers))]
                 for _ in range(rng.randint(1, 4))]
        records.append({
            "image_name": f"vqaimg{n % num_images:04d}",
            "image_path": f"synthetic/vqaimg{n % num_images:04d}.jpg",
            "image_id": n % num_images,
            "question_id": 1000 + n,
            "feature_path": feature_paths[n % num_images],
            "question_str": " ".join(tokens),
            "question_tokens": tokens,
            "gt_layout_tokens": layouts[n],
            "valid_answers": valid,
            "all_answers": valid,
        })
    imdb = np.array(records)
    trn_path = os.path.join(imdb_dir, "imdb_trainval2014.npy")
    tst_path = os.path.join(imdb_dir, "imdb_test-dev2015.npy")
    np.save(trn_path, imdb[: num_questions * 3 // 4])
    np.save(tst_path, imdb[num_questions * 3 // 4:])
    return trn_path, tst_path
