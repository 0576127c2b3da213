"""Official VQA accuracy metric, computed locally.

The reference never grades VQA locally — eval_vqa.py only emits the
server-submission JSON [{question_id, answer}] (reference
exp_vqa/eval_vqa.py:145-165) and the README quotes what the evaluation
server returned (README.md:178,258). The server's metric (Antol et al.,
"VQA: Visual Question Answering", ICCV 2015) is

    acc(ans) = avg over the 10 choose-9 annotator subsets of
               min(1, #subset answers matching ans / 3)

i.e. for each annotator i left out, min(1, matches among the other 9 / 3),
averaged over i. This module implements that metric over an imdb that
carries the 10 human answers, standing in for the server on benchmarks
that ship their annotations (mini-VQA: data/builders/mini_vqa.py).

Matching uses the raw human answer strings (``all_answers``; the
vocab-filtered ``valid_answers`` replace OOV answers with <unk>, which
must never match a prediction). The official grader also applies
punctuation/number normalization to free-form answers; synthetic and
vocab-restricted answers are already canonical, so that step is a no-op
here.
"""

from __future__ import annotations

import json

import numpy as np


def vqa_accuracy(pred: str, human_answers) -> float:
    """min(1, matches/3) averaged over the 10 leave-one-out subsets."""
    n = len(human_answers)
    matches = sum(a == pred for a in human_answers)
    accs = []
    for i in range(n):
        m = matches - (1 if human_answers[i] == pred else 0)
        accs.append(min(1.0, m / 3.0))
    return float(np.mean(accs))


def grade_predictions(qid_to_pred, imdb) -> dict:
    """qid_to_pred: {question_id: answer string}; imdb: array of record
    dicts with question_id + all_answers. Returns overall accuracy plus
    a per-question-type breakdown (type = first word of the question,
    mirroring how VQA reports yes/no / number / other)."""
    per_type = {}
    total = []
    for rec in imdb:
        qid = rec["question_id"]
        if qid not in qid_to_pred:
            continue
        answers = rec.get("all_answers") or rec["valid_answers"]
        acc = vqa_accuracy(qid_to_pred[qid], list(answers))
        total.append(acc)
        qtype = _question_type(rec["question_str"], answers)
        per_type.setdefault(qtype, []).append(acc)
    return {
        "overall": float(np.mean(total)) if total else 0.0,
        "num_graded": len(total),
        "per_type": {t: {"accuracy": float(np.mean(v)), "n": len(v)}
                     for t, v in sorted(per_type.items())},
    }


def _question_type(question_str: str, answers) -> str:
    """The VQA paper's three reporting buckets."""
    q = question_str.lower()
    if q.startswith("how many"):
        return "number"
    if any(a in ("yes", "no") for a in answers):
        return "yes/no"
    return "other"


def grade_json(results_json_file: str, imdb_file: str) -> dict:
    """Grade a VQA-server submission file against a local imdb that has
    the human answers (the exact JSON eval_vqa.py writes)."""
    with open(results_json_file) as f:
        preds = json.load(f)
    qid_to_pred = {int(r["question_id"]): r["answer"] for r in preds}
    imdb = np.load(imdb_file, allow_pickle=True)
    return grade_predictions(qid_to_pred, imdb)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("results_json")
    p.add_argument("imdb_file")
    args = p.parse_args()
    print(json.dumps(grade_json(args.results_json, args.imdb_file),
                     indent=2))
