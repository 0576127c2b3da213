"""Offline CLEVR answer-file grader: overall + per-question-type accuracy,
where the type is the last function of the ground-truth program
(reference util/clevr_test/CLEVR_eval.py:13-41)."""

from __future__ import annotations

import json
from collections import defaultdict


def grade(questions_file, answers_file):
    with open(questions_file) as f:
        questions = json.load(f)["questions"]
    with open(answers_file) as f:
        answers = [l.strip() for l in f]
    assert len(questions) == len(answers), (
        f"{len(questions)} questions vs {len(answers)} answers")

    correct_by_type = defaultdict(int)
    count_by_type = defaultdict(int)
    num_correct = 0
    for q, ans in zip(questions, answers):
        q_type = q["program"][-1]["function"] \
            if "function" in q["program"][-1] else q["program"][-1]["type"]
        count_by_type[q_type] += 1
        if ans == str(q["answer"]):
            num_correct += 1
            correct_by_type[q_type] += 1

    overall = num_correct / len(questions)
    print(f"overall accuracy = {overall:.4f} ({num_correct} / "
          f"{len(questions)})")
    per_type = {}
    for q_type in sorted(count_by_type):
        acc = correct_by_type[q_type] / count_by_type[q_type]
        per_type[q_type] = acc
        print(f"  {q_type}: {acc:.4f} ({correct_by_type[q_type]} / "
              f"{count_by_type[q_type]})")
    return overall, per_type


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--questions_file", required=True)
    p.add_argument("--answers_file", required=True)
    args = p.parse_args()
    grade(args.questions_file, args.answers_file)
