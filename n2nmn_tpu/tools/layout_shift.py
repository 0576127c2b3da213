"""Analyze where an RL run's decoded layouts diverge from the experts.

VERDICT r4 weak #1: flag_v21_rlfull_s1's layout accuracy dropped to 0.88
while its answer accuracy ROSE to 92.2% over its cloning warm start —
either RL found alternate *correct* programs (the N2NMN thesis: policy
search over layout structure, reference README.md:85-95 rl > cloning) or
it is reward-hacking a renderer artifact. This tool answers which, from
the per-question layout dumps written by
experiments/clevr.evaluate_many(dump_layouts=True)
(results/<exp>/<snap>.<split>.layouts.npz):

- per (gt-family -> predicted-family) transition: count + answer accuracy
- answer accuracy on shifted vs unshifted questions
- whether shifted programs are VALID under the grammar (a hacked layout
  would typically be degenerate/invalid; an alternate program is valid
  and answer-correct)

Usage:
  python -m n2nmn_tpu.tools.layout_shift \
      exp_clevr_flag/results/flag_v21_rlfull_s1/00020000.tst.layouts.npz
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np


def _families(tokens, module_names, eos_idx):
    """[N, T] int tokens -> list of 'mod mod ...' family strings."""
    out = []
    for row in tokens:
        out.append(" ".join(module_names[t] for t in row if t != eos_idx))
    return out


def analyze(npz_path):
    data = np.load(npz_path, allow_pickle=False)
    gt, pred = data["gt"], data["pred"]
    correct, validity = data["answer_correct"], data["validity"]
    module_names = [str(m) for m in data["module_names"]]
    eos_idx = module_names.index("<eos>")

    # layout match with the eval rule: positions where gt is <eos> are
    # ignored (reference eval_clevr.py:119-122)
    t = min(gt.shape[1], pred.shape[1])
    match = np.all((pred[:, :t] == gt[:, :t]) | (gt[:, :t] == eos_idx),
                   axis=1)
    gt_fams = _families(gt, module_names, eos_idx)
    pred_fams = _families(pred, module_names, eos_idx)

    n = len(gt_fams)
    shifted = ~match
    res = {
        "npz": npz_path,
        "num_questions": int(n),
        "layout_accuracy": float(np.mean(match)),
        "answer_accuracy": float(np.mean(correct)),
        "answer_accuracy_unshifted": float(np.mean(correct[match]))
        if match.any() else None,
        "answer_accuracy_shifted": float(np.mean(correct[shifted]))
        if shifted.any() else None,
        "validity_shifted": float(np.mean(validity[shifted]))
        if shifted.any() else None,
        "transitions": [],
    }
    trans = defaultdict(lambda: [0, 0, 0])   # count, correct, valid
    for i in range(n):
        if shifted[i]:
            k = (gt_fams[i], pred_fams[i])
            trans[k][0] += 1
            trans[k][1] += int(correct[i])
            trans[k][2] += int(validity[i])
    for (g, p), (c, ok, v) in sorted(trans.items(),
                                     key=lambda kv: -kv[1][0]):
        res["transitions"].append({
            "gt": g, "pred": p, "count": c,
            "answer_accuracy": round(ok / c, 4),
            "validity": round(v / c, 4)})
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npz", nargs="+")
    p.add_argument("--out", default=None,
                   help="write the JSON report here (default: alongside "
                        "the npz as .layout_shift.json)")
    args = p.parse_args()
    for path in args.npz:
        res = analyze(path)
        out = args.out or path.replace(".layouts.npz",
                                       ".layout_shift.json")
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"== {path}")
        print(f"  layout acc {res['layout_accuracy']:.4f}  answer acc "
              f"{res['answer_accuracy']:.4f}")
        print(f"  shifted: answer acc {res['answer_accuracy_shifted']}, "
              f"validity {res['validity_shifted']}; unshifted answer acc "
              f"{res['answer_accuracy_unshifted']}")
        for tr in res["transitions"][:12]:
            print(f"  [{tr['gt']}] -> [{tr['pred']}] x{tr['count']} "
                  f"acc={tr['answer_accuracy']} valid={tr['validity']}")
        print(f"  wrote {out}")


if __name__ == "__main__":
    main()
