"""Per-layout-family accuracy breakdown of an eval prediction file.

Joins the one-answer-per-line predictions `evaluate` writes
(eval_outputs/<exp>/<snap>.<split>.txt) against the imdb's gt layouts
and answers, and reports accuracy per gt-layout family — the view that
localizes WHICH module composition fails (round 3: exposed the
count-family collapse caused by noise in the flagship renderer's
semantic channels).

Usage:
  python -m n2nmn_tpu.tools.eval_breakdown --data_root ./exp_clevr_flag \
      --exp_name flag_gt_layout --snapshot_name 00040000 --split tst
"""

from __future__ import annotations

import argparse
import collections
import os

import numpy as np


def breakdown(data_root, exp_name, snapshot_name, split):
    imdb = np.load(os.path.join(data_root, "data", "imdb",
                                f"imdb_{split}.npy"), allow_pickle=True)
    pred_file = os.path.join(data_root, "eval_outputs", exp_name,
                             f"{snapshot_name}.{split}.txt")
    preds = [l.strip() for l in open(pred_file)]
    assert len(preds) == len(imdb), (len(preds), len(imdb))
    fam = collections.defaultdict(lambda: [0, 0])
    for rec, p in zip(imdb, preds):
        key = " ".join(rec["gt_layout_tokens"])
        fam[key][0] += (p == rec["answer"])
        fam[key][1] += 1
    return {k: (c, n) for k, (c, n) in fam.items()}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./exp_clevr_mini")
    p.add_argument("--exp_name", default="mini_clevr_gt_layout")
    p.add_argument("--snapshot_name", default="00060000")
    p.add_argument("--split", default="tst")
    args = p.parse_args()
    fam = breakdown(args.data_root, args.exp_name, args.snapshot_name,
                    args.split)
    total_c = sum(c for c, _ in fam.values())
    total_n = sum(n for _, n in fam.values())
    for k, (c, n) in sorted(fam.items(), key=lambda kv: kv[1][0] / kv[1][1]):
        print(f"{c / n:6.1%} {n:5d}  {k}")
    print(f"{total_c / total_n:6.1%} {total_n:5d}  OVERALL")
