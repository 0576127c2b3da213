"""VQA-flagship replication: cloning -> RL at the REAL VQA geometry.

VERDICT r4 missing #2 / next-round #2: the VQA flavor had only ever
trained on a 6x6 mini grid. This chain trains it at the real geometry —
14x14x2048 res5c-shaped features (builders/mini_vqa.py --flagship), the
real 17742-word vocabulary with fake-GloVe-300 init, the real
3001-answer head, qpn on, coordinate maps on — with the reference
schedules: cloning 40k @ lr 1e-3 no clip (train_vqa_gt_layout.py:23-59),
REINFORCE fine-tune 40k @ lr 1e-4 clip 10 sampling on
(train_vqa_rl_gt_layout.py:36-51,103), snapshots every 5000.

Reporting follows the repo's select-by-val protocol (tools/replicate.py):
every snapshot evaluated on val, the best's tst accuracy quoted, official
VQA metric min(#agree/3, 1) + per-type breakdown via data/vqa_grader.py.
RL warm-starts from the FINAL cloning snapshot like the reference
(train_vqa_rl_gt_layout.py pretrained_model default), not the selected
one.

Usage:
  python -m n2nmn_tpu.tools.vqa_flagship --seeds 0 1 2
  python -m n2nmn_tpu.tools.vqa_flagship --seeds 0 --max_iter 2000  # probe
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def _log(out_file, rec):
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    rec = dict(rec, ts=time.time())
    with open(out_file, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT " + json.dumps(rec), flush=True)


def _snapshots(root, exp_name):
    d = os.path.join(root, "tfmodel", exp_name)
    return sorted(f[:-4] for f in os.listdir(d)
                  if f.endswith(".npz") and not f.endswith(".state.npz"))


def _select_and_test(vqa, cfg, exp, root, out_file, family):
    snaps = _snapshots(root, exp)
    val = vqa.evaluate_many(cfg, exp, snaps, "val")
    best = max(snaps, key=lambda s: val[s]["answer_accuracy"])
    tst = vqa.evaluate_many(cfg, exp, [best], "tst")[best]
    _log(out_file, {
        "family": family, "exp": exp, "selected": best,
        "val_accuracy_per_snapshot": {
            s: round(val[s]["answer_accuracy"], 5) for s in snaps},
        "val_accuracy_of_selected": val[best]["answer_accuracy"],
        "tst_answer_accuracy": tst["answer_accuracy"],
        "tst_layout_accuracy": tst["layout_accuracy"],
        "tst_layout_validity": tst["layout_validity"],
        "tst_accuracy_per_type": tst.get("accuracy_per_type"),
    })
    return best, tst


def run_seed(seed, root, out_file, max_iter=40000, rl_max_iter=None):
    from n2nmn_tpu.experiments import vqa

    rl_max_iter = rl_max_iter or max_iter
    gt_exp, rl_exp = f"vqaflag_gt_s{seed}", f"vqaflag_rl_s{seed}"
    common = dict(root=root, imdb_trn="data/imdb/imdb_trn.npy",
                  device_data_bf16=True, seed=seed)

    cfg = vqa.VqaConfig(exp_name=gt_exp, max_iter=max_iter, **common)
    final = os.path.join(root, "tfmodel", gt_exp, "%08d" % max_iter)
    if not os.path.exists(final + ".npz"):   # idempotent re-entry
        t0 = time.time()
        vqa.train(cfg)
        _log(out_file, {"family": "vqa_flagship_gt", "exp": gt_exp,
                        "train_s": round(time.time() - t0, 1)})
    _select_and_test(vqa, cfg, gt_exp, root, out_file, "vqa_flagship_gt")

    rcfg = vqa.rl_config(exp_name=rl_exp, max_iter=rl_max_iter, **common)
    rl_final = os.path.join(root, "tfmodel", rl_exp, "%08d" % rl_max_iter)
    if not os.path.exists(rl_final + ".npz"):
        t0 = time.time()
        vqa.train(rcfg, pretrained_model=final)
        _log(out_file, {"family": "vqa_flagship_rl", "exp": rl_exp,
                        "train_s": round(time.time() - t0, 1)})
    _select_and_test(vqa, rcfg, rl_exp, root, out_file, "vqa_flagship_rl")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./exp_vqa_flag")
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--max_iter", type=int, default=40000)
    p.add_argument("--rl_max_iter", type=int, default=None)
    p.add_argument("--out",
                   default="./exp_vqa_flag/results/vqa_flagship_r5.jsonl")
    args = p.parse_args()
    for seed in args.seeds:
        # graceful bound: killing a TPU process mid-step can wedge the
        # tunnel (CLAUDE.md); touch this file to stop between seeds
        if os.path.exists("/tmp/vqa_flag_stop"):
            print("VQA-FLAG-STOPPED by sentinel", flush=True)
            return
        run_seed(seed, args.root, args.out, max_iter=args.max_iter,
                 rl_max_iter=args.rl_max_iter)
        print(f"VQA-FLAG-SEED-DONE seed={seed} {time.ctime()}",
              flush=True)
    print(f"VQA-FLAG-DONE {time.ctime()}", flush=True)


if __name__ == "__main__":
    main()
