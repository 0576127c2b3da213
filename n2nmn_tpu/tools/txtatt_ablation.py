"""Mini-VQA ablation of the optional gt-text-attention supervision
(VqaConfig.txtatt_loss_weight): cloning with the loss ON vs OFF at one
seed, select-by-val, report test VQA accuracy side by side.

The reference's VQA reader builds gt_txtatt_batch
(util/vqa_train/data_reader.py:25-27,133-138) but no shipped reference
driver consumes it; this tool exercises the loss we wired on top of that
data layout (train/steps.py cloning_step_body txtatt_loss_weight).

    python -m n2nmn_tpu.tools.txtatt_ablation --root ./exp_vqa_mini
"""

from __future__ import annotations

import argparse
import json
import os


def _snapshots(root, exp_name):
    snap_dir = os.path.join(root, "tfmodel", exp_name)
    return sorted(s[:-4] for s in os.listdir(snap_dir)
                  if s.endswith(".npz"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./exp_vqa_mini")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--weight", type=float, default=0.5)
    p.add_argument("--max_iter", type=int, default=12000)
    p.add_argument("--out", default="replication/txtatt_ablation.json")
    args = p.parse_args()

    from n2nmn_tpu.experiments import vqa

    results = {}
    for tag, w in [("txtatt_off", 0.0), ("txtatt_on", args.weight)]:
        exp = f"mini_vqa_gt_{tag}_s{args.seed}"
        cfg = vqa.VqaConfig(
            exp_name=exp, root=args.root, seed=args.seed,
            imdb_trn="data/imdb/imdb_trn.npy", max_iter=args.max_iter,
            snapshot_interval=max(args.max_iter // 4, 1),
            txtatt_loss_weight=w)
        vqa.train(cfg)
        ecfg = vqa.VqaConfig(root=args.root)
        best = None      # select-by-val (replicate.py protocol)
        for snap in _snapshots(args.root, exp):
            acc = vqa.evaluate(ecfg, exp, snap, "val")["answer_accuracy"]
            if best is None or acc > best[1]:
                best = (snap, acc)
        snap, val_acc = best
        tst = vqa.evaluate(ecfg, exp, snap, "tst")
        results[tag] = {"weight": w, "best_snapshot": snap,
                        "val_acc": val_acc,
                        "tst_acc": tst["answer_accuracy"],
                        "layout_acc_tst": tst["layout_accuracy"]}
        print(f"{tag}: best={snap} val={val_acc:.4f} "
              f"tst={tst['answer_accuracy']:.4f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"seed": args.seed, "max_iter": args.max_iter,
                   **results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
