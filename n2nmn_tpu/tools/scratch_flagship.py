"""From-scratch REINFORCE at flagship geometry (VERDICT r4 missing #3).

The third reference config (exp_clevr/train_clevr_scratch.py:35-45:
T_decoder 6, invalid_expr_loss ln 28, lambda_entropy 0.01, weight decay
0, 120k iters, batch 64 — published 69.1% CLEVR) had only ever run on
16-channel mini-CLEVR. This runs it on the v2.1 flagship data
(10x15x512) for >=2 seeds — policy search from scratch is the
highest-variance training mode (the mini-CLEVR replication saw a 58%
bad seed) — completing the published ordering rl >= cloning > scratch
at full geometry. Eval follows the repo's select-by-val protocol at
T_decoder=20 (reference eval_clevr.py:26-36) with layout dumps for
tools/layout_shift.py (scratch invents ALL its programs).

Usage: python -m n2nmn_tpu.tools.scratch_flagship --seeds 0 1
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _log(out_file, rec):
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    rec = dict(rec, ts=time.time())
    with open(out_file, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT " + json.dumps(rec), flush=True)


def run_seed(seed, root, out_file, max_iter=120000):
    from n2nmn_tpu.experiments import clevr
    from n2nmn_tpu.tools.flag_select import _snapshots

    exp = f"flag_v21_scratch_s{seed}"
    cfg = clevr.scratch_config(exp_name=exp, root=root, seed=seed,
                               max_iter=max_iter, device_data=True,
                               device_data_bf16=True)
    final = os.path.join(root, "tfmodel", exp, "%08d" % max_iter)
    if not os.path.exists(final + ".npz"):   # idempotent re-entry
        t0 = time.time()
        clevr.train(cfg)
        _log(out_file, {"family": "clevr_flagship_scratch", "exp": exp,
                        "train_s": round(time.time() - t0, 1)})
    ecfg = clevr.ClevrConfig(root=root)      # parity eval, T_decoder 20
    snaps = _snapshots(root, exp)
    val = clevr.evaluate_many(ecfg, exp, snaps, "val")
    best = max(snaps, key=lambda s: val[s]["answer_accuracy"])
    tst = clevr.evaluate_many(ecfg, exp, [best], "tst",
                              dump_layouts=True)[best]
    _log(out_file, {
        "family": "clevr_flagship_scratch", "exp": exp, "selected": best,
        "val_accuracy_per_snapshot": {
            s: round(val[s]["answer_accuracy"], 5) for s in snaps},
        "val_accuracy_of_selected": val[best]["answer_accuracy"],
        "tst_answer_accuracy": tst["answer_accuracy"],
        "tst_layout_accuracy": tst["layout_accuracy"],
        "tst_layout_validity": tst["layout_validity"],
    })


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./exp_clevr_flag")
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1])
    p.add_argument("--max_iter", type=int, default=120000)
    p.add_argument("--out",
                   default="./exp_clevr_flag/results/scratch_flag_r5.jsonl")
    args = p.parse_args()
    for seed in args.seeds:
        run_seed(seed, args.root, args.out, max_iter=args.max_iter)
        print(f"SCRATCH-SEED-DONE seed={seed} {time.ctime()}", flush=True)
    print(f"SCRATCH-DONE {time.ctime()}", flush=True)


if __name__ == "__main__":
    main()
