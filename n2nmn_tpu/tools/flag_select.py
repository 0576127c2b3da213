"""Select-by-validation sweep over the flagship CLEVR chains.

VERDICT r4 (weak #4 / next #6): the flagship tables quoted FINAL-snapshot
numbers while every other table in the repo (tools/replicate.py) selects
the snapshot by validation accuracy. This applies the replicate.py
protocol uniformly: evaluate EVERY snapshot of each flagship experiment
on val, pick the best, report its tst accuracy. The reference itself
evaluates one named snapshot (exp_clevr/eval_clevr.py:21-24) and
publishes point numbers (README.md:85-95); select-by-val is this repo's
stricter standing protocol.

Each experiment stages its eval split once and sweeps snapshots over the
cached batches (experiments/clevr.evaluate_many), so the whole sweep is
~one data pass + one compile per split shape, not per snapshot.

The selected tst eval also dumps per-question gt/predicted layouts
(results/<exp>/<snap>.tst.layouts.npz) for tools/layout_shift.py — the
RL runs may abandon expert layouts for invented programs (VERDICT r4
weak #1: flag_v21_rlfull_s1 layout accuracy dropped to 0.88).

Usage:
  python -m n2nmn_tpu.tools.flag_select                  # all chains
  python -m n2nmn_tpu.tools.flag_select --exps flag_v21_rlfull_s1
"""

from __future__ import annotations

import argparse
import json
import os
import time

FULL_EXT = dict(num_mlp_ext=True, scene_ext=True, scene_bounded=True,
                count_mlp_ext=True)
# exp_name -> ClevrConfig extension overrides (must match how the
# snapshot was trained: scripts/flag_v21_r4.sh, flag_ext_r4.sh,
# combo2_r4.sh, flag_combo_seeds_r4.sh)
CHAINS = {}
for s in (0, 1, 2):
    CHAINS[f"flag_v21_gt_s{s}"] = {}
    CHAINS[f"flag_v21_rl_s{s}"] = {}
    CHAINS[f"flag_v21_gtfull_s{s}"] = FULL_EXT
    CHAINS[f"flag_v21_rlfull_s{s}"] = FULL_EXT
CHAINS["flag_v21_gtmlp_s0"] = dict(num_mlp_ext=True)
CHAINS["flag_v21_rlmlp_s0"] = dict(num_mlp_ext=True)
CHAINS["flag_v21_gtscene_s0"] = dict(scene_ext=True)
CHAINS["flag_v21_rlscene_s0"] = dict(scene_ext=True)
# the combo chain ran BEFORE count_mlp_ext/scene_bounded landed (its
# snapshot has the plain count head and the raw 'scene' subtree —
# scene_bounded names it 'scene_b'); flag_combo_r4.sh's EXT line was
# edited afterwards, the snapshot keys are the ground truth
CHAINS["flag_v21_gtcombo_s0"] = dict(num_mlp_ext=True, scene_ext=True)
CHAINS["flag_v21_rlcombo_s0"] = dict(num_mlp_ext=True, scene_ext=True)
# full2 = full with the residual comparison heads (num_res_ext) in
# place of the pure-MLP ones (scripts/r5_queue4.sh); these chains are
# NOT in the default sweep list — pass them via --exps once trained
FULL2_EXT = dict(num_res_ext=True, scene_ext=True, scene_bounded=True,
                 count_mlp_ext=True)
for s in (0, 1, 2):
    CHAINS[f"flag_v21_gtfull2_s{s}"] = FULL2_EXT
    CHAINS[f"flag_v21_rlfull2_s{s}"] = FULL2_EXT


def _snapshots(root, exp_name):
    d = os.path.join(root, "tfmodel", exp_name)
    return sorted(f[:-4] for f in os.listdir(d)
                  if f.endswith(".npz") and not f.endswith(".state.npz"))


def run(root, exps, out_jsonl, out_md, dump_layouts=True):
    from n2nmn_tpu.experiments import clevr

    rows = []
    os.makedirs(os.path.dirname(out_jsonl) or ".", exist_ok=True)
    for exp in exps:
        if not os.path.isdir(os.path.join(root, "tfmodel", exp)):
            # the round-3/4 parity chains' snapshots were pruned for disk
            # after their final-snapshot evals; chains without snapshots
            # cannot be re-selected retroactively — say so loudly rather
            # than silently covering less (no-silent-caps convention)
            print(f"SKIP {exp}: no snapshots under tfmodel/ "
                  "(pruned before the select-by-val protocol landed)",
                  flush=True)
            continue
        cfg = clevr.ClevrConfig(root=root, **CHAINS[exp])
        snaps = _snapshots(root, exp)
        t0 = time.time()
        val = clevr.evaluate_many(cfg, exp, snaps, "val")
        best = max(snaps, key=lambda s: val[s]["answer_accuracy"])
        tst = clevr.evaluate_many(cfg, exp, [best], "tst",
                                  dump_layouts=dump_layouts)[best]
        row = {
            "exp": exp, "snapshots": snaps, "selected": best,
            "val_accuracy_per_snapshot": {
                s: round(val[s]["answer_accuracy"], 5) for s in snaps},
            "val_accuracy_of_selected": val[best]["answer_accuracy"],
            "tst_answer_accuracy": tst["answer_accuracy"],
            "tst_layout_accuracy": tst["layout_accuracy"],
            "tst_layout_validity": tst["layout_validity"],
            "final_snapshot_was_selected": best == snaps[-1],
            "eval_s": round(time.time() - t0, 1),
            "ts": time.time(),
        }
        rows.append(row)
        with open(out_jsonl, "a") as f:
            f.write(json.dumps(row) + "\n")
        print("SELECT " + json.dumps(row), flush=True)

    with open(out_md, "w") as f:
        f.write("# Flagship select-by-val sweep (round 5)\n\n"
                "Protocol: every snapshot evaluated on val, best-val "
                "snapshot's tst accuracy reported (same as "
                "tools/replicate.py).\n\n")
        f.write("| exp | selected snap | val acc | tst acc | tst layout "
                "acc | final snap selected? |\n|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['exp']} | {r['selected']} | "
                    f"{r['val_accuracy_of_selected']:.4f} | "
                    f"{r['tst_answer_accuracy']:.4f} | "
                    f"{r['tst_layout_accuracy']:.4f} | "
                    f"{'yes' if r['final_snapshot_was_selected'] else 'NO'}"
                    " |\n")
    print(f"wrote {out_md}", flush=True)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./exp_clevr_flag")
    p.add_argument("--exps", nargs="*", default=sorted(CHAINS))
    p.add_argument("--out_jsonl",
                   default="./exp_clevr_flag/results/select_by_val_r5.jsonl")
    p.add_argument("--out_md",
                   default="./exp_clevr_flag/results/select_by_val_r5.md")
    p.add_argument("--no_dump_layouts", action="store_true")
    args = p.parse_args()
    run(args.root, args.exps, args.out_jsonl, args.out_md,
        dump_layouts=not args.no_dump_layouts)


if __name__ == "__main__":
    main()
