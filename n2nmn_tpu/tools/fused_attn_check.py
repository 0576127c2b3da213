"""Fused-attention serving equivalence on a trained snapshot.

Greedy-evals a full split twice — default XLA decode vs the fused
Pallas Bahdanau step (N2NMN_FUSED_ATTENTION=1, ops/pallas/attention.py)
— and compares layout tokens, predicted answers, and validity exactly.
The kernel computes a masked softmax where the XLA path computes
softmax-then-mask-renormalize; these are the same function, so on a
trained model the argmax outputs must match (bit differences only from
float reassociation). The fused path is only claimed serving-safe where
this check passes.

Usage:
  python -m n2nmn_tpu.tools.fused_attn_check --data_root ./exp_clevr_mini \
      --exp_name mini_clevr_gt_layout_s0 --snapshot_name 00060000 \
      --test_split tst [--bf16]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def run(data_root, exp_name, snapshot_name, test_split, T_decoder=20,
        bf16=False):
    from n2nmn_tpu.experiments import clevr
    from n2nmn_tpu.train.checkpoint import load_params
    from n2nmn_tpu.train.steps import make_eval_step

    cfg = clevr.ClevrConfig(root=data_root)
    imdb = clevr._load_imdb(cfg, f"data/imdb/imdb_{test_split}.npy")
    cfg = clevr.infer_feature_dims(cfg, imdb)
    model, grammar = clevr.build_model(cfg, sampling=False,
                                       T_decoder=T_decoder)
    params_t = model.init(jax.random.PRNGKey(0))
    params, _ = load_params(
        os.path.join(cfg.root, "tfmodel", exp_name, snapshot_name),
        params_t)
    if bf16:
        params = jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.bfloat16)
                       if x.dtype == jnp.float32 else x), params)
    rng = jax.random.PRNGKey(0)

    os.environ["N2NMN_FUSED_ATTENTION"] = "0"
    eval_default = make_eval_step(model)
    os.environ["N2NMN_FUSED_ATTENTION"] = "1"
    eval_fused = make_eval_step(model)   # separate jit => fresh trace

    reader = clevr.make_reader(cfg, imdb, grammar, shuffle=False,
                               one_pass=True, T_decoder=T_decoder)
    n_total = tok_mm = pred_mm = val_mm = 0
    for batch in reader.batches():
        n = batch.pop("n_real")
        for k in ("image_path", "gt_layout"):
            batch.pop(k, None)
        labels = batch.pop("label", None)
        out0 = eval_default(params, batch, rng)
        out1 = eval_fused(params, batch, rng)
        tok_mm += int(np.sum(np.any(
            np.asarray(out0["tokens"])[:, :n]
            != np.asarray(out1["tokens"])[:, :n], axis=0)))
        pred_mm += int(np.sum(np.asarray(out0["predictions"])[:n]
                              != np.asarray(out1["predictions"])[:n]))
        val_mm += int(np.sum(np.asarray(out0["validity"])[:n]
                             != np.asarray(out1["validity"])[:n]))
        n_total += n
    os.environ["N2NMN_FUSED_ATTENTION"] = "0"

    report = {
        "data_root": data_root, "exp": exp_name, "snap": snapshot_name,
        "split": test_split, "n": n_total,
        "dtype": "bfloat16" if bf16 else "float32",
        "token_seq_mismatches": tok_mm,
        "prediction_mismatches": pred_mm,
        "validity_mismatches": val_mm,
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./exp_clevr_mini")
    p.add_argument("--exp_name", default="mini_clevr_gt_layout")
    p.add_argument("--snapshot_name", default="00060000")
    p.add_argument("--test_split", default="tst")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    rep = run(args.data_root, args.exp_name, args.snapshot_name,
              args.test_split, bf16=args.bf16)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=2)
