"""Evidence-grade perf breakdown of the fused TRAIN step.

Eval got the round-2/3 attribution treatment (profile_eval, trace_ops);
this is the training-side counterpart. Splits the flagship CLEVR train
step (reference exp_clevr/train_clevr_gt_layout.py:23-44 config: N=64,
T_dec=10, sampling on) into

  forward            — jit(loss)                 (value only)
  forward+backward   — jit(grad(loss))           (adds reverse pass)
  full step          — steps.make_{cloning,rl}_step (adds Adam update)

so backward-pass and optimizer costs are measured, not guessed, and
sweeps batch size to show where training throughput saturates.

Usage:
  python -m n2nmn_tpu.tools.profile_train [--batch_sizes 64 256]
      [--mode cloning|rl] [--trace_dir DIR] [--out perf/profile_train.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
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


def flagship_train_model():
    import bench
    from n2nmn_tpu.models.nmn import NMNModel

    model = bench._flagship_model()
    net_cfg = dataclasses.replace(model.cfg.netgen, T_decoder=10,
                                  decoder_sampling=True)
    cfg = dataclasses.replace(model.cfg, netgen=net_cfg)
    return NMNModel(cfg, model.grammar)


def make_batch(model, n, t_enc=45, seed=0):
    rng_np = np.random.RandomState(seed)
    batch = {
        "text_seq": rng_np.randint(
            0, model.cfg.netgen.num_vocab_txt,
            size=(t_enc, n)).astype(np.int32),
        "seq_length": np.full((n,), t_enc, np.int32),
        "image": rng_np.randn(
            n, model.cfg.H_feat, model.cfg.W_feat,
            model.cfg.D_feat).astype(np.float32),
        "label": rng_np.randint(
            0, model.cfg.num_choices, size=(n,)).astype(np.int32),
        "gt_layout": np.full((model.cfg.netgen.T_decoder, n),
                             model.grammar.eos_idx, np.int32),
        "weight": np.ones((n,), np.float32),
    }
    return {k: jax.device_put(v) for k, v in batch.items()}


def profile_mode(model, mode, n, t_enc=45, iters=20):
    from n2nmn_tpu.models.modules import common as modules_common
    from n2nmn_tpu.train.optim import make_optimizer
    from n2nmn_tpu.train.steps import (
        _l2_for_decay, _xent, _wmean, create_train_state,
        make_cloning_step, make_rl_step)

    key = jax.random.PRNGKey(0)
    params = model.init(key)
    tx = make_optimizer(1e-3, max_grad_l2_norm=10.0)
    batch = make_batch(model, n, t_enc)
    use_gt = mode == "cloning"
    if not use_gt:
        batch = {k: v for k, v in batch.items() if k != "gt_layout"}

    # the same loss steps.py computes, re-stated here so fwd / fwd+bwd
    # can be timed as separate programs (steps.py only exposes the full
    # step); training_trace() matches the production kernel gating
    def loss_fn(p, b, rng):
        with modules_common.training_trace():
            out = model.apply(
                p, b["text_seq"], b["seq_length"], b["image"], rng,
                gt_layout=b.get("gt_layout"), use_gt_layout=use_gt,
                deterministic=False)
        w = b["weight"]
        xent = _xent(out.scores, b["label"])
        if use_gt:
            total = (_wmean(-out.log_seq_prob, w) + _wmean(xent, w)
                     + 5e-6 * _l2_for_decay(model, p))
        else:
            final = jnp.where(out.validity, xent, 0.5)
            total = (_wmean(final, w)
                     + _wmean(out.log_seq_prob
                              * jax.lax.stop_gradient(final), w)
                     + 0.005 * _wmean(out.neg_entropy, w)
                     + 5e-6 * _l2_for_decay(model, p))
        return total

    rng = jax.random.PRNGKey(1)
    fwd = jax.jit(loss_fn)
    fwd_bwd = jax.jit(jax.grad(loss_fn))
    if use_gt:
        step = make_cloning_step(model, tx, weight_decay=5e-6)
    else:
        step = make_rl_step(model, tx, weight_decay=5e-6,
                            lambda_entropy=0.005, invalid_expr_loss=0.5)
    state = create_train_state(params, tx, jax.random.fold_in(key, 1))

    t_fwd = _timeit(fwd, (params, batch, rng), iters)
    t_fwd_bwd = _timeit(fwd_bwd, (params, batch, rng), iters)

    state, _ = step(state, batch)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, batch)
    jax.block_until_ready(state.params)
    t_step = (time.perf_counter() - t0) / iters

    return {
        "mode": mode, "batch": n,
        "fwd_ms": round(t_fwd * 1e3, 3),
        "bwd_ms": round((t_fwd_bwd - t_fwd) * 1e3, 3),
        "optimizer_ms": round((t_step - t_fwd_bwd) * 1e3, 3),
        "step_ms": round(t_step * 1e3, 3),
        "steps_per_sec": round(1.0 / t_step, 2),
        "questions_per_sec": round(n / t_step, 1),
    }, (step, state, batch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_sizes", type=int, nargs="+",
                   default=[64, 256])
    p.add_argument("--mode", choices=["cloning", "rl", "both"],
                   default="both")
    p.add_argument("--t_enc", type=int, default=45)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace_dir", default=None,
                   help="jax.profiler capture of full steps at the last "
                        "batch size (feed to tools/trace_ops.py)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    model = flagship_train_model()
    modes = (["cloning", "rl"] if args.mode == "both" else [args.mode])
    rows = []
    traceable = None
    for mode in modes:
        for n in args.batch_sizes:
            row, traceable = profile_mode(model, mode, n, args.t_enc,
                                          args.iters)
            print(json.dumps(row), flush=True)
            rows.append(row)

    if args.trace_dir and traceable is not None:
        step, state, batch = traceable
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                state, _ = step(state, batch)
            jax.block_until_ready(state.params)
        print(f"trace written to {args.trace_dir}")

    if args.out:
        payload = {"dtype": "float32", "t_enc": args.t_enc,
                   "device": jax.devices()[0].device_kind,
                   "sweep": rows}
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
