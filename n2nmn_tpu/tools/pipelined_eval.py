"""Software-pipelined eval: decode batch k+1 and execute batch k in ONE
XLA program.

The fused eval program at N=1024 splits into a latency-bound decode
phase (7.1 ms vs a 3.4 ms roofline — a 20-step serial LSTM chain that
leaves HBM bandwidth idle) and a bandwidth-bound executor phase (15.6 ms
vs 8.0 — large grid streams that leave the MXU idle), with only ~1.3 ms
of measured overlap between them (perf/profile_fsp_r3_fused1024.json).
They run back to back because the executor consumes the decode's tokens.

Across BATCHES there is no such dependency: executing batch k needs only
batch k's decode, already done. So this runner carries two half-batches
per program — execute(k) and decode(k+1) are data-independent inside one
jitted call, and XLA's latency-hiding scheduler is free to interleave
the executor's HBM streams with the decode chain's stalls (the
cross-batch overlap the reference's two-phase loop structurally cannot
express, exp_clevr/eval_clevr.py:93-165).

    python -m n2nmn_tpu.tools.pipelined_eval --batch 512 1024
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_pipeline_fns(model):
    """(prologue, step, epilogue) jitted fns over half-batches, built on
    the model's official phase split (NMNModel.decode_phase /
    execute_phase — qpn, in-graph backbones, and the fused-executor gate
    all included).

    step(...) runs decode(batch k+1) AND execute(batch k) in one
    program; the carried decode outputs stay device arrays (never
    fetched to host)."""

    @jax.jit
    def prologue(params, text_seq, seq_length, rng):
        return model.decode_phase(params, text_seq, seq_length, rng)

    @jax.jit
    def step(params, text_seq, seq_length, rng, net_out, qpn_rng,
             image_input):
        # decode(k+1) and execute(k) share no data -> XLA may interleave
        out = model.execute_phase(params, net_out, image_input, qpn_rng)
        carry = model.decode_phase(params, text_seq, seq_length, rng)
        return carry, (jnp.argmax(out.scores, axis=1), out.validity,
                       out.tokens)

    @jax.jit
    def epilogue(params, net_out, qpn_rng, image_input):
        out = model.execute_phase(params, net_out, image_input, qpn_rng)
        return (jnp.argmax(out.scores, axis=1), out.validity, out.tokens)

    return prologue, step, epilogue


def run_pipelined(model, params, batches, rng, fns=None):
    """batches: list of (text_seq, seq_length, image_input) device
    tuples. Returns a list of (predictions, validity, tokens) device
    triples, one per batch.

    fns: the (prologue, step, epilogue) triple from make_pipeline_fns —
    PASS IT when calling more than once, or each call builds fresh
    jax.jit wrappers whose caches start empty (three compilation-cache
    deserializations per call; measured 30x slower than the steps
    themselves at N=1024)."""
    prologue, step, epilogue = fns or make_pipeline_fns(model)
    outs = []
    text, sl, img = batches[0]
    carry = prologue(params, text, sl, rng)
    for k in range(1, len(batches)):
        text, sl, next_img = batches[k]
        carry, out = step(params, text, sl, rng, *carry, img)
        img = next_img
        outs.append(out)
    outs.append(epilogue(params, *carry, img))
    return outs


def _bench(args):
    import bench as benchmod

    model = benchmod._flagship_model()
    params = model.init(jax.random.PRNGKey(0))
    if benchmod.BF16:
        params = benchmod._cast_bf16(params)
    rng = jax.random.PRNGKey(1)
    key = jax.random.PRNGKey(0)
    t_enc = 45
    results = {"device": str(jax.devices()[0]),
               "dtype": "bfloat16" if benchmod.BF16 else "float32",
               "sweep": []}

    for n in args.batch:
        half = n // 2
        fdt = jnp.bfloat16 if benchmod.BF16 else jnp.float32

        def mk(nb, m):
            return [(jax.random.randint(jax.random.fold_in(key, i),
                                        (t_enc, m), 0, 82, jnp.int32),
                     jnp.full((m,), t_enc, jnp.int32),
                     jax.random.normal(jax.random.fold_in(key, 100 + i),
                                       (m, 10, 15, 512), fdt))
                    for i in range(nb)]

        # baseline: the standard fused single-batch program at N=n
        from __graft_entry__ import entry
        fused, _ = (jax.jit(entry()[0]), None)
        b_full = mk(args.iters, n)
        out = fused(params, *b_full[0], rng)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for b in b_full:
            out = fused(params, *b, rng)
        jax.block_until_ready(out)
        fused_qps = args.iters * n / (time.perf_counter() - t0)

        # pipelined: same question count in half-batches, 2 in flight
        b_half = mk(2 * args.iters, half)
        fns = make_pipeline_fns(model)
        outs = run_pipelined(model, params, b_half[:4], rng,
                             fns=fns)   # compile
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = run_pipelined(model, params, b_half, rng, fns=fns)
        jax.block_until_ready(outs)
        pipe_qps = 2 * args.iters * half / (time.perf_counter() - t0)

        if args.trace_dir:
            # short traced lap for tools/trace_ops attribution of the
            # anti-scaling past 2x512 (VERDICT r4 weak #3)
            d = f"{args.trace_dir}/pipelined_{n}"
            with jax.profiler.trace(d):
                outs = run_pipelined(model, params, b_half[:6], rng,
                                     fns=fns)
                jax.block_until_ready(outs)
            print(f"trace written to {d}", flush=True)

        row = {"batch": n, "half": half, "fused_qps": round(fused_qps, 1),
               "pipelined_qps": round(pipe_qps, 1),
               "speedup": round(pipe_qps / fused_qps, 3)}
        print(row, flush=True)
        results["sweep"].append(row)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[512, 1024])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default=None)
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler trace per batch size "
                        "(fold with tools/trace_ops)")
    _bench(p.parse_args())
