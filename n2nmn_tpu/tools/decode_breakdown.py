"""Decode-scan cost decomposition (the VERDICT r2 weak-#1 evidence).

The flagship serving program's dominant phase is the decoder scan
(models/netgen.py): per step, a 2-layer LSTM + Bahdanau attention over
the encoder outputs + token head + grammar machinery. This tool times
each component as its own T_decoder-step scan so the decode_ms number
from tools/profile_eval.py can be attributed:

  empty      scan dispatch floor (trivial carry)
  lstm       LSTM stack + token head, attention stubbed (d2 = h_out)
  attn_xla   attention block alone, plain XLA (the production default)
  attn_fused attention block alone via the fused Pallas kernel
             (ops/pallas/attention.py) — streams enc_trans/enc_out once
  grammar    validity automaton + masked argmax alone

attn_xla vs attn_fused is the direct measurement of how much HBM
round-tripping XLA's lowering adds over the minimum-traffic kernel.

Usage: python -m n2nmn_tpu.tools.decode_breakdown \
           [--batch_sizes 256 1024] [--out perf/decode_breakdown.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

T_ENC, T_DEC, D, V, E = 45, 20, 512, 15, 300
V5E_HBM_GBPS = 819e9


def _timeit(fn, args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _params(n, key, dtype):
    ks = jax.random.split(key, 8)
    r = lambda k, *s: jax.random.normal(k, s, dtype) * 0.05
    return {
        "w0": r(ks[0], E + D, 4 * D), "w1": r(ks[1], 2 * D, 4 * D),
        "b0": jnp.zeros((4 * D,), dtype), "b1": jnp.zeros((4 * D,), dtype),
        "w_a": r(ks[2], D, D), "b_a": jnp.zeros((D,), dtype),
        "v": r(ks[3], D), "w_y": r(ks[4], 2 * D, V),
        "b_y": jnp.zeros((V,), dtype), "embed": r(ks[5], V, E),
        "enc_trans": r(ks[6], T_ENC, n, D), "enc_out": r(ks[7], T_ENC, n, D),
    }


def _lstm_step(p, inp, c0, h0, c1, h1):
    g0 = jnp.dot(jnp.concatenate([inp, h0], 1), p["w0"],
                 preferred_element_type=inp.dtype) + p["b0"]
    i, j, f, o = jnp.split(g0, 4, -1)
    c0 = c0 * jax.nn.sigmoid(f + 1) + jax.nn.sigmoid(i) * jnp.tanh(j)
    h0 = jnp.tanh(c0) * jax.nn.sigmoid(o)
    g1 = jnp.dot(jnp.concatenate([h0, h1], 1), p["w1"],
                 preferred_element_type=inp.dtype) + p["b1"]
    i, j, f, o = jnp.split(g1, 4, -1)
    c1 = c1 * jax.nn.sigmoid(f + 1) + jax.nn.sigmoid(i) * jnp.tanh(j)
    h1 = jnp.tanh(c1) * jax.nn.sigmoid(o)
    return c0, h0, c1, h1


def build_programs(n, dtype):
    mask = jnp.ones((T_ENC, n), dtype)

    def scan(step, carry0):
        def f(c, _):
            return step(c), None
        return jax.lax.scan(f, carry0, None, length=T_DEC)[0]

    @jax.jit
    def empty(p, x):
        return scan(lambda c: c + 1.0, x)

    @jax.jit
    def lstm_head(p, x):
        def step(c):
            c0, h0, c1, h1 = _lstm_step(p, c[0], *c[1:])
            scores = jnp.dot(jnp.concatenate([h1, h1], 1), p["w_y"],
                             preferred_element_type=h1.dtype) + p["b_y"]
            tok = jnp.argmax(scores, 1)
            return (p["embed"][tok], c0, h0, c1, h1)
        z = jnp.zeros((n, D), dtype)
        return scan(step, (jnp.zeros((n, E), dtype), z, z, z, z))[1]

    @jax.jit
    def attn_xla(p, q0):
        def step(q):
            att_raw = jnp.einsum(
                "tnd,d->tn", jnp.tanh(q[None] + p["enc_trans"]), p["v"])
            att = jax.nn.softmax(att_raw, axis=0) * mask
            att = att / jnp.sum(att, axis=0, keepdims=True)
            d2 = jnp.einsum("tn,tnd->nd", att, p["enc_out"])
            return q + 1e-6 * d2          # keep the chain sequential
        return scan(step, q0)

    @jax.jit
    def attn_xla_dot(p, q0):
        # same math, scores via a reshaped 2-D dot — probes whether XLA
        # fuses the tanh producer into a real dot better than into the
        # einsum reduction
        def step(q):
            x = jnp.tanh(q[None] + p["enc_trans"])          # [T, N, D]
            att_raw = (x.reshape(T_ENC * n, D)
                       @ p["v"][:, None]).reshape(T_ENC, n)
            att = jax.nn.softmax(att_raw, axis=0) * mask
            att = att / jnp.sum(att, axis=0, keepdims=True)
            d2 = jnp.einsum("tn,tnd->nd", att, p["enc_out"])
            return q + 1e-6 * d2
        return scan(step, q0)

    @jax.jit
    def attn_xla_int8(p, q0):
        # the ENC_INT8 serving path (models/netgen.py): enc tensors
        # quantized once outside the scan; per step the dequant fuses
        # into the tanh loop and the context sum's scale factors out —
        # half the HBM bytes of attn_xla
        from n2nmn_tpu.ops.pallas.kernels import quantize_grid
        et_q, s_t = quantize_grid(p["enc_trans"], axis=0)
        eo_q, s_o = quantize_grid(p["enc_out"], axis=0)
        s_t, s_o = s_t.astype(dtype), s_o.astype(dtype)

        def step(q):
            enc_t = et_q.astype(dtype) * s_t[None]
            att_raw = jnp.einsum(
                "tnd,d->tn", jnp.tanh(q[None] + enc_t), p["v"])
            att = jax.nn.softmax(att_raw, axis=0) * mask
            att = att / jnp.sum(att, axis=0, keepdims=True)
            d2 = jnp.sum(att[:, :, None] * eo_q.astype(dtype),
                         axis=0) * s_o
            return q + 1e-6 * d2
        return scan(step, q0)

    def attn_fused_maker():
        from n2nmn_tpu.ops.pallas.attention import (bahdanau_attention,
                                                    pad_time)

        @jax.jit
        def attn_fused(p, q0):
            et = pad_time(p["enc_trans"].transpose(1, 0, 2), 1)
            eo = pad_time(p["enc_out"].transpose(1, 0, 2), 1)
            m = pad_time(mask.T, 1)

            def step(q):
                att, d2 = bahdanau_attention(q, et, eo, p["v"], m)
                return q + 1e-6 * d2
            return scan(step, q0)
        return attn_fused

    from n2nmn_tpu.layout.grammar import ModuleGrammar
    g = ModuleGrammar(["_Scene", "_Find", "_Filter",
                       "_FindSameProperty", "_Transform", "_And",
                       "_Or", "_Exist", "_Count", "_EqualNum",
                       "_MoreNum", "_LessNum", "_SameProperty",
                       "_Describe", "<eos>"])

    @jax.jit
    def grammar_einsum(p, scores0):
        # the round-2 in-scan constraint evaluation (X @ W - b >= 0)
        P = jnp.asarray(g.P)
        W = jnp.asarray(g.W)
        b = jnp.asarray(g.b)

        def step(carry):
            X, s = carry
            cons = jnp.einsum("ns,svc->nvc", X, W) - b[None]
            valid = jnp.all(cons >= 0, axis=2)
            masked = jnp.where(valid, s, jnp.min(s) - 1.0)
            tok = jnp.argmax(masked, 1).astype(jnp.int32)
            return (X + P[tok], s + 1e-6)
        X0 = jnp.tile(jnp.array([[0, 0, T_DEC]], jnp.int32), (n, 1))
        return scan(step, (X0, scores0))

    @jax.jit
    def grammar_dfa(p, scores0):
        # tabulated automaton with a [S, V] row gather per step (the
        # first round-3 netgen form — measured to anti-scale: +0.5 ms
        # over the einsum automaton at batch 1024)
        valid_t, trans_t = g.tabulate(T_DEC)
        valid_t = jnp.asarray(valid_t)
        trans_flat = jnp.asarray(trans_t).reshape(-1)
        nv = valid_t.shape[1]

        def step(carry):
            st, s = carry
            valid = valid_t[st]
            masked = jnp.where(valid, s, jnp.min(s) - 1.0)
            tok = jnp.argmax(masked, 1).astype(jnp.int32)
            return (trans_flat[st * nv + tok], s + 1e-6)
        return scan(step, (jnp.zeros((n,), jnp.int32), scores0))

    @jax.jit
    def grammar_dfa_packed(p, scores0):
        # bit-packed tabulated automaton: rank-1 gathers only (the
        # production netgen path — see make_grammar_arrays)
        valid_t, trans_t = g.tabulate(T_DEC)
        nv = valid_t.shape[1]
        packed_t = jnp.asarray(
            (valid_t.astype(np.int64) << np.arange(nv)[None, :])
            .sum(1).astype(np.int32))
        trans_flat = jnp.asarray(trans_t).reshape(-1)
        bits = jnp.arange(nv, dtype=jnp.int32)[None, :]

        def step(carry):
            st, s = carry
            valid = ((packed_t[st][:, None] >> bits) & 1) != 0
            masked = jnp.where(valid, s, jnp.min(s) - 1.0)
            tok = jnp.argmax(masked, 1).astype(jnp.int32)
            return (trans_flat[st * nv + tok], s + 1e-6)
        return scan(step, (jnp.zeros((n,), jnp.int32), scores0))

    return (empty, lstm_head, attn_xla, attn_xla_dot, attn_xla_int8,
            attn_fused_maker, grammar_einsum, grammar_dfa,
            grammar_dfa_packed)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_sizes", type=int, nargs="+",
                   default=[256, 1024])
    p.add_argument("--f32", action="store_true")
    p.add_argument("--skip_fused", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    dtype_bytes = 4 if args.f32 else 2

    report = {"dtype": str(dtype.__name__), "t_enc": T_ENC,
              "t_dec": T_DEC, "sweep": []}
    for n in args.batch_sizes:
        key = jax.random.PRNGKey(0)
        params = _params(n, key, dtype)
        (empty, lstm_head, attn_xla, attn_xla_dot, attn_xla_int8,
         fused_maker, grammar_einsum, grammar_dfa,
         grammar_dfa_packed) = build_programs(n, dtype)
        q0 = jax.random.normal(key, (n, D), dtype)
        s0 = jax.random.normal(key, (n, V), dtype)
        x0 = jnp.zeros((n, D), dtype)

        rec = {"batch": n}
        rec["empty_ms"] = _timeit(empty, (params, x0)) * 1e3
        rec["lstm_head_ms"] = _timeit(lstm_head, (params, x0)) * 1e3
        rec["attn_xla_ms"] = _timeit(attn_xla, (params, q0)) * 1e3
        rec["attn_xla_dot_ms"] = _timeit(attn_xla_dot,
                                         (params, q0)) * 1e3
        rec["attn_xla_int8_ms"] = _timeit(attn_xla_int8,
                                          (params, q0)) * 1e3
        rec["grammar_einsum_ms"] = _timeit(grammar_einsum,
                                           (params, s0)) * 1e3
        rec["grammar_dfa_ms"] = _timeit(grammar_dfa, (params, s0)) * 1e3
        rec["grammar_dfa_packed_ms"] = _timeit(grammar_dfa_packed,
                                               (params, s0)) * 1e3
        if not args.skip_fused:
            try:
                fused = fused_maker()
                rec["attn_fused_ms"] = _timeit(fused, (params, q0)) * 1e3
            except Exception as e:   # Mosaic lowering may reject shapes
                rec["attn_fused_error"] = repr(e)[:300]
        # minimum attention traffic: 2 x [T_enc, N, D] per decode step
        rec["attn_roofline_ms"] = (
            T_DEC * 2 * T_ENC * n * D * dtype_bytes / V5E_HBM_GBPS) * 1e3
        rec["attn_int8_roofline_ms"] = (
            T_DEC * 2 * T_ENC * n * D * 1 / V5E_HBM_GBPS) * 1e3
        report["sweep"].append(rec)
        print(json.dumps(rec), flush=True)

    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
