"""Micro-breakdown of the executor scan at the flagship config (bf16).

Stubs out groups of work inside the executor to attribute wall-clock:
`full` vs `stub_branches` isolates the lax.scan machinery floor; `no_ans`
kills the stack consumers so XLA dead-code-eliminates the whole module
path (scan dispatch only remains); `no_transform`/`no_fsp`/
`no_shared_readout` remove one heavy branch each. Evidence for the
`perf/profile_*` roofline claims in README.

Usage: python -m n2nmn_tpu.tools.executor_breakdown [--batch 256]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from n2nmn_tpu.layout.executor import execute_layout
from n2nmn_tpu.models.netgen import run_netgen

VARIANTS = ["full", "stub_branches", "no_shared_readout", "no_transform",
            "no_fsp", "no_ans"]


def _timeit(f, *a, iters=30):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def make_exec(model, variant):
    cfg = model.cfg

    @jax.jit
    def run(params, tokens, wv, feat):
        pre_static, pre_step = model.lib.precompute(params["modules"],
                                                    feat, wv)
        att_b, ans_b = model.lib.make_branches(params["modules"])
        shared = model.lib.make_step_shared(params["modules"])

        def zero_ans(pre, pt, i0, i1, t):
            return jnp.zeros((i0.shape[0], cfg.num_choices), i0.dtype)

        identity = lambda pre, pt, i0, i1, t: i0
        if variant == "stub_branches":
            att_b = [identity] * len(att_b)
            ans_b = [zero_ans] * len(ans_b)
            shared = None
        elif variant == "no_shared_readout":
            shared = lambda pre, pt, i0, i1, t: {
                "readout0": jnp.zeros((i0.shape[0], cfg.D_feat), i0.dtype),
                "readout1": jnp.zeros((i0.shape[0], cfg.D_feat), i0.dtype)}
        elif variant == "no_transform":
            att_b = list(att_b)
            att_b[4] = identity
        elif variant == "no_fsp":
            att_b = list(att_b)
            att_b[3] = identity
        elif variant == "no_ans":
            ans_b = [zero_ans] * len(ans_b)
        return execute_layout(
            tokens, model.tables, att_b, ans_b, pre_static, pre_step,
            hw=cfg.H_feat * cfg.W_feat, num_choices=cfg.num_choices,
            stack_size=cfg.netgen.T_decoder, step_shared=shared)

    return run


def main():
    import bench

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--t_enc", type=int, default=45)
    args = p.parse_args()

    model = bench._flagship_model()
    cfg = model.cfg
    params = bench._cast_bf16(model.init(jax.random.PRNGKey(0)))
    key = jax.random.PRNGKey(0)
    text = jax.random.randint(key, (args.t_enc, args.batch), 0, 82,
                              jnp.int32)
    sl = jnp.full((args.batch,), args.t_enc, jnp.int32)
    feat = jax.random.normal(
        key, (args.batch, cfg.H_feat, cfg.W_feat, cfg.D_feat),
        jnp.bfloat16)

    @jax.jit
    def decode(params, text, sl, rng):
        out = run_netgen(params["netgen"], cfg.netgen, model.grammar_arrays,
                         text, sl, rng, deterministic=True)
        return out.tokens, out.word_vecs

    tokens, wv = decode(params, text, sl, jax.random.PRNGKey(1))
    jax.block_until_ready(tokens)

    from n2nmn_tpu.models.modules import common
    print("TRANSFORM_IMPL:", common.TRANSFORM_IMPL)
    for v in VARIANTS:
        f = make_exec(model, v)
        print(v, round(_timeit(f, params, tokens, wv, feat), 3), "ms")


if __name__ == "__main__":
    main()
