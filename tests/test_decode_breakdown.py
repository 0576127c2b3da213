"""tools/decode_breakdown.py: the component scans build, run, and
order sanely on CPU (interpret-mode kernel included)."""

import jax.numpy as jnp

from n2nmn_tpu.tools import decode_breakdown as db


def test_components_run_and_order():
    import jax
    n = 8
    dtype = jnp.float32
    params = db._params(n, jax.random.PRNGKey(0), dtype)
    empty, lstm_head, attn_xla, fused_maker, grammar = \
        db.build_programs(n, dtype)
    x0 = jnp.zeros((n, db.D), dtype)
    q0 = jax.random.normal(jax.random.PRNGKey(1), (n, db.D), dtype)
    s0 = jax.random.normal(jax.random.PRNGKey(2), (n, db.V), dtype)

    t_empty = db._timeit(empty, (params, x0), iters=2)
    t_lstm = db._timeit(lstm_head, (params, x0), iters=2)
    assert t_empty < t_lstm                 # the floor is the floor

    out_x = attn_xla(params, q0)
    out_f = fused_maker()(params, q0)
    # both attention variants compute the same chain
    assert jnp.allclose(out_x, out_f, rtol=1e-4, atol=1e-5)
    grammar(params, s0)                     # builds + runs
