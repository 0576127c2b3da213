"""tools/decode_breakdown.py: the component scans build, run, and
order sanely on CPU (interpret-mode kernel included)."""

import jax.numpy as jnp

from n2nmn_tpu.tools import decode_breakdown as db


def test_components_run_and_order():
    import jax
    n = 8
    dtype = jnp.float32
    params = db._params(n, jax.random.PRNGKey(0), dtype)
    (empty, lstm_head, attn_xla, attn_xla_dot, attn_xla_int8,
     fused_maker, grammar_einsum, grammar_dfa,
     grammar_dfa_packed) = db.build_programs(n, dtype)
    x0 = jnp.zeros((n, db.D), dtype)
    q0 = jax.random.normal(jax.random.PRNGKey(1), (n, db.D), dtype)
    s0 = jax.random.normal(jax.random.PRNGKey(2), (n, db.V), dtype)

    t_empty = db._timeit(empty, (params, x0), iters=2)
    t_lstm = db._timeit(lstm_head, (params, x0), iters=2)
    assert t_empty < t_lstm                 # the floor is the floor

    out_x = attn_xla(params, q0)
    assert jnp.allclose(out_x, attn_xla_dot(params, q0), rtol=1e-4,
                        atol=1e-5)
    out_f = fused_maker()(params, q0)
    # both attention variants compute the same chain
    assert jnp.allclose(out_x, out_f, rtol=1e-4, atol=1e-5)
    # int8 variant within quantization error of the bf16/f32 chain
    out_q = attn_xla_int8(params, q0)
    assert jnp.allclose(out_x, out_q, rtol=1e-2, atol=1e-2)
    # the DFA grammar paths must choose the same tokens as the einsum path
    st_e, se = grammar_einsum(params, s0)
    st_d, sd = grammar_dfa(params, s0)
    assert jnp.allclose(se, sd)
    st_p, sp = grammar_dfa_packed(params, s0)
    assert jnp.allclose(se, sp)
    assert jnp.array_equal(st_d, st_p)
