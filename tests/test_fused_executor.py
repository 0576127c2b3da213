"""The fully-fused Pallas CLEVR executor (ops/pallas/executor_step.py,
interpret mode on CPU) must reproduce the XLA lax.scan executor's scores
and validity on valid AND invalid programs."""

import jax
import jax.numpy as jnp
import numpy as np

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.layout.executor import build_tables, execute_layout
from n2nmn_tpu.models.modules import clevr as clevr_lib
from n2nmn_tpu.ops.pallas.executor_step import execute_layout_clevr_fused

from tests.test_executor import CLEVR_VOCAB, random_valid_programs


def _setup(T=10, H=5, W=6, D=16, C=28, N=12, seed=0):
    key = jax.random.PRNGKey(seed)
    grammar = ModuleGrammar(CLEVR_VOCAB)
    params = clevr_lib.init_params(key, D, 32, C, hw=H * W)
    k1, k2 = jax.random.split(key)
    image_feat = jax.random.normal(k1, (N, H, W, D))
    word_vecs = jax.random.normal(k2, (T, N, 32))
    pre_static, pre_step = clevr_lib.precompute(params, image_feat,
                                                word_vecs)
    tables = build_tables(grammar, clevr_lib.ATT_MODULES,
                          clevr_lib.ANS_MODULES)
    return grammar, params, tables, pre_static, pre_step, (T, H, W, C, N)


def _xla_scores(tokens, tables, params, pre_static, pre_step, dims):
    T, H, W, C, N = dims
    att_b, ans_b = clevr_lib.make_branches(params)
    shared = clevr_lib.make_step_shared(params)
    return execute_layout(tokens, tables, att_b, ans_b, pre_static,
                          pre_step, hw=H * W, num_choices=C, stack_size=T,
                          step_shared=shared)


def test_fused_matches_xla_on_valid_programs():
    (grammar, params, tables, pre_static, pre_step, dims) = _setup()
    T, H, W, C, N = dims
    tokens = jnp.asarray(random_valid_programs(grammar, T, N, seed=3))

    s_ref, v_ref = _xla_scores(tokens, tables, params, pre_static,
                               pre_step, dims)
    s_fused, v_fused = execute_layout_clevr_fused(
        tokens, tables, params, pre_static, pre_step,
        hw=H * W, num_choices=C, stack_size=T, h=H, w=W)
    np.testing.assert_array_equal(np.asarray(v_fused), np.asarray(v_ref))
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_invalid_programs_zeroed():
    (grammar, params, tables, pre_static, pre_step, dims) = _setup(N=8)
    T, H, W, C, N = dims
    rng = np.random.RandomState(5)
    tokens = rng.randint(0, grammar.num_vocab, size=(T, N)).astype(np.int32)
    for n in range(N):
        eos_pos = np.nonzero(tokens[:, n] == grammar.eos_idx)[0]
        if len(eos_pos):
            tokens[eos_pos[0]:, n] = grammar.eos_idx

    s_ref, v_ref = _xla_scores(jnp.asarray(tokens), tables, params,
                               pre_static, pre_step, dims)
    s_fused, v_fused = execute_layout_clevr_fused(
        jnp.asarray(tokens), tables, params, pre_static, pre_step,
        hw=H * W, num_choices=C, stack_size=T, h=H, w=W)
    np.testing.assert_array_equal(np.asarray(v_fused), np.asarray(v_ref))
    for n in range(N):
        if not np.asarray(v_ref)[n]:
            np.testing.assert_array_equal(np.asarray(s_fused)[n], 0.0)
        else:
            np.testing.assert_allclose(np.asarray(s_fused)[n],
                                       np.asarray(s_ref)[n],
                                       rtol=2e-4, atol=2e-5)


def test_fused_batch_padding():
    """N not divisible by the kernel batch block must pad + slice."""
    (grammar, params, tables, pre_static, pre_step, dims) = _setup(N=5)
    T, H, W, C, N = dims
    tokens = jnp.asarray(random_valid_programs(grammar, T, N, seed=11))
    s_ref, _ = _xla_scores(tokens, tables, params, pre_static, pre_step,
                           dims)
    s_fused, _ = execute_layout_clevr_fused(
        tokens, tables, params, pre_static, pre_step,
        hw=H * W, num_choices=C, stack_size=T, h=H, w=W)
    assert s_fused.shape == (N, C)
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-5)
