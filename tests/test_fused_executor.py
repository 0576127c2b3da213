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


def test_env_gate_routes_model_apply_through_fused(monkeypatch):
    """N2NMN_FUSED_EXECUTOR=1 must route NMNModel.apply's deterministic
    CLEVR forward through the kernel and agree with the default path."""
    from n2nmn_tpu.models.netgen import NetgenConfig
    from n2nmn_tpu.models.nmn import NMNConfig, NMNModel

    grammar = ModuleGrammar(CLEVR_VOCAB)
    net_cfg = NetgenConfig(
        num_vocab_txt=20, embed_dim_txt=12, num_vocab_nmn=grammar.num_vocab,
        embed_dim_nmn=12, lstm_dim=24, num_layers=1, T_decoder=6,
        decoder_sampling=False, mask_mode="grammar")
    cfg = NMNConfig(flavor="clevr", netgen=net_cfg, num_choices=9,
                    H_feat=3, W_feat=4, D_feat=10)
    model = NMNModel(cfg, grammar)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    text = jax.random.randint(key, (7, 6), 0, 20, jnp.int32)
    sl = jnp.full((6,), 7, jnp.int32)
    feat = jax.random.normal(key, (6, 3, 4, 10))
    rng = jax.random.PRNGKey(2)

    out_default = model.apply(params, text, sl, feat, rng,
                              deterministic=True)
    monkeypatch.setenv("N2NMN_FUSED_EXECUTOR", "1")
    assert model._use_fused_executor(True, feat.shape[0])
    # training keeps XLA
    assert not model._use_fused_executor(False, feat.shape[0])
    out_fused = model.apply(params, text, sl, feat, rng,
                            deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_fused.tokens),
                                  np.asarray(out_default.tokens))
    np.testing.assert_array_equal(np.asarray(out_fused.validity),
                                  np.asarray(out_default.validity))
    np.testing.assert_allclose(np.asarray(out_fused.scores),
                               np.asarray(out_default.scores),
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
