"""Fused Bahdanau-attention kernel (ops/pallas/attention.py): forward
and gradient equivalence vs the plain-XLA decode-step formula
(models/netgen.py), in interpret mode on CPU, plus netgen-level
equivalence with the switch on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n2nmn_tpu.ops.pallas.attention import bahdanau_attention, pad_time


def _xla_reference(q, enc_trans_tnd, enc_out_tnd, v, mask_tn):
    att_raw = jnp.einsum("tnd,d->tn",
                         jnp.tanh(q[None] + enc_trans_tnd), v)
    att = jax.nn.softmax(att_raw, axis=0) * mask_tn
    att = att / jnp.sum(att, axis=0, keepdims=True)
    d2 = jnp.einsum("tn,tnd->nd", att, enc_out_tnd)
    return att, d2


def _case(t=11, n=13, d=32, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, d).astype(np.float32)
    enc_trans = rng.randn(t, n, d).astype(np.float32)
    enc_out = rng.randn(t, n, d).astype(np.float32)
    v = rng.randn(d).astype(np.float32)
    seq_len = rng.randint(1, t + 1, size=n)
    mask = (np.arange(t)[:, None] < seq_len[None, :]).astype(np.float32)
    return q, enc_trans, enc_out, v, mask


def _to_kernel_layout(enc_trans, enc_out, mask):
    return (pad_time(jnp.asarray(enc_trans).transpose(1, 0, 2), 1),
            pad_time(jnp.asarray(enc_out).transpose(1, 0, 2), 1),
            pad_time(jnp.asarray(mask).T, 1))


def test_forward_matches_xla():
    q, enc_trans, enc_out, v, mask = _case()
    t = enc_trans.shape[0]
    ref_att, ref_d2 = _xla_reference(q, enc_trans, enc_out, v, mask)
    et, eo, m = _to_kernel_layout(enc_trans, enc_out, mask)
    att, d2 = bahdanau_attention(jnp.asarray(q), et, eo,
                                 jnp.asarray(v), m)
    np.testing.assert_allclose(att[:, :t].T, ref_att, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(d2, ref_d2, rtol=1e-5, atol=1e-5)
    # padded time positions carry zero attention
    assert np.all(np.asarray(att[:, t:]) == 0.0)


def test_gradients_match_xla():
    q, enc_trans, enc_out, v, mask = _case(t=8, n=8, d=16, seed=1)
    t = enc_trans.shape[0]
    gk = np.random.RandomState(2)
    g_att = gk.randn(t, enc_trans.shape[1]).astype(np.float32)
    g_d2 = gk.randn(enc_out.shape[1], enc_out.shape[2]).astype(np.float32)

    def loss_ref(q, et, eo, v):
        att, d2 = _xla_reference(q, et, eo, v, mask)
        return jnp.sum(att * g_att) + jnp.sum(d2 * g_d2)

    def loss_ker(q, et, eo, v):
        etk, eok, mk = _to_kernel_layout(et, eo, mask)
        att, d2 = bahdanau_attention(q, etk, eok, v, mk)
        return jnp.sum(att[:, :t].T * g_att) + jnp.sum(d2 * g_d2)

    args = (jnp.asarray(q), jnp.asarray(enc_trans),
            jnp.asarray(enc_out), jnp.asarray(v))
    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    ker_grads = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(*args)
    for rg, kg in zip(ref_grads, ker_grads):
        np.testing.assert_allclose(np.asarray(kg), np.asarray(rg),
                                   rtol=1e-4, atol=1e-5)


def test_netgen_fused_equals_default(monkeypatch):
    """Full decode with N2NMN_FUSED_ATTENTION=1 must reproduce the
    default path's tokens and word_vecs."""
    from n2nmn_tpu.layout.grammar import ModuleGrammar
    from n2nmn_tpu.models.netgen import (NetgenConfig, init_netgen,
                                         run_netgen)

    grammar = ModuleGrammar(["_Find", "_Transform", "_And", "_Answer",
                             "<eos>"])
    cfg = NetgenConfig(
        num_vocab_txt=20, embed_dim_txt=12, num_vocab_nmn=5,
        embed_dim_nmn=8, lstm_dim=16, num_layers=2, T_decoder=6,
        decoder_sampling=False, mask_mode="grammar")
    params = init_netgen(jax.random.PRNGKey(0), cfg)
    from n2nmn_tpu.models.netgen import make_grammar_arrays
    ga = make_grammar_arrays(grammar, cfg.T_decoder)
    rng = np.random.RandomState(3)
    text = jnp.asarray(rng.randint(0, 20, size=(9, 7)), jnp.int32)
    sl = jnp.asarray(rng.randint(1, 10, size=7), jnp.int32)
    key = jax.random.PRNGKey(1)

    out_ref = run_netgen(params, cfg, ga, text, sl, key)
    monkeypatch.setenv("N2NMN_FUSED_ATTENTION", "1")
    out_fused = run_netgen(params, cfg, ga, text, sl, key)

    np.testing.assert_array_equal(np.asarray(out_fused.tokens),
                                  np.asarray(out_ref.tokens))
    np.testing.assert_allclose(np.asarray(out_fused.word_vecs),
                               np.asarray(out_ref.word_vecs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_fused.atts),
                               np.asarray(out_ref.atts),
                               rtol=1e-5, atol=1e-6)
