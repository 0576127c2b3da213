"""Netgen (layout-policy seq2seq) semantics tests — the behavioral
contracts replicated from the reference decoder (nmn3_netgen_att.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.layout.assembler import Assembler, INVALID_EXPR
from n2nmn_tpu.models.netgen import NetgenConfig, init_netgen, run_netgen

CLEVR_VOCAB = ["_Scene", "_Find", "_Filter", "_FindSameProperty",
               "_Transform", "_And", "_Or", "_Exist", "_Count",
               "_EqualNum", "_MoreNum", "_LessNum", "_SameProperty",
               "_Describe", "<eos>"]
SHAPES_VOCAB = ["_Find", "_Transform", "_And", "_Answer", "<eos>"]


def _make(vocab, mask_mode, sampling, T_dec=8, lstm=32, embed=16):
    grammar = ModuleGrammar(vocab)
    cfg = NetgenConfig(
        num_vocab_txt=30, embed_dim_txt=embed,
        num_vocab_nmn=grammar.num_vocab, embed_dim_nmn=embed,
        lstm_dim=lstm, num_layers=2, T_decoder=T_dec,
        decoder_sampling=sampling, mask_mode=mask_mode)
    params = init_netgen(jax.random.PRNGKey(0), cfg)
    from n2nmn_tpu.models.netgen import make_grammar_arrays
    arrays = make_grammar_arrays(grammar, T_dec)
    return grammar, cfg, params, arrays


def _inputs(T_enc=10, N=12, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(0, 30, size=(T_enc, N)).astype(np.int32)
    lengths = rng.randint(3, T_enc + 1, size=N).astype(np.int32)
    return jnp.asarray(text), jnp.asarray(lengths)


@pytest.mark.parametrize("sampling", [True, False])
def test_grammar_masked_decoding_always_valid(sampling):
    """Masked decoding must emit stack-checker-valid programs — the
    invariant CLEVR training asserts (train_clevr_rl_gt_layout.py:204)."""
    grammar, cfg, params, arrays = _make(CLEVR_VOCAB, "grammar", sampling)
    text, lengths = _inputs()
    asm = Assembler(grammar)
    for seed in range(3):
        out = run_netgen(params, cfg, arrays, text, lengths,
                         jax.random.PRNGKey(seed))
        _, validity = asm.assemble(np.asarray(out.tokens))
        assert np.all(validity)
        # probs of emitted tokens positive; log_seq_prob finite
        assert np.all(np.asarray(out.token_probs) > 0)
        assert np.all(np.isfinite(np.asarray(out.log_seq_prob)))


def test_teacher_forcing_emits_gt_exactly():
    grammar, cfg, params, arrays = _make(CLEVR_VOCAB, "grammar", True)
    text, lengths = _inputs()
    N = text.shape[1]
    gt = np.full((cfg.T_decoder, N), grammar.eos_idx, np.int32)
    gt[0] = grammar.name2idx["_Find"]
    gt[1] = grammar.name2idx["_Describe"]
    out = run_netgen(params, cfg, arrays, text, lengths,
                     jax.random.PRNGKey(0), gt_layout=jnp.asarray(gt),
                     use_gt_layout=True)
    np.testing.assert_array_equal(np.asarray(out.tokens), gt)
    # with gt, probs are plain softmax probs (validity OR'd true:
    # reference nmn3_netgen_att.py:204-207) -> all in (0, 1)
    p = np.asarray(out.token_probs)
    assert np.all((p > 0) & (p < 1))
    np.testing.assert_allclose(
        np.asarray(out.log_seq_prob), np.log(p).sum(axis=0), rtol=1e-5)


def test_eos_forcing_in_unmasked_mode():
    """SHAPES decoder: after the first <eos>, emit <eos> with prob 1 and
    zero entropy (reference models_shapes/nmn3_netgen_att.py:210-222)."""
    grammar, cfg, params, arrays = _make(SHAPES_VOCAB, "eos_force", True,
                                         T_dec=11)
    text, lengths = _inputs(N=32)
    out = run_netgen(params, cfg, arrays, text, lengths,
                     jax.random.PRNGKey(1))
    tokens = np.asarray(out.tokens)
    probs = np.asarray(out.token_probs)
    for n in range(tokens.shape[1]):
        eos_pos = np.nonzero(tokens[:, n] == grammar.eos_idx)[0]
        if len(eos_pos) > 0:
            first = eos_pos[0]
            # everything after the first <eos> is <eos> with prob 1
            assert np.all(tokens[first + 1:, n] == grammar.eos_idx)
            np.testing.assert_allclose(probs[first + 1:, n], 1.0)


def test_encoder_respects_seq_length():
    """Question tokens beyond seq_length must not affect anything
    (dynamic_rnn sequence_length semantics)."""
    grammar, cfg, params, arrays = _make(CLEVR_VOCAB, "grammar", False)
    text, lengths = _inputs(T_enc=9, N=6, seed=3)
    out1 = run_netgen(params, cfg, arrays, text, lengths,
                      jax.random.PRNGKey(0))
    # scramble the padding region
    text2 = np.asarray(text).copy()
    for n in range(text2.shape[1]):
        text2[int(lengths[n]):, n] = 29
    out2 = run_netgen(params, cfg, arrays, jnp.asarray(text2), lengths,
                      jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out1.tokens),
                                  np.asarray(out2.tokens))
    np.testing.assert_allclose(np.asarray(out1.word_vecs),
                               np.asarray(out2.word_vecs), atol=1e-6)


def test_attention_normalized_over_question():
    grammar, cfg, params, arrays = _make(CLEVR_VOCAB, "grammar", False)
    text, lengths = _inputs(T_enc=9, N=6, seed=4)
    out = run_netgen(params, cfg, arrays, text, lengths,
                     jax.random.PRNGKey(0))
    atts = np.asarray(out.atts)  # [T_dec, T_enc, N]
    np.testing.assert_allclose(atts.sum(axis=1), 1.0, rtol=1e-5)
    # attention beyond seq_length must be zero (seq_not_finished mask)
    for n in range(atts.shape[2]):
        assert np.all(atts[:, int(lengths[n]):, n] == 0)


@pytest.mark.parametrize("sampling", [False, True])
def test_early_exit_matches_scan(sampling, monkeypatch):
    """EARLY_EXIT serving decode: the while_loop that stops at all-<eos>
    must reproduce the scan path exactly — post-eos rows ARE the
    constants it pre-fills (DFA pins finished sequences to <eos>, prob
    1, logprob 0, entropy 0). Bias the token head toward <eos> so
    programs finish early and the exit actually fires."""
    from n2nmn_tpu.models.modules import common

    grammar, cfg, params, arrays = _make(CLEVR_VOCAB, "grammar", sampling)
    # bias <eos> AND the answer modules (the grammar only admits <eos>
    # after an answer-module root, so biasing <eos> alone cannot
    # shortcut an att-module chain)
    b = params["decoder"]["token_pred"]["b"]
    b = b.at[grammar.eos_idx].add(50.0)
    for name in ["_Exist", "_Count", "_EqualNum", "_MoreNum", "_LessNum",
                 "_SameProperty", "_Describe"]:
        b = b.at[grammar.name2idx[name]].add(25.0)
    params["decoder"]["token_pred"]["b"] = b
    text, lengths = _inputs()

    base = run_netgen(params, cfg, arrays, text, lengths,
                      jax.random.PRNGKey(2))
    tok_b = np.asarray(base.tokens)
    # sanity: the batch really finishes before T_decoder
    done_t = np.argmax(np.all(tok_b == grammar.eos_idx, axis=1))
    assert np.all(tok_b == grammar.eos_idx, axis=1).any()
    assert done_t < cfg.T_decoder - 1

    monkeypatch.setattr(common, "EARLY_EXIT", "1")
    ee = run_netgen(params, cfg, arrays, text, lengths,
                    jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(ee.tokens), tok_b)
    np.testing.assert_allclose(np.asarray(ee.token_probs),
                               np.asarray(base.token_probs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ee.log_seq_prob),
                               np.asarray(base.log_seq_prob),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ee.neg_entropy),
                               np.asarray(base.neg_entropy),
                               rtol=1e-6, atol=1e-6)
    # attention maps agree on every executed step; skipped steps are
    # zero-filled (their word_vecs feed no-op executor steps only)
    np.testing.assert_allclose(np.asarray(ee.atts)[:done_t + 1],
                               np.asarray(base.atts)[:done_t + 1],
                               rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(ee.atts)[done_t + 1:] == 0)


@pytest.mark.parametrize("sampling", [False, True])
def test_early_exit_matches_scan_eos_force(sampling, monkeypatch):
    """Early exit in SHAPES' unmasked eos_force mode: the post-<eos>
    overrides (netgen.py eos_force branch) produce the same constants
    the early-exit path pre-fills, so outputs must match exactly."""
    from n2nmn_tpu.models.modules import common

    grammar, cfg, params, arrays = _make(SHAPES_VOCAB, "eos_force",
                                         sampling, T_dec=11)
    b = params["decoder"]["token_pred"]["b"]
    params["decoder"]["token_pred"]["b"] = b.at[grammar.eos_idx].add(50.0)
    text, lengths = _inputs()

    base = run_netgen(params, cfg, arrays, text, lengths,
                      jax.random.PRNGKey(3))
    tok_b = np.asarray(base.tokens)
    done_t = np.argmax(np.all(tok_b == grammar.eos_idx, axis=1))
    assert np.all(tok_b == grammar.eos_idx, axis=1).any()
    assert done_t < cfg.T_decoder - 1

    monkeypatch.setattr(common, "EARLY_EXIT", "1")
    ee = run_netgen(params, cfg, arrays, text, lengths,
                    jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(ee.tokens), tok_b)
    np.testing.assert_allclose(np.asarray(ee.token_probs),
                               np.asarray(base.token_probs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ee.log_seq_prob),
                               np.asarray(base.log_seq_prob),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ee.neg_entropy),
                               np.asarray(base.neg_entropy),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ee.atts)[:done_t + 1],
                               np.asarray(base.atts)[:done_t + 1],
                               rtol=1e-5, atol=1e-6)
