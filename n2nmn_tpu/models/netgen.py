"""Layout-policy seq2seq ("netgen"): LSTM encoder over the question +
attentional LSTM decoder emitting module tokens.

TPU-native re-design of the reference AttentionSeq2Seq
(models_clevr/nmn3_netgen_att.py, byte-identical copy in models_vqa/, and
the unmasked variant in models_shapes/nmn3_netgen_att.py): the
tf.nn.raw_rnn custom loop becomes a jax.lax.scan whose carry threads the
LSTM state, the grammar-automaton state X, the PRNG key, and (for the
unmasked variant) the <eos>-latch. Both dataset variants are one function,
switched by ``mask_mode``:

  * ``"grammar"`` — in-graph validity masking, sampling with a -50 logit
    penalty on invalid tokens and argmax-over-valid fallback,
    renormalized probabilities and entropy over valid tokens only
    (reference nmn3_netgen_att.py:200-260). The reference's per-step
    X@W-b>=0 constraint evaluation is compiled into a DFA offline
    (grammar.py:tabulate) — identical semantics (differentially tested),
    two gathers per step instead of an integer einsum + reduction.
  * ``"eos_force"`` — unconstrained sampling; after the first <eos> the
    decoder emits <eos> with probability 1 and zero entropy (reference
    models_shapes/nmn3_netgen_att.py:210-222).

Semantics preserved exactly; only the execution model changed (single
compiled scan instead of a host-driven loop runtime).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from n2nmn_tpu.ops.nn import init_fc, apply_fc, init_embedding, xavier_uniform
from n2nmn_tpu.ops.lstm import init_lstm_stack, lstm_stack_step, encode_sequence


@dataclasses.dataclass(frozen=True)
class NetgenConfig:
    num_vocab_txt: int
    embed_dim_txt: int
    num_vocab_nmn: int
    embed_dim_nmn: int
    lstm_dim: int
    num_layers: int
    T_decoder: int
    encoder_dropout: bool = False
    decoder_dropout: bool = False
    decoder_sampling: bool = True
    mask_mode: str = "grammar"  # "grammar" | "eos_force"


def init_netgen(key, cfg: NetgenConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    return {
        "encoder": {
            "embedding": init_embedding(
                keys[0], cfg.num_vocab_txt, cfg.embed_dim_txt, dtype),
            "lstm": init_lstm_stack(
                keys[1], cfg.embed_dim_txt, cfg.lstm_dim, cfg.num_layers,
                dtype),
            "h_transform": init_fc(keys[2], cfg.lstm_dim, cfg.lstm_dim,
                                   dtype=dtype),
        },
        "decoder": {
            "embedding": init_embedding(
                keys[3], cfg.num_vocab_nmn, cfg.embed_dim_nmn, dtype),
            "go": xavier_uniform(keys[4], (1, cfg.embed_dim_nmn), dtype),
            "lstm": init_lstm_stack(
                keys[5], cfg.embed_dim_nmn, cfg.lstm_dim, cfg.num_layers,
                dtype),
            "att_w": init_fc(keys[6], cfg.lstm_dim, cfg.lstm_dim,
                             dtype=dtype),
            # attention vector v (not L2-regularized in the reference —
            # stored under key 'v', not 'w')
            "att_v": xavier_uniform(keys[7], (1, cfg.lstm_dim), dtype)[0],
            "token_pred": init_fc(
                jax.random.fold_in(key, 99), 2 * cfg.lstm_dim,
                cfg.num_vocab_nmn, dtype=dtype),
        },
    }


def make_grammar_arrays(grammar, T_decoder: int) -> dict:
    """Device arrays for run_netgen: the tabulated validity DFA
    (grammar.tabulate) + the eos index.

    The [S, V] bool validity table is BIT-PACKED to one int32 per state:
    a [S, V] row gather lowers poorly on TPU (V=15 occupies a fraction
    of one 128-lane register, and decode_breakdown measured the row
    gather at +0.5 ms/decode over the einsum automaton at batch 1024),
    while a rank-1 [N]-from-[S] gather plus a broadcasted shift/mask is
    pure lane-parallel VPU work. The transition table is flattened for
    the same reason (one rank-1 gather at state*V+token)."""
    import numpy as np

    valid, trans = grammar.tabulate(T_decoder)
    S, V = valid.shape
    assert V < 32, f"bit-packed DFA supports V<32 tokens, got {V}"
    packed = (valid.astype(np.int64) << np.arange(V)[None, :]).sum(1)
    return {
        "dfa_valid_packed": jnp.asarray(packed.astype(np.int32)),  # [S]
        "dfa_trans_flat": jnp.asarray(
            np.ascontiguousarray(trans.reshape(-1))),              # [S*V]
        "num_vocab": V,
        "eos_idx": grammar.eos_idx,
    }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NetgenOutput:
    tokens: jnp.ndarray        # [T_dec, N] int32
    token_probs: jnp.ndarray   # [T_dec, N]
    log_seq_prob: jnp.ndarray  # [N]
    neg_entropy: jnp.ndarray   # [N]
    word_vecs: jnp.ndarray     # [T_dec, N, embed_dim_txt]
    atts: jnp.ndarray          # [T_dec, T_enc, N]
    encoder_h_final: jnp.ndarray  # [L, N, D] final hidden per layer (for qpn)


def run_netgen(params, cfg: NetgenConfig, grammar_arrays,
               text_seq, seq_length, rng,
               gt_layout: Optional[jnp.ndarray] = None,
               use_gt_layout: bool = False,
               deterministic: bool = True) -> NetgenOutput:
    """Encode the question and decode a module-token layout.

    text_seq: [T_enc, N] int32 (time-major, like the reference);
    seq_length: [N]; gt_layout: [T_dec, N] when use_gt_layout.
    grammar_arrays: dict with 'dfa_valid_packed' [S] int32 (bit v =
    validity of token v), 'dfa_trans_flat' [S*V] int32 (the tabulated
    validity automaton, grammar.tabulate) and 'eos_idx'; build with
    ``make_grammar_arrays``.
    """
    enc_p, dec_p = params["encoder"], params["decoder"]
    T_enc, N = text_seq.shape
    D = cfg.lstm_dim
    V = cfg.num_vocab_nmn
    rng, enc_drop_key, dec_drop_key = jax.random.split(rng, 3)

    # ---------------- encoder ----------------
    embedded_seq = enc_p["embedding"]["table"][text_seq]      # [T,N,E]
    enc_out, (enc_c, enc_h) = encode_sequence(
        enc_p["lstm"], embedded_seq, seq_length,
        dropout_key=enc_drop_key,
        deterministic=deterministic or not cfg.encoder_dropout)
    # fc transform of outputs for attention alignment
    enc_trans = apply_fc(enc_p["h_transform"],
                         enc_out.reshape(T_enc * N, D)).reshape(T_enc, N, D)
    seq_not_finished = (jnp.arange(T_enc)[:, None]
                        < seq_length[None, :]).astype(enc_out.dtype)  # [T,N]

    # Optional fused Bahdanau step (ops/pallas/attention.py): stream the
    # two loop-invariant [T_enc, N, D] encoder tensors through VMEM once
    # per decode step instead of materializing the tanh operand to HBM.
    # The kernel wants batch-major layout with T padded to x8 — transpose
    # ONCE here, amortized over all T_decoder steps.
    from n2nmn_tpu.ops.pallas.attention import (
        bahdanau_attention, fused_attention_enabled, pad_time)
    use_fused_att = fused_attention_enabled()
    if use_fused_att:
        enc_trans_nt = pad_time(enc_trans.transpose(1, 0, 2), 1)
        enc_out_nt = pad_time(enc_out.transpose(1, 0, 2), 1)
        mask_nt = pad_time(seq_not_finished.T, 1)        # [N, Tp]

    # int8 encoder-tensor streaming (serving only, see common.ENC_INT8):
    # quantize the two loop-invariant [T_enc, N, D] tensors once here;
    # every decode step then reads half the HBM bytes. Pure XLA — the
    # int8->dtype converts fuse into the step's existing loops.
    from n2nmn_tpu.models.modules.common import enc_int8_active
    use_enc_int8 = enc_int8_active() and not use_fused_att
    if use_enc_int8:
        from n2nmn_tpu.ops.pallas.kernels import quantize_grid
        enc_trans_q, s_trans = quantize_grid(enc_trans, axis=0)
        enc_out_q, s_out = quantize_grid(enc_out, axis=0)
        s_trans = s_trans.astype(enc_trans.dtype)        # [N, D]
        s_out = s_out.astype(enc_out.dtype)              # [N, D]

    # ---------------- decoder ----------------
    # Tabulated grammar DFA (grammar.py:tabulate): validity is a rank-1
    # gather of one bit-packed int32 per state + a broadcasted
    # shift/mask, the state transition a rank-1 flat gather — replaces
    # the in-scan X@W-b constraint evaluation the reference runs per
    # step (nmn3_netgen_att.py:8-15). See make_grammar_arrays for why
    # the packing (a [S, V] row gather anti-scales with batch).
    dfa_valid_packed = grammar_arrays["dfa_valid_packed"]   # [S] int32
    dfa_trans_flat = grammar_arrays["dfa_trans_flat"]       # [S*V] int32
    bit_idx = jnp.arange(V, dtype=jnp.int32)[None, :]       # [1, V]
    eos_idx = grammar_arrays["eos_idx"]

    w_a, b_a = dec_p["att_w"]["w"], dec_p["att_w"]["b"]
    v = dec_p["att_v"]
    w_y, b_y = dec_p["token_pred"]["w"], dec_p["token_pred"]["b"]
    dec_embed = dec_p["embedding"]["table"]
    # attention query and the token head's h_out half ride ONE matmul:
    # [q | s_h] = h_out @ [w_a | w_y[:D]] (the d2 half of the token head
    # joins after attention). Exact for q; reassociates the token-score
    # contraction 2D -> D+D.
    w_hq = jnp.concatenate([w_a, w_y[:D]], axis=1)      # [D, D+V]
    w_y_d2 = w_y[D:]                                    # [D, V]

    go = jnp.tile(dec_p["go"], (N, 1))
    c0 = jnp.tile(enc_c[:, :, :], (1, 1, 1))
    h0 = jnp.tile(enc_h[:, :, :], (1, 1, 1))
    state0 = jnp.zeros((N,), jnp.int32)       # DFA start state (row 0)
    eos0 = jnp.zeros((N,), bool)

    if gt_layout is None:
        gt_layout = jnp.zeros((cfg.T_decoder, N), jnp.int32)

    grammar_mode = cfg.mask_mode == "grammar"
    dec_deterministic = deterministic or not cfg.decoder_dropout

    def step(carry, xs):
        (c, h), state, prev_eos, inp, key = carry
        gt_t = xs
        key, sample_key, drop_key = jax.random.split(key, 3)

        h_out, (c, h) = lstm_stack_step(
            dec_p["lstm"], inp, (c, h),
            dropout_key=drop_key, deterministic=dec_deterministic)

        # Bahdanau attention over encoder outputs
        hq = jnp.dot(h_out, w_hq, preferred_element_type=h_out.dtype)
        q = hq[:, :D] + b_a
        if use_fused_att:
            att_nt, d2 = bahdanau_attention(q, enc_trans_nt, enc_out_nt,
                                            v, mask_nt)
            att = att_nt[:, :T_enc].T                       # [T_enc, N]
        elif use_enc_int8:
            # dequant fuses into the tanh loop (one int8 HBM read);
            # broadcast-mul-sum keeps the context contraction a single
            # fusion over the int8 enc_out read (a dot_general would
            # materialize a converted copy), and its dequant scale
            # factors out of the t-reduction entirely
            enc_t = enc_trans_q.astype(h_out.dtype) * s_trans[None]
            att_raw = jnp.einsum("tnd,d->tn",
                                 jnp.tanh(q[None] + enc_t), v)
            att = jax.nn.softmax(att_raw, axis=0) * seq_not_finished
            att = att / jnp.sum(att, axis=0, keepdims=True)
            d2 = jnp.sum(att[:, :, None]
                         * enc_out_q.astype(h_out.dtype), axis=0) * s_out
        else:
            att_raw = jnp.einsum("tnd,d->tn",
                                 jnp.tanh(q[None] + enc_trans), v)
            att = jax.nn.softmax(att_raw, axis=0) * seq_not_finished
            att = att / jnp.sum(att, axis=0, keepdims=True)
            d2 = jnp.einsum("tn,tnd->nd", att, enc_out)

        token_scores = (hq[:, D:]
                        + jnp.dot(d2, w_y_d2,
                                  preferred_element_type=h_out.dtype)
                        + b_y)

        if grammar_mode:
            # token validity: rank-1 gather of the packed word, then
            # lane-parallel bit test
            packed = dfa_valid_packed[state]                    # [N]
            token_validity = ((packed[:, None] >> bit_idx) & 1) != 0
            if use_gt_layout:
                # gt layouts bypass masking & renormalization
                # (reference nmn3_netgen_att.py:204-207)
                token_validity = jnp.ones_like(token_validity)
            validity_mult = token_validity.astype(token_scores.dtype)

            if cfg.decoder_sampling:
                scores_pen = token_scores - (1.0 - validity_mult) * 50.0
                sampled = jax.random.categorical(sample_key, scores_pen)
                sampled = sampled.astype(jnp.int32)
                is_valid = jnp.take_along_axis(
                    token_validity, sampled[:, None], axis=1)[:, 0]
                min_score = jnp.min(token_scores)
                masked = jnp.where(token_validity, token_scores,
                                   min_score - 1.0)
                argmax_tok = jnp.argmax(masked, axis=1).astype(jnp.int32)
                predicted = jnp.where(is_valid, sampled, argmax_tok)
            else:
                min_score = jnp.min(token_scores)
                masked = jnp.where(token_validity, token_scores,
                                   min_score - 1.0)
                predicted = jnp.argmax(masked, axis=1).astype(jnp.int32)
            if use_gt_layout:
                predicted = gt_t

            # Renormalized probabilities over the valid set. The reference
            # computes softmax(scores)*valid / sum (nmn3_netgen_att.py:
            # 245-247), which divides by zero once the valid tokens'
            # softmax mass underflows (the invalid logits receive exactly
            # zero gradient, so nothing anchors the scale — observed NaN
            # blow-up in from-scratch policy search). The masked
            # log-softmax below is the same function, computed stably:
            # q_i = e^{s_i} / sum_valid e^{s_j}.
            neg_inf = jnp.finfo(token_scores.dtype).min
            logq = jax.nn.log_softmax(
                jnp.where(token_validity, token_scores, neg_inf), axis=1)
            probs = jnp.exp(logq)
            token_logprob = jnp.take_along_axis(
                logq, predicted[:, None], axis=1)[:, 0]
            token_prob = jnp.exp(token_logprob)
            # reference entropy: sum q*log(max(1e-5, q + (1-valid))) —
            # invalid entries contribute 0; clamp in log space
            neg_ent = jnp.sum(
                jnp.where(token_validity,
                          probs * jnp.maximum(jnp.log(1e-5), logq),
                          0.0), axis=1)
            final_token = predicted
            new_eos = prev_eos
        else:
            # SHAPES-style unmasked decoding with post-<eos> forcing
            if cfg.decoder_sampling:
                predicted = jax.random.categorical(
                    sample_key, token_scores).astype(jnp.int32)
            else:
                predicted = jnp.argmax(token_scores, axis=1).astype(jnp.int32)
            if use_gt_layout:
                predicted = gt_t
            logp = jax.nn.log_softmax(token_scores, axis=1)
            probs = jnp.exp(logp)
            token_logprob = jnp.take_along_axis(
                logp, predicted[:, None], axis=1)[:, 0]
            token_prob = jnp.exp(token_logprob)
            neg_ent = jnp.sum(
                probs * jnp.maximum(jnp.log(1e-5), logp), axis=1)
            final_token = jnp.where(prev_eos, eos_idx, predicted)
            token_prob = jnp.where(prev_eos, 1.0, token_prob)
            token_logprob = jnp.where(prev_eos, 0.0, token_logprob)
            neg_ent = jnp.where(prev_eos, 0.0, neg_ent)
            new_eos = jnp.logical_or(prev_eos, predicted == eos_idx)

        state = dfa_trans_flat[state * V + final_token]
        next_inp = dec_embed[final_token]
        out = (final_token, token_prob, token_logprob, neg_ent, att)
        return (((c, h), state, new_eos, next_inp, key), out)

    carry0 = ((c0, h0), state0, eos0, go, rng)
    from n2nmn_tpu.models.modules.common import early_exit_active
    from n2nmn_tpu.ops.nn import SCAN_UNROLL, maybe_remat
    T_dec = cfg.T_decoder
    if not use_gt_layout and early_exit_active():
        # Early-exit decode (common.EARLY_EXIT): run the same step body
        # under a while_loop that stops once every sequence has emitted
        # <eos>. Finished sequences are pinned to <eos> with prob 1,
        # logprob 0, entropy 0 — by the grammar DFA (<eos> sole valid
        # token -> masked log-softmax gives exactly those) or by the
        # eos_force post-<eos> overrides above — so pre-filling the
        # skipped rows with those constants reproduces the scan's
        # outputs; only the skipped rows' attention maps differ (zeros
        # instead of the dead steps' maps — their word_vecs feed no-op
        # executor steps).
        cdtype = dec_embed.dtype
        bufs0 = (
            jnp.full((T_dec, N), eos_idx, jnp.int32),         # tokens
            jnp.ones((T_dec, N), cdtype),                     # probs
            jnp.zeros((T_dec, N), cdtype),                    # logprobs
            jnp.zeros((T_dec, N), cdtype),                    # neg ents
            jnp.zeros((T_dec, T_enc, N), cdtype),             # atts
        )
        dummy_gt = jnp.zeros((N,), jnp.int32)

        def ee_body(st):
            carry, t, bufs, _ = st
            carry, out = step(carry, dummy_gt)
            bufs = tuple(b.at[t].set(o.astype(b.dtype))
                         for b, o in zip(bufs, out))
            return carry, t + 1, bufs, jnp.all(out[0] == eos_idx)

        def ee_cond(st):
            _, t, _, done = st
            return jnp.logical_and(t < T_dec, jnp.logical_not(done))

        _, _, bufs, _ = jax.lax.while_loop(
            ee_cond, ee_body,
            (carry0, jnp.int32(0), bufs0, jnp.array(False)))
        tokens, token_probs, token_logprobs, neg_ents, atts = bufs
    else:
        _, (tokens, token_probs, token_logprobs, neg_ents, atts) = (
            jax.lax.scan(maybe_remat(step), carry0, gt_layout,
                         unroll=SCAN_UNROLL))

    # word_vecs[t] = sum_te att[t, te] * embedded_question[te]
    word_vecs = jnp.einsum("ktn,tne->kne", atts, embedded_seq)
    # summed in log space (stable vs log(prod of probs))
    log_seq_prob = jnp.sum(token_logprobs, axis=0)
    neg_entropy = jnp.sum(neg_ents, axis=0)

    return NetgenOutput(
        tokens=tokens, token_probs=token_probs,
        log_seq_prob=log_seq_prob, neg_entropy=neg_entropy,
        word_vecs=word_vecs, atts=atts, encoder_h_final=enc_h)
