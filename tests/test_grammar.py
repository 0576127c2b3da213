"""Differential tests: the validity automaton (in-graph machinery) must
agree with the host stack-machine assembler — the reference effectively has
these two independent implementations too (nmn3_assembler.py:50-119 vs
:153-212) and they must agree."""

import numpy as np
import pytest

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.layout.assembler import Assembler, INVALID_EXPR

SHAPES_VOCAB = ["_Find", "_Transform", "_And", "_Answer", "<eos>"]
CLEVR_VOCAB = ["_Scene", "_Find", "_Filter", "_FindSameProperty",
               "_Transform", "_And", "_Or", "_Exist", "_Count",
               "_EqualNum", "_MoreNum", "_LessNum", "_SameProperty",
               "_Describe", "<eos>"]
VQA_VOCAB = ["_Find", "_Transform", "_And", "_Describe", "<eos>"]


@pytest.mark.parametrize("vocab,T", [
    (SHAPES_VOCAB, 11), (SHAPES_VOCAB, 7), (CLEVR_VOCAB, 10),
    (CLEVR_VOCAB, 6), (VQA_VOCAB, 13)])
def test_automaton_matches_stack_checker(vocab, T):
    g = ModuleGrammar(vocab)
    asm = Assembler(g)
    rng = np.random.RandomState(0)
    n_valid = 0
    for _ in range(3000):
        tokens = rng.randint(0, g.num_vocab, size=T)
        stack_valid = asm.assemble_one(tokens)["module"] != INVALID_EXPR
        auto_valid = g.automaton_validity(tokens)
        # The automaton is *stricter* than the stack checker in one way
        # only: it also enforces that nothing follows the answer except
        # <eos> and that the whole tail is <eos>. The stack checker stops
        # reading at the first <eos>, so sequences like
        # [.., _Answer, <eos>, _Find, ..] are stack-valid but
        # automaton-invalid. Masked decoding can never emit those; compare
        # on the canonical form (tail after first <eos> replaced by <eos>).
        first_eos = np.argmax(tokens == g.eos_idx) if np.any(
            tokens == g.eos_idx) else T
        canon = tokens.copy()
        canon[first_eos:] = g.eos_idx
        stack_valid_c = asm.assemble_one(canon)["module"] != INVALID_EXPR
        auto_valid_c = g.automaton_validity(canon)
        assert auto_valid_c == stack_valid_c, (
            g.tokens2str(canon), auto_valid_c, stack_valid_c)
        # And non-canonical automaton-valid implies stack-valid
        if auto_valid:
            assert stack_valid
        n_valid += stack_valid_c
    assert n_valid > 0  # sanity: some random programs are valid


def test_masked_decoding_always_valid():
    """Any greedy walk that only picks automaton-valid tokens must produce a
    stack-checker-valid program (the property CLEVR training asserts:
    exp_clevr/train_clevr_rl_gt_layout.py:204)."""
    g = ModuleGrammar(CLEVR_VOCAB)
    asm = Assembler(g)
    rng = np.random.RandomState(1)
    for _ in range(500):
        T = 10
        X = np.array([0, 0, T], np.int64)
        tokens = []
        for _t in range(T):
            valid = np.all((X @ g.W.reshape(3, -1)).reshape(g.num_vocab, 4)
                           - g.b >= 0, axis=1)
            choices = np.nonzero(valid)[0]
            assert len(choices) > 0, "automaton deadlocked"
            s = int(rng.choice(choices))
            tokens.append(s)
            X = X + g.P[s]
        assert asm.assemble_one(np.array(tokens))["module"] != INVALID_EXPR


def test_module_list2tokens_roundtrip():
    g = ModuleGrammar(SHAPES_VOCAB)
    toks = g.module_list2tokens(
        ["_Find", "_Find", "_Transform", "_And", "_Answer"], T=11)
    assert len(toks) == 11
    assert toks[5:] == [g.eos_idx] * 6
    asm = Assembler(g)
    expr = asm.assemble_one(np.array(toks))
    assert expr["module"] == "_Answer"
    assert expr["input_0"]["module"] == "_And"


def test_gt_layouts_are_valid_shapes():
    import json
    g = ModuleGrammar(SHAPES_VOCAB)
    asm = Assembler(g)
    with open("/root/reference/exp_shapes/data/"
              "train.tiny.query_layout_symbols.json") as f:
        layouts = json.load(f)
    for layout in layouts:
        toks = np.array(g.module_list2tokens(layout, T=11))
        assert asm.assemble_one(toks)["module"] != INVALID_EXPR
        assert g.automaton_validity(toks)


def test_dfa_tabulation_matches_constraint_automaton():
    """grammar.tabulate compiles the X@W-b>=0 automaton into a DFA;
    walking random token sequences through both must agree on every
    per-step validity row (netgen's decode uses the DFA)."""
    import numpy as np
    from n2nmn_tpu.layout.grammar import ModuleGrammar

    for vocab in (
        ["_Scene", "_Find", "_Filter", "_FindSameProperty", "_Transform",
         "_And", "_Or", "_Exist", "_Count", "_EqualNum", "_MoreNum",
         "_LessNum", "_SameProperty", "_Describe", "<eos>"],
        ["_Find", "_Transform", "_And", "_Describe", "<eos>"],
        ["_Find", "_Transform", "_And", "_Answer", "<eos>"],
    ):
        g = ModuleGrammar(vocab)
        T = 9
        valid_tab, trans_tab = g.tabulate(T)
        V = g.num_vocab
        rng = np.random.RandomState(0)
        for _ in range(50):
            toks = rng.randint(0, V, size=T)
            X = np.array([0, 0, T], np.int64)
            state = 0
            for t in range(T):
                ref_valid = np.array(
                    [np.all(X @ g.W[:, s, :] - g.b[s] >= 0)
                     for s in range(V)])
                np.testing.assert_array_equal(valid_tab[state], ref_valid)
                X = X + g.P[toks[t]]
                state = trans_tab[state, toks[t]]
