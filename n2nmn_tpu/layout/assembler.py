"""Host-side RPN assembler (tooling / visualization / differential oracle).

In the reference this stack machine runs on the host **every training
iteration** between two ``partial_run`` phases
(exp_clevr/train_clevr_gt_layout.py:184, nmn3_assembler.py:153-212). In the
TPU rebuild assembly happens in-graph (layout/executor.py); this module is
kept for: building expression trees for visualization, grading tools, and
as the independent oracle the automaton is differentially tested against.
"""

from __future__ import annotations

import numpy as np

from n2nmn_tpu.layout.grammar import (
    ModuleGrammar, MODULE_ARITY, MODULE_OUTPUT_TYPE)

INVALID_EXPR = "INVALID_EXPR"


class Assembler:
    """Same public surface as the reference Assembler
    (models_clevr/nmn3_assembler.py:121-222): module_names, EOS_idx, P/W/b,
    module_list2tokens, assemble."""

    def __init__(self, module_vocab_file_or_grammar):
        if isinstance(module_vocab_file_or_grammar, ModuleGrammar):
            self.grammar = module_vocab_file_or_grammar
        else:
            self.grammar = ModuleGrammar.from_vocab_file(
                module_vocab_file_or_grammar)
        g = self.grammar
        self.module_names = g.module_names
        self.name2idx_dict = g.name2idx
        self.num_vocab_nmn = g.num_vocab
        self.EOS_idx = g.eos_idx
        self.P, self.W, self.b = g.P, g.W, g.b

    def module_list2tokens(self, module_list, T=None):
        return self.grammar.module_list2tokens(module_list, T)

    def _invalid_expr(self, layout_tokens, error_str):
        return {"module": INVALID_EXPR,
                "expr_str": self.grammar.tokens2str(layout_tokens),
                "error": error_str}

    def assemble_one(self, layout_tokens, batch_idx=0):
        """RPN stack decode of one [T] token sequence -> expression tree dict
        (reference nmn3_assembler.py:153-212). Tree node schema matches the
        reference: {'module', 'output_type', 'time_idx', 'batch_idx',
        'input_0', 'input_1'}."""
        layout_tokens = np.asarray(layout_tokens)
        if not np.any(layout_tokens == self.EOS_idx):
            return self._invalid_expr(layout_tokens, "cannot find <eos>")
        stack = []
        for t in range(len(layout_tokens)):
            idx = int(layout_tokens[t])
            if idx == self.EOS_idx:
                break
            name = self.module_names[idx]
            expr = {"module": name,
                    "output_type": MODULE_OUTPUT_TYPE[name],
                    "time_idx": t, "batch_idx": batch_idx}
            arity = MODULE_ARITY[name]
            if len(stack) < arity:
                return self._invalid_expr(
                    layout_tokens, "not enough input for " + name)
            for n_input in range(arity - 1, -1, -1):
                top = stack.pop()
                if top["output_type"] != "att":
                    return self._invalid_expr(
                        layout_tokens, "input incompatible for " + name)
                expr["input_%d" % n_input] = top
            stack.append(expr)
        if len(stack) != 1:
            return self._invalid_expr(
                layout_tokens,
                "final stack size not equal to 1 (%d remains)" % len(stack))
        result = stack[0]
        if result["output_type"] != "ans":
            return self._invalid_expr(
                layout_tokens, "result type must be ans, not att")
        return result

    def assemble(self, layout_tokens_batch):
        """[T, N] token batch -> (expr_list, validity array)."""
        _, N = layout_tokens_batch.shape
        expr_list = [self.assemble_one(layout_tokens_batch[:, n], n)
                     for n in range(N)]
        validity = np.array([e["module"] != INVALID_EXPR for e in expr_list],
                            bool)
        return expr_list, validity
