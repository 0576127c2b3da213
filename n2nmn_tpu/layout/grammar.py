"""Module-layout grammar: vocabulary, arities, output types, and the
decoding-validity automaton.

The automaton is the same linear-constraint machine the reference builds in
models_clevr/nmn3_assembler.py:50-119: a per-example integer state
X = [#att_in_stack, #ans_in_stack, T_remaining]; token s is emittable iff
all(X @ W[:, s] - b[s] >= 0); after emitting s the state updates as
X += P[s]. Here it is the *single source of truth* for layout validity —
it runs inside the jitted decoder (masking) and inside the jitted executor
(validity flag), with the host stack-machine assembler kept only as
tooling and as a differential-test oracle (see tests/test_grammar.py).

Unlike the reference, one parameterized grammar serves all datasets
(the reference duplicates the assembler per dataset: models_clevr/,
models_shapes/, models_vqa/ nmn3_assembler.py).
"""

from __future__ import annotations

import numpy as np

# Universal module registry across all three dataset flavors
# (reference models_clevr/nmn3_assembler.py:9-40 and
#  models_shapes/nmn3_assembler.py:9-18; '_Answer' is SHAPES' answer head).
MODULE_ARITY = {
    "_Scene": 0,
    "_Find": 0,
    "_Filter": 1,
    "_FindSameProperty": 1,
    "_Transform": 1,
    "_And": 2,
    "_Or": 2,
    "_Count": 1,
    "_Exist": 1,
    "_EqualNum": 2,
    "_MoreNum": 2,
    "_LessNum": 2,
    "_SameProperty": 2,
    "_Describe": 1,
    "_Answer": 1,
}

MODULE_OUTPUT_TYPE = {
    "_Scene": "att",
    "_Find": "att",
    "_Filter": "att",
    "_FindSameProperty": "att",
    "_Transform": "att",
    "_And": "att",
    "_Or": "att",
    "_Count": "ans",
    "_Exist": "ans",
    "_EqualNum": "ans",
    "_MoreNum": "ans",
    "_LessNum": "ans",
    "_SameProperty": "ans",
    "_Describe": "ans",
    "_Answer": "ans",
}

EOS = "<eos>"


def build_validity_mats(module_names):
    """Constraint matrices (P, W, b) for the validity automaton.

    Re-derivation of the four linear constraints documented at reference
    models_clevr/nmn3_assembler.py:50-119:
      0) enough attention inputs on the stack;
      1) answer modules must consume the whole stack / non-answer modules
         need >= 3 steps remaining (self + answer + <eos>);
      2) nothing may follow an answer except <eos>;
      3) enough remaining steps to absorb all stacked attentions;
      eos) <eos> requires an answer on the stack.
    """
    v = len(module_names)
    P = np.zeros((v, 3), np.int32)
    W = np.zeros((3, v, 4), np.int32)
    b = np.zeros((v, 4), np.int32)

    att_in = np.zeros(v)
    att_out = np.zeros(v)
    ans_out = np.zeros(v)
    for i, name in enumerate(module_names):
        if name != EOS:
            att_in[i] = MODULE_ARITY[name]
            att_out[i] = MODULE_OUTPUT_TYPE[name] == "att"
            ans_out[i] = MODULE_OUTPUT_TYPE[name] == "ans"

    for i in range(v):
        P[i, 0] = att_out[i] - att_in[i]
        P[i, 1] = ans_out[i]
        P[i, 2] = -1

    absorb = att_in - att_out
    max_absorb_nonans = np.max(absorb * (ans_out == 0))
    max_absorb_ans = np.max(absorb * (ans_out != 0))

    for i, name in enumerate(module_names):
        if name != EOS:
            W[0, i, 0] = 1
            b[i, 0] = att_in[i]
            if ans_out[i] != 0:
                W[0, i, 1] = -1
                b[i, 1] = -att_in[i]
            else:
                W[2, i, 1] = 1
                b[i, 1] = 3
            W[1, i, 2] = -1
            if ans_out[i] == 0:
                W[0, i, 3] = -1
                W[2, i, 3] = max_absorb_nonans
                b[i, 3] = (3 * max_absorb_nonans - max_absorb_ans
                           - absorb[i])
        else:
            W[1, i, 0] = 1
            b[i, 0] = 1
    return P, W, b


class ModuleGrammar:
    """Vocabulary + static tables for one dataset's module set.

    Built from the same ``vocabulary_layout.txt`` file format the reference
    uses (one module name per line, including ``<eos>``).
    """

    def __init__(self, module_names):
        self.module_names = list(module_names)
        self.num_vocab = len(self.module_names)
        self.name2idx = {n: i for i, n in enumerate(self.module_names)}
        if EOS not in self.name2idx:
            raise ValueError("grammar requires an <eos> token")
        self.eos_idx = self.name2idx[EOS]

        self.arity = np.array(
            [MODULE_ARITY.get(n, 0) for n in self.module_names], np.int32)
        self.is_att = np.array(
            [MODULE_OUTPUT_TYPE.get(n) == "att" for n in self.module_names],
            bool)
        self.is_ans = np.array(
            [MODULE_OUTPUT_TYPE.get(n) == "ans" for n in self.module_names],
            bool)

        self.P, self.W, self.b = build_validity_mats(self.module_names)
        self._dfa_cache = {}

    @classmethod
    def from_vocab_file(cls, path):
        with open(path) as f:
            names = [s.strip() for s in f if s.strip()]
        return cls(names)

    def module_list2tokens(self, module_list, T=None):
        """Names -> token ids, padded to length T with <eos>
        (reference nmn3_assembler.py:137-143)."""
        tokens = [self.name2idx[n] for n in module_list]
        if T is not None:
            if len(tokens) >= T:
                raise ValueError("Not enough time steps to add <eos>")
            tokens += [self.eos_idx] * (T - len(tokens))
        return tokens

    def tokens2str(self, tokens):
        return " ".join(self.module_names[int(t)] for t in tokens)

    def tabulate(self, T_decoder):
        """Compile the linear-constraint automaton into a DFA.

        The decoder's per-step grammar work — ``cons = X @ W - b;
        valid = all(cons >= 0)`` on an integer state X = (#att-on-stack,
        #ans-emitted, T-remaining) — is mathematically a finite
        automaton: X0 = (0, 0, T) and every transition adds the
        constant P[token], so only a few hundred states are reachable
        within T steps. Round-3 profiling measured that in-scan
        constraint check at ~1 ms per decode (50 us/step of small VPU
        ops + dispatch, decode_breakdown_r3.json); tabulating it turns
        the per-step cost into two gathers.

        Returns (valid_table [S, V] bool, trans_table [S, V] int32)
        where row 0 is the start state; trans is total (defined for
        every token, valid or not) so the gt-layout bypass path
        (reference nmn3_netgen_att.py:204-207) stays exact.
        """
        key = int(T_decoder)
        if key in self._dfa_cache:
            return self._dfa_cache[key]
        V = self.num_vocab
        start = (0, 0, key)
        ids = {start: 0}
        order = [start]
        valid_rows, trans_rows = [], []
        frontier = [start]
        steps = 0
        while frontier and steps <= key + 1:
            nxt = []
            for st in frontier:
                X = np.array(st, np.int64)
                valid = np.array(
                    [np.all(X @ self.W[:, s, :] - self.b[s] >= 0)
                     for s in range(V)])
                succ = []
                for s in range(V):
                    ns = tuple((X + self.P[s]).tolist())
                    if ns not in ids:
                        ids[ns] = len(order)
                        order.append(ns)
                        nxt.append(ns)
                    succ.append(ids[ns])
                valid_rows.append(valid)
                trans_rows.append(succ)
            frontier = nxt
            steps += 1
        # states discovered on the last frontier still need rows
        while len(valid_rows) < len(order):
            st = order[len(valid_rows)]
            X = np.array(st, np.int64)
            valid = np.array(
                [np.all(X @ self.W[:, s, :] - self.b[s] >= 0)
                 for s in range(V)])
            # terminal-depth states never transition during decoding;
            # self-loop keeps the table total
            valid_rows.append(valid)
            trans_rows.append([len(valid_rows) - 1] * V)
        tables = (np.array(valid_rows, bool),
                  np.array(trans_rows, np.int32))
        self._dfa_cache[key] = tables
        return tables

    # ---- host-side automaton (numpy; used for tests and tooling) ----
    def automaton_validity(self, layout_tokens):
        """Validity of a full [T] token sequence under the automaton.

        valid iff every token satisfies its constraints at emission time AND
        <eos> appears (equivalently: an answer was produced and the tail is
        all <eos>). Differentially tested against the stack-machine checker.
        """
        T = len(layout_tokens)
        X = np.array([0, 0, T], np.int64)
        seen_eos = False
        for t in range(T):
            s = int(layout_tokens[t])
            ok = np.all(X @ self.W[:, s, :] - self.b[s] >= 0)
            if not ok:
                return False
            seen_eos = seen_eos or (s == self.eos_idx)
            X = X + self.P[s]
        return bool(seen_eos)
