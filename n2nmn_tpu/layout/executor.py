"""In-graph padded stack-machine executor for module layouts.

This is the TPU-native replacement for the TensorFlow Fold "Loom"
dynamic-batching VM (reference models_clevr/nmn3_model.py:55-159 +
compiler.build_feed_dict host step at exp_clevr/train_clevr_gt_layout.py:190):
instead of scheduling each example's expression *tree* on the host, the
predicted token sequence [T_dec, N] is executed directly as a Reverse
Polish program on a fixed-shape attention stack inside one jax.lax.scan —
the whole batch is one XLA program with static shapes.

Per step every module in the library is evaluated densely for the full
batch (cheap: all heavy matmuls are hoisted into a batched precompute
outside the scan) and the per-example result is selected by one-hot over
the emitted token — structurally like an MoE layer with replicated expert
weights. Invalid programs (possible for the unmasked SHAPES decoder) are
tracked by the same validity automaton used for decoding and produce the
reference's dummy all-zero answer scores (nmn3_model.py:146-155).

Gradients flow from the answer loss through the stack reads/writes into the
module parameters and the decoder's word_vecs — the same path the
reference routes across its two partial_run phases.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.ops.nn import SCAN_UNROLL, maybe_remat


@dataclasses.dataclass(frozen=True)
class ExecutorTables:
    """Static per-vocab tables as device arrays."""
    arity: jnp.ndarray      # [V] int32
    is_att: jnp.ndarray     # [V] bool
    is_ans: jnp.ndarray     # [V] bool
    att_slot: jnp.ndarray   # [V] int32: index into att branch list (0 pad)
    ans_slot: jnp.ndarray   # [V] int32
    P: jnp.ndarray          # [V, 3] int32
    W: jnp.ndarray          # [3, V, 4] int32
    b: jnp.ndarray          # [V, 4] int32
    eos_idx: int
    num_att: int
    num_ans: int


def build_tables(grammar: ModuleGrammar, att_names: Sequence[str],
                 ans_names: Sequence[str]) -> ExecutorTables:
    v = grammar.num_vocab
    att_slot = np.zeros(v, np.int32)
    ans_slot = np.zeros(v, np.int32)
    for i, name in enumerate(grammar.module_names):
        if name in att_names:
            att_slot[i] = att_names.index(name)
        if name in ans_names:
            ans_slot[i] = ans_names.index(name)
    return ExecutorTables(
        arity=jnp.asarray(grammar.arity),
        is_att=jnp.asarray(grammar.is_att),
        is_ans=jnp.asarray(grammar.is_ans),
        att_slot=jnp.asarray(att_slot),
        ans_slot=jnp.asarray(ans_slot),
        P=jnp.asarray(grammar.P),
        W=jnp.asarray(grammar.W),
        b=jnp.asarray(grammar.b),
        eos_idx=grammar.eos_idx,
        num_att=len(att_names),
        num_ans=len(ans_names),
    )


def token_precompute(tokens: jnp.ndarray, tables: ExecutorTables, S: int,
                     dtype=jnp.float32):
    """Everything that depends on the emitted tokens but NOT on the stack,
    as one batched pass (measured: the in-scan automaton + table gathers
    cost as much as the module math itself — ~40% of executor time — from
    per-op dispatch overhead on ~tiny [N] tensors, T times per program).

    Returns a dict of [T, N(, ...)] arrays:
      is_att/is_ans/use_sub, att_oh/ans_oh (one-hot branch selectors),
      top_idx/sub_idx/push_pos (stack index trajectories), and the final
      per-example `validity` [N].

    The validity automaton (same X@W-b>=0 machine as the decoder mask)
    evolves additively (X_{t+1} = X_t + P[tok_t]), so its whole
    trajectory is an exclusive cumsum — no recurrence. Likewise the stack
    pointer: ptr_{t+1} = ptr_t + is_att_t - arity_t. The grammar
    guarantees valid programs never underflow/overflow, so the unclipped
    cumsum equals the reference's clipped evolution for every valid
    program; invalid programs may derive garbage (clipped into range)
    stack indices, but their scores are zeroed by `validity` exactly as
    the reference's dummy answer (nmn3_model.py:146-155), so the values
    never surface.
    """
    T, _ = tokens.shape
    arity_all = tables.arity[tokens]                      # [T, N]
    is_att_all = tables.is_att[tokens]
    is_ans_all = tables.is_ans[tokens]
    att_oh_all = jax.nn.one_hot(tables.att_slot[tokens], tables.num_att,
                                dtype=dtype)              # [T, N, Ma]
    ans_oh_all = jax.nn.one_hot(tables.ans_slot[tokens], tables.num_ans,
                                dtype=dtype)              # [T, N, Mb]

    P_tok = tables.P[tokens]                              # [T, N, 3]
    X0 = jnp.array([0, 0, T], jnp.int32)
    X_before = X0[None, None, :] + jnp.cumsum(P_tok, axis=0) - P_tok
    W_tok = jnp.transpose(tables.W, (1, 0, 2))[tokens]    # [T, N, 3, 4]
    cons = jnp.einsum("tns,tnsc->tnc", X_before, W_tok) \
        - tables.b[tokens]                                # [T, N, 4]
    tok_valid = jnp.all(cons >= 0, axis=2)                # [T, N]
    validity = jnp.logical_and(jnp.all(tok_valid, axis=0),
                               jnp.any(tokens == tables.eos_idx, axis=0))

    delta = is_att_all.astype(jnp.int32) - arity_all
    ptr_before = jnp.cumsum(delta, axis=0) - delta        # [T, N]
    return {
        "is_att": is_att_all, "is_ans": is_ans_all,
        "att_oh": att_oh_all, "ans_oh": ans_oh_all,
        "top_idx": jnp.clip(ptr_before - 1, 0, S - 1),
        "sub_idx": jnp.clip(ptr_before - 2, 0, S - 1),
        "push_pos": jnp.clip(ptr_before - arity_all, 0, S - 1),
        "use_sub": arity_all == 2,
        "validity": validity,
    }


# A branch fn maps (pre_static, pre_step_t, in0, in1, t) -> output.
# in0/in1 are flattened attention maps [N, HW]; att branches return
# [N, HW], ans branches return [N, num_choices].
BranchFn = Callable[..., jnp.ndarray]


def execute_layout(tokens: jnp.ndarray,
                   tables: ExecutorTables,
                   att_branches: List[BranchFn],
                   ans_branches: List[BranchFn],
                   pre_static,
                   pre_step,
                   hw: int,
                   num_choices: int,
                   stack_size: int | None = None,
                   return_intermediates: bool = False,
                   step_shared=None):
    """Run the padded RPN program.

    tokens: [T_dec, N] int32 module tokens (Reverse Polish order).
    pre_static: pytree of batch-level precomputes (no time axis).
    pre_step: pytree of per-step precomputes with leading axis T_dec
              (e.g. per-module text mappings fc(word_vecs)).
    step_shared: optional (pre_static, pre_t, in0, in1, t) -> dict,
              evaluated ONCE per step after the stack pops and merged into
              pre_t before the branches run — the hook for cross-branch
              fusion (e.g. one stacked softmax-readout pass over
              image_feat serving every readout-consuming module, instead
              of each branch re-streaming the [N, HW, D_feat] grid from
              HBM; see modules/clevr.make_step_shared).
    Returns (scores [N, num_choices], validity [N] bool); with
    return_intermediates also the per-step selected attention maps
    [T_dec, N, HW] (visualization — the reference needed a whole notebook
    replaying modules outside Fold for this, visualize_shapes.ipynb).
    """
    T, N = tokens.shape
    S = stack_size if stack_size is not None else T
    dtype = jnp.float32
    for leaf in jax.tree_util.tree_leaves(pre_static):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            dtype = leaf.dtype
            break

    pre_tok = token_precompute(tokens, tables, S, dtype)
    (is_att_all, is_ans_all, att_oh_all, ans_oh_all, top_idx_all,
     sub_idx_all, push_pos_all, use_sub_all, validity) = (
        pre_tok["is_att"], pre_tok["is_ans"], pre_tok["att_oh"],
        pre_tok["ans_oh"], pre_tok["top_idx"], pre_tok["sub_idx"],
        pre_tok["push_pos"], pre_tok["use_sub"], pre_tok["validity"])

    stack0 = jnp.zeros((N, S, hw), dtype)
    scores0 = jnp.zeros((N, num_choices), dtype)
    slot_range = jnp.arange(S)[None, :]                   # [1, S]

    def step(carry, xs):
        stack, ans_scores = carry
        (pre_t, top_idx, sub_idx, push_pos, use_sub, is_att, is_ans,
         att_onehot, ans_onehot, t) = xs

        # stack pops (reference pop order nmn3_assembler.py:194-199:
        # for arity 2 the top of stack is input_1, below it input_0)
        top = jnp.take_along_axis(stack, top_idx[:, None, None], axis=1)[:, 0]
        sub = jnp.take_along_axis(stack, sub_idx[:, None, None], axis=1)[:, 0]
        in1 = top
        in0 = jnp.where(use_sub[:, None], sub, top)

        if step_shared is not None:
            pre_t = {**pre_t, **step_shared(pre_static, pre_t,
                                            in0, in1, t)}

        # dense evaluation of every module, one-hot select per example
        att_outs = jnp.stack([f(pre_static, pre_t, in0, in1, t)
                              for f in att_branches])     # [Ma, N, HW]
        att_out = jnp.einsum("mnp,nm->np", att_outs, att_onehot)

        ans_outs = jnp.stack([f(pre_static, pre_t, in0, in1, t)
                              for f in ans_branches])     # [Mb, N, C]
        ans_out = jnp.einsum("mnc,nm->nc", ans_outs, ans_onehot)

        # push att output at position ptr - arity
        push_mask = (slot_range == push_pos[:, None]) & is_att[:, None]
        stack = jnp.where(push_mask[:, :, None],
                          att_out[:, None, :], stack)

        ans_scores = jnp.where(is_ans[:, None], ans_out, ans_scores)

        emit = att_out if return_intermediates else None
        return (stack, ans_scores), emit

    xs = (pre_step, top_idx_all, sub_idx_all, push_pos_all, use_sub_all,
          is_att_all, is_ans_all, att_oh_all, ans_oh_all, jnp.arange(T))
    (stack, ans_scores), step_atts = jax.lax.scan(
        maybe_remat(step), (stack0, scores0), xs, unroll=SCAN_UNROLL)

    # invalid expressions get the dummy all-zero score vector
    # (reference nmn3_model.py:146-155)
    scores = jnp.where(validity[:, None], ans_scores, 0.0)
    if return_intermediates:
        return scores, validity, step_atts
    return scores, validity
