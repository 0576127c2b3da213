"""Golden-value tests: the padded lax.scan stack-machine executor must
produce exactly the scores a direct per-example expression-tree evaluation
produces (the architecture-transformation correctness proof), and its
in-graph validity flag must match the host assembler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.layout.assembler import Assembler, INVALID_EXPR
from n2nmn_tpu.layout.executor import build_tables, execute_layout
from n2nmn_tpu.models.modules import shapes as shapes_lib
from n2nmn_tpu.models.modules import clevr as clevr_lib
from n2nmn_tpu.models.modules import vqa as vqa_lib

SHAPES_VOCAB = ["_Find", "_Transform", "_And", "_Answer", "<eos>"]
CLEVR_VOCAB = ["_Scene", "_Find", "_Filter", "_FindSameProperty",
               "_Transform", "_And", "_Or", "_Exist", "_Count",
               "_EqualNum", "_MoreNum", "_LessNum", "_SameProperty",
               "_Describe", "<eos>"]
VQA_VOCAB = ["_Find", "_Transform", "_And", "_Describe", "<eos>"]


def random_valid_programs(grammar, T, n, seed=0):
    """Sample n valid token programs of padded length T via a masked walk."""
    rng = np.random.RandomState(seed)
    progs = []
    while len(progs) < n:
        X = np.array([0, 0, T], np.int64)
        toks = []
        for _ in range(T):
            valid = np.all(
                (X @ grammar.W.reshape(3, -1)).reshape(grammar.num_vocab, 4)
                - grammar.b >= 0, axis=1)
            s = int(rng.choice(np.nonzero(valid)[0]))
            toks.append(s)
            X = X + grammar.P[s]
        progs.append(toks)
    return np.array(progs, np.int32).T  # [T, n]


def interpret_tree(expr, n, att_branches, ans_branches, att_names,
                   ans_names, pre_static, pre_step):
    """Direct recursive evaluation of one expression tree for example n.

    Calls the branch fns WITHOUT the executor's step_shared fusion hook —
    they fall back to computing readouts directly, so this stays an
    independent check of the fused path."""
    def slice_static(tree):
        return jax.tree_util.tree_map(
            lambda a: a[n:n + 1] if hasattr(a, "ndim") else a, tree)

    def slice_step(tree, t):
        return jax.tree_util.tree_map(lambda a: a[t, n:n + 1], tree)

    ps = slice_static(pre_static)

    def ev(node):
        name = node["module"]
        t = node["time_idx"]
        pt = slice_step(pre_step, t)
        in0 = ev(node["input_0"]) if "input_0" in node else jnp.zeros(
            (1, ps["img_find"].shape[1]))
        in1 = ev(node["input_1"]) if "input_1" in node else jnp.zeros_like(
            in0)
        if name in att_names:
            fn = att_branches[att_names.index(name)]
        else:
            fn = ans_branches[ans_names.index(name)]
        return fn(ps, pt, in0, in1, t)

    return np.asarray(ev(expr))[0]


def _setup(flavor, vocab, T, H, W, D, C, N=16, seed=0):
    key = jax.random.PRNGKey(seed)
    grammar = ModuleGrammar(vocab)
    lib = {"shapes": shapes_lib, "clevr": clevr_lib, "vqa": vqa_lib}[flavor]
    kwargs = {"hw": H * W} if flavor == "clevr" else {}
    params = lib.init_params(key, D, 32, C, **kwargs)
    k1, k2 = jax.random.split(key)
    image_feat = jax.random.normal(k1, (N, H, W, D))
    word_vecs = jax.random.normal(k2, (T, N, 32))
    pre_static, pre_step = lib.precompute(params, image_feat, word_vecs)
    att_b, ans_b = lib.make_branches(params)
    tables = build_tables(grammar, lib.ATT_MODULES, lib.ANS_MODULES)
    make_shared = getattr(lib, "make_step_shared", None)
    shared = make_shared(params) if make_shared else None
    return grammar, lib, tables, att_b, ans_b, pre_static, pre_step, shared


@pytest.mark.parametrize("flavor,vocab,T,H,W,D,C", [
    ("shapes", SHAPES_VOCAB, 11, 3, 3, 64, 2),
    ("clevr", CLEVR_VOCAB, 10, 5, 6, 16, 28),
    ("vqa", VQA_VOCAB, 13, 4, 4, 24, 30),
])
def test_executor_matches_tree_interpreter(flavor, vocab, T, H, W, D, C):
    N = 16
    (grammar, lib, tables, att_b, ans_b,
     pre_static, pre_step, shared) = _setup(flavor, vocab, T, H, W, D, C)
    tokens = random_valid_programs(grammar, T, N, seed=7)

    # the production path: fused step_shared readouts (clevr/vqa); the
    # tree interpreter below computes readouts per-branch — independent
    scores, validity = jax.jit(
        lambda tok: execute_layout(tok, tables, att_b, ans_b, pre_static,
                                   pre_step, hw=H * W, num_choices=C,
                                   stack_size=T,
                                   step_shared=shared))(jnp.asarray(tokens))
    scores = np.asarray(scores)
    assert np.all(np.asarray(validity))

    asm = Assembler(grammar)
    expr_list, host_valid = asm.assemble(tokens)
    assert np.all(host_valid)
    for n in range(N):
        ref = interpret_tree(expr_list[n], n, att_b, ans_b,
                             lib.ATT_MODULES, lib.ANS_MODULES,
                             pre_static, pre_step)
        np.testing.assert_allclose(scores[n], ref, rtol=2e-4, atol=2e-5)


def test_transform_impl_dot_matches_conv_in_executor(monkeypatch):
    """Full-executor equivalence of the two _Transform implementations
    (modules/common.TRANSFORM_IMPL): same tokens, same params ->
    same scores."""
    from n2nmn_tpu.models.modules import common

    T, H, W, D, C = 10, 5, 6, 16, 28

    def run(impl):
        monkeypatch.setattr(common, "TRANSFORM_IMPL", impl)
        (grammar, lib, tables, att_b, ans_b,
         pre_static, pre_step, shared) = _setup(
            "clevr", CLEVR_VOCAB, T, H, W, D, C)
        tokens = jnp.asarray(random_valid_programs(grammar, T, 16, seed=9))
        scores, validity = execute_layout(
            tokens, tables, att_b, ans_b, pre_static, pre_step,
            hw=H * W, num_choices=C, stack_size=T, step_shared=shared)
        return np.asarray(scores), np.asarray(validity)

    s_conv, v_conv = run("conv")
    s_dot, v_dot = run("dot")
    np.testing.assert_array_equal(v_conv, v_dot)
    np.testing.assert_allclose(s_dot, s_conv, rtol=2e-4, atol=2e-5)


def test_transform_impl_auto_resolves_by_traced_batch(monkeypatch):
    """TRANSFORM_IMPL="auto" picks the dot form at/above the measured
    crossover batch and the conv form below it, once per trace."""
    from n2nmn_tpu.models.modules import common

    monkeypatch.setattr(common, "TRANSFORM_IMPL", "auto")
    monkeypatch.setattr(common, "TRANSFORM_AUTO_DOT_MIN_BATCH", 8)
    assert common.transform_impl_for_batch(4) == "conv"
    assert common.transform_impl_for_batch(8) == "dot"

    key = jax.random.PRNGKey(0)
    T, H, W, D, C = 6, 3, 3, 8, 2
    params = shapes_lib.init_params(key, D, D, C)
    wv_small = jnp.zeros((T, 4, D))
    wv_large = jnp.zeros((T, 8, D))
    feat = lambda n: jnp.zeros((n, H, W, D))
    _, pre_small = shapes_lib.precompute(params, feat(4), wv_small)
    _, pre_large = shapes_lib.precompute(params, feat(8), wv_large)
    assert "txt_tfm" in pre_small and "tfm_kq" not in pre_small
    assert "tfm_kq" in pre_large and "txt_tfm" not in pre_large


def test_invalid_programs_get_zero_scores_and_false_validity():
    T, N, H, W, D, C = 11, 8, 3, 3, 64, 2
    (grammar, lib, tables, att_b, ans_b,
     pre_static, pre_step, _) = _setup("shapes", SHAPES_VOCAB, T, H, W, D, C,
                                       N=N)
    rng = np.random.RandomState(3)
    # random garbage token sequences — mostly invalid
    tokens = rng.randint(0, grammar.num_vocab, size=(T, N)).astype(np.int32)
    # canonicalize the tail after first <eos> (what a real decoder emits)
    for n in range(N):
        eos_pos = np.nonzero(tokens[:, n] == grammar.eos_idx)[0]
        if len(eos_pos):
            tokens[eos_pos[0]:, n] = grammar.eos_idx

    scores, validity = execute_layout(
        jnp.asarray(tokens), tables, att_b, ans_b, pre_static, pre_step,
        hw=H * W, num_choices=C, stack_size=T)
    scores, validity = np.asarray(scores), np.asarray(validity)

    asm = Assembler(grammar)
    _, host_valid = asm.assemble(tokens)
    np.testing.assert_array_equal(validity, host_valid)
    # invalid -> dummy zero scores (reference nmn3_model.py:146-155)
    for n in range(N):
        if not host_valid[n]:
            np.testing.assert_array_equal(scores[n], 0.0)


def test_executor_gradients_flow():
    """Answer-loss gradients must reach module params through the stack."""
    T, N, H, W, D, C = 7, 4, 3, 3, 8, 2
    grammar = ModuleGrammar(SHAPES_VOCAB)
    lib = shapes_lib
    key = jax.random.PRNGKey(0)
    params = lib.init_params(key, D, 16, C)
    image_feat = jax.random.normal(key, (N, H, W, D))
    word_vecs = jax.random.normal(key, (T, N, 16))
    tokens = jnp.asarray(random_valid_programs(grammar, T, N, seed=1))
    tables = build_tables(grammar, lib.ATT_MODULES, lib.ANS_MODULES)

    def loss_fn(params):
        pre_static, pre_step = lib.precompute(params, image_feat, word_vecs)
        att_b, ans_b = lib.make_branches(params)
        scores, _ = execute_layout(tokens, tables, att_b, ans_b,
                                   pre_static, pre_step, hw=H * W,
                                   num_choices=C, stack_size=T)
        return jnp.sum(scores ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every module participates in at least one sampled program family,
    # so find + answer weights must get nonzero grads
    assert np.any(np.asarray(grads["find"]["conv_image"]["w"]) != 0)
    assert np.any(np.asarray(grads["answer"]["fc_scores"]["w"]) != 0)
