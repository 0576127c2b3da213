"""Full NMNModel integration tests across the three dataset flavors,
including the VQA options (question-prior net, reduce_visfeat_dim) and
gradient flow from the answer loss into every parameter group."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.models.netgen import NetgenConfig
from n2nmn_tpu.models.nmn import NMNConfig, NMNModel

VOCABS = {
    "shapes": ["_Find", "_Transform", "_And", "_Answer", "<eos>"],
    "clevr": ["_Scene", "_Find", "_Filter", "_FindSameProperty",
              "_Transform", "_And", "_Or", "_Exist", "_Count",
              "_EqualNum", "_MoreNum", "_LessNum", "_SameProperty",
              "_Describe", "<eos>"],
    "vqa": ["_Find", "_Transform", "_And", "_Describe", "<eos>"],
}


def build(flavor, **overrides):
    grammar = ModuleGrammar(VOCABS[flavor])
    net_cfg = NetgenConfig(
        num_vocab_txt=20, embed_dim_txt=12,
        num_vocab_nmn=grammar.num_vocab, embed_dim_nmn=12,
        lstm_dim=16, num_layers=2, T_decoder=8,
        decoder_sampling=False,
        mask_mode="eos_force" if flavor == "shapes" else "grammar")
    defaults = dict(flavor=flavor, netgen=net_cfg, num_choices=5,
                    H_feat=3, W_feat=4, D_feat=8)
    defaults.update(overrides)
    cfg = NMNConfig(**defaults)
    return NMNModel(cfg, grammar), grammar


def run(model, N=6, T_enc=7, image_shape=None, seed=0):
    cfg = model.cfg
    rng = np.random.RandomState(seed)
    text = jnp.asarray(rng.randint(0, 20, size=(T_enc, N)), jnp.int32)
    lengths = jnp.asarray(rng.randint(2, T_enc + 1, size=N), jnp.int32)
    shape = image_shape or (N, cfg.H_feat, cfg.W_feat, cfg.D_feat)
    image = jnp.asarray(rng.randn(*shape), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed))
    out = jax.jit(lambda p, t, l, i, r: model.apply(p, t, l, i, r))(
        params, text, lengths, image, jax.random.PRNGKey(1))
    return params, out


@pytest.mark.parametrize("flavor", ["shapes", "clevr", "vqa"])
def test_model_forward_shapes_and_finiteness(flavor):
    model, grammar = build(flavor)
    _, out = run(model)
    assert out.scores.shape == (6, 5)
    assert out.tokens.shape == (8, 6)
    assert np.all(np.isfinite(np.asarray(out.scores)))
    if flavor != "shapes":  # grammar-masked: always valid
        assert np.all(np.asarray(out.validity))


def test_vqa_qpn_adds_logits():
    model, _ = build("vqa", use_qpn=True)
    params, out = run(model)
    model_noqpn, _ = build("vqa", use_qpn=False)
    params_noqpn = {k: v for k, v in params.items() if k != "qpn"}
    _, out2 = run(model_noqpn)
    # qpn params exist and contribute (scores differ from nmn-only path
    # computed with the same module/netgen params)
    assert "qpn" in params

    def fwd(m, p):
        rng = np.random.RandomState(0)
        text = jnp.asarray(rng.randint(0, 20, size=(7, 6)), jnp.int32)
        lengths = jnp.asarray(rng.randint(2, 8, size=6), jnp.int32)
        image = jnp.asarray(rng.randn(6, 3, 4, 8), jnp.float32)
        return m.apply(p, text, lengths, image, jax.random.PRNGKey(1))

    s_with = np.asarray(fwd(model, params).scores)
    s_without = np.asarray(fwd(model_noqpn, params_noqpn).scores)
    assert not np.allclose(s_with, s_without)


def test_vqa_reduce_visfeat_dim():
    model, _ = build("vqa", reduce_visfeat_dim=True, D_feat=8,
                     D_feat_raw=32)
    _, out = run(model, image_shape=(6, 3, 4, 32))
    assert out.scores.shape == (6, 5)
    assert np.all(np.isfinite(np.asarray(out.scores)))


def test_gradients_reach_all_param_groups():
    model, grammar = build("clevr")
    rng = np.random.RandomState(0)
    N, T_enc = 6, 7
    text = jnp.asarray(rng.randint(0, 20, size=(T_enc, N)), jnp.int32)
    lengths = jnp.asarray(rng.randint(2, T_enc + 1, size=N), jnp.int32)
    image = jnp.asarray(rng.randn(N, 3, 4, 8), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, size=N), jnp.int32)
    params = model.init(jax.random.PRNGKey(0))
    gt = np.full((8, N), grammar.eos_idx, np.int32)
    gt[0] = grammar.name2idx["_Find"]
    gt[1] = grammar.name2idx["_Describe"]

    def loss(params):
        out = model.apply(params, text, lengths, image,
                          jax.random.PRNGKey(1),
                          gt_layout=jnp.asarray(gt), use_gt_layout=True)
        logp = jax.nn.log_softmax(out.scores)
        xent = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
        return xent + jnp.mean(-out.log_seq_prob)

    grads = jax.grad(loss)(params)
    # the cross-phase gradient path the reference routes through two
    # partial_runs: answer loss -> word_vecs -> decoder attention ->
    # encoder (SURVEY.md hard part c)
    enc_emb = np.asarray(grads["netgen"]["encoder"]["embedding"]["table"])
    assert np.any(enc_emb != 0), "no gradient into the encoder embedding"
    assert np.any(np.asarray(
        grads["netgen"]["decoder"]["att_w"]["w"]) != 0)
    assert np.any(np.asarray(
        grads["modules"]["find"]["conv_image"]["w"]) != 0)
    assert np.any(np.asarray(
        grads["modules"]["describe"]["fc_eltwise"]["w"]) != 0)


def test_clevr_end_to_end_in_graph_vgg():
    """Raw image -> VGG pool5 -> modules in one program (tiny image)."""
    model, _ = build("clevr", in_graph_vgg=True, H_feat=1, W_feat=1,
                     D_feat=512)
    # 32x32 image -> pool5 grid 1x1x512
    _, out = run(model, image_shape=(2, 32, 32, 3), N=2)
    assert out.scores.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out.scores)))


def test_num_mlp_ext_heads():
    """num_mlp_ext (framework extension) adds a hidden relu layer to the
    count-comparison heads; parity config keeps the single fc."""
    model, grammar = build("clevr", num_mlp_ext=True)
    params, out = run(model)
    for name in ("equal_num", "more_num", "less_num"):
        assert "fc_hidden" in params["modules"][name]
    assert out.scores.shape == (6, 5)
    assert np.all(np.isfinite(np.asarray(out.scores)))

    parity_model, _ = build("clevr")
    parity_params = parity_model.init(jax.random.PRNGKey(0))
    assert "fc_hidden" not in parity_params["modules"]["equal_num"]

    # gradient reaches the new hidden layer through an _EqualNum layout
    rng = np.random.RandomState(0)
    N, T_enc = 4, 7
    text = jnp.asarray(rng.randint(0, 20, size=(T_enc, N)), jnp.int32)
    lengths = jnp.asarray(rng.randint(2, T_enc + 1, size=N), jnp.int32)
    image = jnp.asarray(rng.randn(N, 3, 4, 8), jnp.float32)
    gt = np.full((8, N), grammar.eos_idx, np.int32)
    gt[0] = grammar.name2idx["_Find"]
    gt[1] = grammar.name2idx["_Find"]
    gt[2] = grammar.name2idx["_EqualNum"]

    def loss(p):
        out = model.apply(p, text, lengths, image, jax.random.PRNGKey(1),
                          gt_layout=jnp.asarray(gt), use_gt_layout=True)
        return jnp.sum(out.scores ** 2)

    grads = jax.grad(loss)(params)
    assert np.any(np.asarray(
        grads["modules"]["equal_num"]["fc_hidden"]["w"]) != 0)


def test_num_res_ext_heads():
    """num_res_ext (framework extension): residual MLP count-comparison
    heads — the parity linear path plus a ZERO-INIT MLP correction, so
    at init the model is exactly the parity model (same fc_scores
    stream, fc_res = 0) and the Less/More sum-difference shortcut is
    preserved while equality gains a nonlinear term."""
    model, grammar = build("clevr", num_res_ext=True)
    params, out = run(model)
    for name in ("equal_num", "more_num", "less_num"):
        head = params["modules"][name]
        assert "fc_res" in head and "fc_hidden" in head
        # parity-shaped linear path, zero-init residual projection
        assert head["fc_scores"]["w"].shape[0] == 2 * (3 * 4 + 2)
        assert np.all(np.asarray(head["fc_res"]["w"]) == 0)

    # at init the residual model's outputs equal the parity model's
    parity_model, _ = build("clevr")
    parity_params, parity_out = run(parity_model)
    np.testing.assert_array_equal(
        np.asarray(parity_params["modules"]["equal_num"]["fc_scores"]["w"]),
        np.asarray(params["modules"]["equal_num"]["fc_scores"]["w"]))
    np.testing.assert_allclose(np.asarray(out.scores),
                               np.asarray(parity_out.scores), atol=0)

    # gradient reaches both the residual projection and (through it)
    # the hidden layer on an _EqualNum layout
    rng = np.random.RandomState(0)
    N, T_enc = 4, 7
    text = jnp.asarray(rng.randint(0, 20, size=(T_enc, N)), jnp.int32)
    lengths = jnp.asarray(rng.randint(2, T_enc + 1, size=N), jnp.int32)
    image = jnp.asarray(rng.randn(N, 3, 4, 8), jnp.float32)
    gt = np.full((8, N), grammar.eos_idx, np.int32)
    gt[0] = grammar.name2idx["_Find"]
    gt[1] = grammar.name2idx["_Find"]
    gt[2] = grammar.name2idx["_EqualNum"]

    def loss(p):
        o = model.apply(p, text, lengths, image, jax.random.PRNGKey(1),
                        gt_layout=jnp.asarray(gt), use_gt_layout=True)
        return jnp.sum(o.scores ** 2)

    grads = jax.grad(loss)(params)
    assert np.any(np.asarray(
        grads["modules"]["equal_num"]["fc_res"]["w"]) != 0)
    # fc_hidden's grad is zero exactly at fc_res=0; one SGD step on
    # fc_res unblocks it
    stepped = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params,
                                     grads)
    grads2 = jax.grad(loss)(stepped)
    assert np.any(np.asarray(
        grads2["modules"]["equal_num"]["fc_hidden"]["w"]) != 0)


def test_scene_ext_learned_attention():
    """scene_ext (framework extension) replaces the constant _Scene
    attention with a learned objectness map; parity config keeps the
    constant (reference nmn3_modules.py:60-72)."""
    model, grammar = build("clevr", scene_ext=True)
    params, out = run(model)
    assert "scene" in params["modules"]
    assert np.all(np.isfinite(np.asarray(out.scores)))

    parity_params = build("clevr")[0].init(jax.random.PRNGKey(0))
    assert "scene" not in parity_params["modules"]
    # parity parameter stream untouched: shared modules init identically
    np.testing.assert_array_equal(
        np.asarray(parity_params["modules"]["find"]["conv_image"]["w"]),
        np.asarray(params["modules"]["find"]["conv_image"]["w"]))

    # gradient reaches the scene head through a _Scene _Count layout
    rng = np.random.RandomState(0)
    N, T_enc = 4, 7
    text = jnp.asarray(rng.randint(0, 20, size=(T_enc, N)), jnp.int32)
    lengths = jnp.asarray(rng.randint(2, T_enc + 1, size=N), jnp.int32)
    image = jnp.asarray(rng.randn(N, 3, 4, 8), jnp.float32)
    gt = np.full((8, N), grammar.eos_idx, np.int32)
    gt[0] = grammar.name2idx["_Scene"]
    gt[1] = grammar.name2idx["_Count"]

    def loss(p):
        out = model.apply(p, text, lengths, image, jax.random.PRNGKey(1),
                          gt_layout=jnp.asarray(gt), use_gt_layout=True)
        return jnp.sum(out.scores ** 2)

    grads = jax.grad(loss)(params)
    assert np.any(np.asarray(
        grads["modules"]["scene"]["fc_att"]["w"]) != 0)


def test_scene_bounded_ext():
    """scene_bounded (modifier on scene_ext) squashes the learned
    objectness to [0, SCENE_POS_VAL] so scene maps share the parity
    constant map's value regime (reference pos_val 3,
    nmn3_modules.py:60-72)."""
    from n2nmn_tpu.models.modules import clevr as clevr_lib

    model, grammar = build("clevr", scene_ext=True, scene_bounded=True)
    params = model.init(jax.random.PRNGKey(0))
    assert "scene_b" in params["modules"]
    assert "scene" not in params["modules"]

    # the hoisted scene attention is within [0, SCENE_POS_VAL]
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(3, 3, 4, 8) * 10, jnp.float32)
    txt = jnp.asarray(rng.randn(2, 3, 12), jnp.float32)
    pre_static, _ = clevr_lib.precompute(params["modules"], image, txt)
    att = np.asarray(pre_static["att_scene"])
    assert att.min() >= 0.0 and att.max() <= clevr_lib.SCENE_POS_VAL
    # image-dependent (not the parity constant)
    assert att.std() > 0

    # gradient reaches the head through a _Scene _Count layout
    N, T_enc = 4, 7
    text = jnp.asarray(rng.randint(0, 20, size=(T_enc, N)), jnp.int32)
    lengths = jnp.asarray(rng.randint(2, T_enc + 1, size=N), jnp.int32)
    img = jnp.asarray(rng.randn(N, 3, 4, 8), jnp.float32)
    gt = np.full((8, N), grammar.eos_idx, np.int32)
    gt[0] = grammar.name2idx["_Scene"]
    gt[1] = grammar.name2idx["_Count"]

    def loss(p):
        out = model.apply(p, text, lengths, img, jax.random.PRNGKey(1),
                          gt_layout=jnp.asarray(gt), use_gt_layout=True)
        return jnp.sum(out.scores ** 2)

    grads = jax.grad(loss)(params)
    assert np.any(np.asarray(
        grads["modules"]["scene_b"]["fc_att"]["w"]) != 0)


def test_count_mlp_ext_head():
    """count_mlp_ext (framework extension) adds a hidden relu layer to
    the _Count head; parity config keeps the reference's single fc
    (nmn3_modules.py:75-86). Needed with scene_ext so one Count head can
    serve both the learned _Scene maps and the _Find maps."""
    model, grammar = build("clevr", scene_ext=True, count_mlp_ext=True)
    params, out = run(model)
    assert "fc_hidden" in params["modules"]["count"]
    assert np.all(np.isfinite(np.asarray(out.scores)))

    parity_params = build("clevr")[0].init(jax.random.PRNGKey(0))
    assert "fc_hidden" not in parity_params["modules"]["count"]
    # parity parameter stream untouched: shared modules init identically
    np.testing.assert_array_equal(
        np.asarray(parity_params["modules"]["exist"]["fc_scores"]["w"]),
        np.asarray(params["modules"]["exist"]["fc_scores"]["w"]))

    # gradient reaches the hidden layer through a _Find _Count layout
    rng = np.random.RandomState(0)
    N, T_enc = 4, 7
    text = jnp.asarray(rng.randint(0, 20, size=(T_enc, N)), jnp.int32)
    lengths = jnp.asarray(rng.randint(2, T_enc + 1, size=N), jnp.int32)
    image = jnp.asarray(rng.randn(N, 3, 4, 8), jnp.float32)
    gt = np.full((8, N), grammar.eos_idx, np.int32)
    gt[0] = grammar.name2idx["_Find"]
    gt[1] = grammar.name2idx["_Count"]

    def loss(p):
        out = model.apply(p, text, lengths, image, jax.random.PRNGKey(1),
                          gt_layout=jnp.asarray(gt), use_gt_layout=True)
        return jnp.sum(out.scores ** 2)

    grads = jax.grad(loss)(params)
    assert np.any(np.asarray(
        grads["modules"]["count"]["fc_hidden"]["w"]) != 0)


def test_image_idx_dedup_matches_repeated_images():
    """The image_idx dedup path (backbone on M unique images + per-
    question gather) must score identically to feeding each question
    its own (repeated) image — the production image->answer shape."""
    model, _ = build("clevr", in_graph_vgg=True, H_feat=1, W_feat=1,
                     D_feat=512)
    rng = np.random.RandomState(0)
    M, qpi = 2, 3
    N = M * qpi
    T_enc = 7
    text = jnp.asarray(rng.randint(0, 20, size=(T_enc, N)), jnp.int32)
    lengths = jnp.asarray(rng.randint(2, T_enc + 1, size=N), jnp.int32)
    uniq = jnp.asarray(rng.rand(M, 32, 32, 3) * 255.0, jnp.float32)
    idx = jnp.repeat(jnp.arange(M, dtype=jnp.int32), qpi)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    out_dedup = jax.jit(
        lambda p, t, l, i, ix, r: model.apply(p, t, l, i, r,
                                              image_idx=ix))(
        params, text, lengths, uniq, idx, key)
    out_full = jax.jit(lambda p, t, l, i, r: model.apply(p, t, l, i, r))(
        params, text, lengths, jnp.take(uniq, idx, axis=0), key)
    np.testing.assert_allclose(np.asarray(out_dedup.scores),
                               np.asarray(out_full.scores),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(out_dedup.tokens),
                          np.asarray(out_full.tokens))
